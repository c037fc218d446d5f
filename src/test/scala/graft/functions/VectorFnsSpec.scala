package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Vector-math properties via ScalaCheck-sampled vectors pushed through
  * the actual codegen'd column expressions (not a scala reimplementation). */
class VectorFnsSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int): Seq[(Seq[Double], Seq[Double])] = {
    val g = Gen.listOfN(dim, Gen.chooseNum(-10.0, 10.0))
    (0 until n).flatMap { i =>
      for {
        a <- g(Gen.Parameters.default, org.scalacheck.rng.Seed(100L + i))
        b <- g(Gen.Parameters.default, org.scalacheck.rng.Seed(500L + i))
        if a.exists(_ != 0.0) && b.exists(_ != 0.0)
      } yield (a, b)
    }
  }

  test("cosine is bounded, symmetric, and scale-invariant") {
    import spark.implicits._
    val df = vecs(100, 16).toDF("a", "b")
      .select(
        VectorFns.cosine(col("a"), col("b")).as("cab"),
        VectorFns.cosine(col("b"), col("a")).as("cba"),
        VectorFns.cosine(transform(col("a"), x => x * 3.0), col("b")).as("cscaled"))
    df.collect().foreach { r =>
      val (cab, cba, cs) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(cab >= -1.0 - 1e-9 && cab <= 1.0 + 1e-9, s"out of bounds: $cab")
      assert(cab == cba, "cosine must be symmetric")
      assert(math.abs(cab - cs) < 1e-9, "cosine must be scale-invariant")
    }
  }

  test("native fold kernels match the HOF fold bit-for-bit, and " +
      "propagate NULL on null elements / length mismatch") {
    import spark.implicits._
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = vecs(200, 32).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach { r =>
      // bit-for-bit: same left-to-right double accumulation order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    val edge = Seq(
      (Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0))), // null element
      (Seq(Some(1.0)), Seq(Some(2.0), Some(3.0)))        // length mismatch
    ).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")).as("d")).collect()
    assert(edge.forall(_.isNullAt(0)),
      "null element and length mismatch must both yield NULL (HOF parity)")
    val empty = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")).as("d")).collect()
    assert(empty(0).getDouble(0) == 0.0, "empty vectors dot to 0.0")
  }

  test("dot distributes over addition; sqDist of identical vectors is 0") {
    import spark.implicits._
    val df = vecs(100, 16).toDF("a", "b")
      .select(
        VectorFns.dot(col("a"), zip_with(col("a"), col("b"), (x, y) => x + y)).as("lhs"),
        (VectorFns.dot(col("a"), col("a")) + VectorFns.dot(col("a"), col("b"))).as("rhs"),
        VectorFns.sqDist(col("a"), col("a")).as("dself"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6,
        "dot must distribute over vector addition")
      assert(r.getDouble(2) == 0.0)
    }
  }
}
