package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q64's sketch aggregates are rows-only at the gate (HLL++/percentile
  * sketch internals are engine-specific); these invariants pin them to
  * the exact answers they approximate. */
class ApproxAggSpec extends SparkSpec {

  test("approx_percentile lands within the sketch accuracy band of the " +
      "exact percentile and inside [min, max]") {
    import spark.implicits._
    // deterministic skewed data: values i*i for i in 0..9999
    val df = (0 until 10000).map(i => (i % 7, (i.toLong * i).toDouble))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(
      expr("approx_percentile(v, 0.5, 10000)").as("ap50"),
      expr("percentile(v, 0.5)").as("p50"),
      min("v").as("mn"), max("v").as("mx")).collect()
    rows.foreach { r =>
      val (ap, ex) = (r.getDouble(1), r.getDouble(2))
      assert(ap >= r.getDouble(3) && ap <= r.getDouble(4))
      // accuracy 10000 → rank error ≤ 1/10000; values here are dense
      // enough that the estimate stays within 2% of the exact value
      assert(math.abs(ap - ex) <= math.max(math.abs(ex) * 0.02, 1.0),
        s"group ${r.getInt(0)}: approx $ap vs exact $ex")
    }
  }

  test("approx_percentile stays inside its accuracy band across " +
      "partitionings (sketch merges need not be bit-identical)") {
    import spark.implicits._
    val base = (0 until 5000).map(i => ((i * 31) % 101).toDouble).toDF("v")
    def est(df: org.apache.spark.sql.DataFrame) = df
      .agg(expr("approx_percentile(v, 0.9, 1000)")).collect()(0).getDouble(0)
    val a = est(base)
    val b = est(base.repartition(17))
    // values 0..100 uniform → exact p90 ≈ 90; accuracy 1000 → rank
    // error ≤ 5 of 5000 rows ≈ ±0.5 in value space, doubled for slack
    assert(math.abs(a - 90.0) <= 1.0 && math.abs(b - 90.0) <= 1.0,
      s"p90 estimates drifted outside the accuracy band: $a / $b")
  }
}
