package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The rows-only gate rows' driver-enforcement mechanism (r10 verdict
  * item 1): digests are stable and unambiguous, pins exist for every
  * digest-checked query at every driver scale factor, and a digest
  * breach THROWS — which is exactly what turns the driver's row
  * err-red instead of silently passing. */
class GateChecksSpec extends SparkSpec {

  import spark.implicits._

  test("digestOf is partition-order independent") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    val b = a.repartition(3)
    assert(GateChecks.digestOf(a) == GateChecks.digestOf(b))
  }

  test("digestOf separates fields unambiguously") {
    val a = Seq(("ab", "c")).toDF("x", "y")
    val b = Seq(("a", "bc")).toDF("x", "y")
    assert(GateChecks.digestOf(a) != GateChecks.digestOf(b))
  }

  test("digestOf distinguishes value changes") {
    val a = Seq((1L, 0.5)).toDF("id", "v")
    val b = Seq((1L, 0.5001)).toDF("id", "v")
    assert(GateChecks.digestOf(a) != GateChecks.digestOf(b))
  }

  test("every digest-checked query is pinned at all three driver sfs") {
    val queries = graft.tools.GateDigests.names
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    for (q <- queries; sf <- sfs)
      assert(PinnedDigests.all.contains((q, sf)),
        s"missing pin for ($q, $sf)")
  }

  test("a digest breach throws (the err-red path)") {
    // (q32_kmeans, sf0.001) is pinned; feeding a frame with any other
    // content — here, what a broken seed would produce — must throw
    val impostor = Seq((0L, 1L, 0.1, 0.2, 0.3))
      .toDF("prediction", "n", "mean_z_bal", "mean_z_spend", "mean_z_orders")
    val e = intercept[IllegalArgumentException] {
      GateChecks.requirePinned("q32_kmeans", "/root/testdata/sf0.001",
        impostor)
    }
    assert(e.getMessage.contains("digest mismatch"))
  }

  test("unknown sf dirs skip the digest (library stays usable)") {
    val anything = Seq((1L, 2L)).toDF("a", "b")
    // must NOT throw: no pin exists for this basename
    GateChecks.requirePinned("q32_kmeans", "/tmp/someones_data", anything)
  }
}
