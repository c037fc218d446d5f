package graft.queries

import graft.SparkSpec

/** A3 — K-Means (k=3, seed=42) determinism invariants
  * (`data_science.ipynb` cell 4 has no oracle: sklearn centroids differ
  * from Spark ML by construction — SURVEY.md §5). */
class KMeansSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q32 is deterministic under the fixed seed and yields k clusters") {
    val run1 = PipelineQueries.queries("q32_kmeans")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val run2 = PipelineQueries.queries("q32_kmeans")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(run1 == run2, "same seed, same data → identical clustering")
    assert(run1.length == 3, s"k=3 clusters expected, got ${run1.length}")
    assert(run1.map(_._1).sum > 0)
    // z-scored feature: cluster means must straddle zero (3 clusters
    // over a standardized column can't all sit on one side)
    val means = run1.map(_._2)
    assert(means.min < 0 && means.max > 0)
  }

  test("approx_count_distinct tracks exact within 5% (A7 scale path)") {
    import org.apache.spark.sql.functions._
    val li = graft.engine.Tables(spark, sf, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL estimate $approx too far from exact $exact")
  }
}
