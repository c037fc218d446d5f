package graft.queries

import graft.SparkSpec

/** A3 — K-Means (k=3, seed=42) determinism + inertia invariants on the
  * 3-feature fit (`data_science.ipynb` cell 4 scales THREE financial
  * columns; no oracle: sklearn centroids differ from Spark ML by
  * construction — SURVEY.md §5). */
class KMeansSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q32 is deterministic under the fixed seed and yields k clusters") {
    def run() = PipelineQueries.queries("q32_kmeans")(spark, sf)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    val run1 = run()
    val run2 = run()
    assert(run1 == run2, "same seed, same data → identical clustering")
    assert(run1.length == 3, s"k=3 clusters expected, got ${run1.length}")
    val total = run1.map(_._1).sum
    assert(total > 0)
    // every feature is z-scored (global mean 0), so the n-weighted mean
    // of each per-cluster z mean must come back to ≈ 0 (tolerance covers
    // the round-4 output rounding)
    def wmean(f: ((Long, Double, Double, Double)) => Double) =
      run1.map(t => t._1 * f(t)).sum / total
    assert(math.abs(wmean(_._2)) < 1e-2, s"weighted mean z_bal ${wmean(_._2)}")
    assert(math.abs(wmean(_._3)) < 1e-2, s"weighted mean z_spend ${wmean(_._3)}")
    assert(math.abs(wmean(_._4)) < 1e-2, s"weighted mean z_orders ${wmean(_._4)}")
  }

  test("k=3 inertia beats k=1 on the identical 3-feature frame") {
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("z_bal", "z_spend", "z_orders"))
      .setOutputCol("features")
      .transform(PipelineQueries.kmeansFeatures(spark, sf))
    assembled.cache()
    try {
      val c3 = new org.apache.spark.ml.clustering.KMeans()
        .setK(3).setSeed(42).setFeaturesCol("features")
        .fit(assembled).summary.trainingCost
      // the k=1 "fit" needs no KMeans (Spark ML rejects k<2): its cost
      // is the squared distance mass around the global centroid, which
      // for z-scored features is the 0 vector — one aggregate
      val c1 = assembled.selectExpr(
          "sum(z_bal*z_bal + z_spend*z_spend + z_orders*z_orders) AS c")
        .collect()(0).getDouble(0)
      // a real 3-cluster structure must cut the variance mass
      assert(c3 < 0.7 * c1, s"k=3 cost $c3 did not improve on k=1 cost $c1")
    } finally assembled.unpersist()
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
