package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.{Similarity, Upsert}

/** Dev instrument (r10 verdict item 4): does the drift-guarded
  * maintenance loop ([[Similarity.ivfRefreshOrRecenter]]) hold probe
  * recall across many recrawl waves where the corpus genuinely drifts,
  * while the fixed-centroid refresh degrades?
  *
  * Scenario: a third of the corpus (vec_id % 3 == 0) drifts a little
  * further each wave toward a fixed direction (cumulative shift
  * 0.12·t·cos(j)), so every wave re-ingests those keys as
  * "modified" and the clean-corpus centroids describe the data less
  * and less. Both tracks run the SAME cell-incremental refresh; the
  * guarded track additionally recenters when a gauge breaches its
  * fit-time baseline (ivfRefreshOrRecenter defaults: displacement
  * ×1.15 or occupancy skew ×1.75). Recall@10 is measured each wave
  * for a 10-query panel against exact brute force on the CURRENT
  * snapshot.
  *
  * Usage: runMain graft.tools.IvfDriftProbe [sfDir] [waves]
  */
object IvfDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val waves = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = java.nio.file.Files
      .createTempDirectory("ivfdriftprobe").toString
    val e = Tables(spark, sfDir, "embeddings")
    val nPanel = 10
    val base = graft.engine.Caching.cached(
      e.filter(col("vec_id") >= nPanel)
        .select(col("vec_id"), col("embedding")))
    base.count()
    val queries = graft.engine.Caching.cached(
      e.filter(col("vec_id") < nPanel)
        .select(col("vec_id").as("qid"),
          VectorFns.toDouble(col("embedding")).as("qvec")))

    def snap(t: Int): DataFrame = base.select(col("vec_id"),
      when(col("vec_id") % 3 === 0,
        transform(col("embedding"),
          (x, j) => (x + lit(0.12 * t) * cos(j.cast("double")))
            .cast("float")))
        .otherwise(col("embedding")).as("embedding"))

    def sig(df: DataFrame) = df.select(col("vec_id"),
      xxhash64(col("embedding")).as("sig"))

    // exact top-10 per wave (the moving target)
    def exactOf(s: DataFrame) =
      Similarity.topKMulti(s, queries, "vec_id", "embedding", 10)
        .select(col("qid"), col("vec_id"))

    // quantized pruned probe per panel query, summed hits
    def recallOf(idxPath: String, cents: DataFrame,
                 exact: DataFrame): Long = {
      val qs = queries.collect()
      qs.map { r =>
        val qv = spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(r.getSeq[Double](1))),
          new org.apache.spark.sql.types.StructType().add("qvec",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))
        Similarity.ivfProbePrunedQuantized(spark, idxPath, cents, qv,
            "vec_id", k = 10, nProbe = 4)
          .select(lit(r.getLong(0)).as("qid"), col("vec_id"))
          .join(exact, Seq("qid", "vec_id")).count()
      }.sum
    }

    val k = 16
    val s0 = snap(0)
    val cents0 = Similarity.learnedCentroids(s0, "embedding", k)
      .localCheckpoint()
    val idxFixed = s"$scratch/fixed"; val idxGuard = s"$scratch/guard"
    Similarity.ivfWriteIndexQuantized(s0, cents0, "vec_id", "embedding",
      idxFixed)
    Similarity.ivfWriteIndexQuantized(s0, cents0, "vec_id", "embedding",
      idxGuard)
    val statsG0 = Similarity.ivfDriftStats(spark, idxGuard, cents0)
      .localCheckpoint()
    var baseline = Similarity.ivfDriftGauges(
      Similarity.ivfDriftStats(spark, idxFixed, cents0))
    println(s"PROBE wave=0 baseline(skew,cdFp)=$baseline")
    var centsG = cents0
    var statsG: Option[org.apache.spark.sql.DataFrame] = Some(statsG0)
    var prev = s0
    for (t <- 1 to waves) {
      val cur = snap(t)
      val changes = Upsert.diffByKey(sig(prev), sig(cur), "vec_id", "sig")
      Similarity.ivfRefreshQuantizedIncremental(spark, idxFixed, cents0,
        cur, changes, "vec_id", "embedding")
      val (cg, b2, rec, stG) = Similarity.ivfRefreshOrRecenter(spark,
        idxGuard, centsG, cur, changes, "vec_id", "embedding",
        baseline, k, prevStats = statsG)
      centsG = cg; baseline = b2; statsG = Some(stG)
      val exact = graft.engine.Caching.cached(exactOf(cur))
      exact.count()
      val (skewF, cdF) = Similarity.ivfDriftGauges(
        Similarity.ivfDriftStats(spark, idxFixed, cents0))
      val rF = recallOf(idxFixed, cents0, exact)
      val rG = recallOf(idxGuard, centsG, exact)
      println(s"PROBE wave=$t fixed: recall=$rF/100 cdFp=$cdF " +
        s"skew=$skewF | guarded: recall=$rG/100 recentered=$rec " +
        s"baseline=$baseline")
      exact.unpersist()
      prev = cur
    }
    spark.stop()
  }
}
