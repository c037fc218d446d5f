package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the seeded-determinism digests of the rows-only
  * gate rows at each testdata scale factor, for pinning into
  * [[graft.engine.PinnedDigests]]. Run with GRAFT_PRINT_DIGESTS=1 so
  * the builders print instead of enforcing:
  *
  *   GRAFT_PRINT_DIGESTS=1 sbt 'runMain graft.tools.GateDigests'
  *
  * Session config mirrors Verify/Bench (local[32], 32 shuffle
  * partitions, UTC) — the digests pin behavior under the DRIVER's
  * session layout, and seeded ML fits are deterministic only per
  * layout. Output lines: `DIGEST <name> <sfBase> <md5>`; paste the
  * generated map block into PinnedDigests.scala.
  */
object GateDigests {
  val names = Seq(
    "q32_kmeans", "q40_quality_model", "q41_ann_lsh", "q47_simhash_wide",
    "q48_embed_lsh_neardup", "q49_tfidf_vectors", "q82_semantic_dedup",
    "q85_semantic_keep_best", "q88_isolation_forest")

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("GRAFT_PRINT_DIGESTS"),
      "run with GRAFT_PRINT_DIGESTS=1 (otherwise the builders enforce " +
        "the stale pins while you are trying to re-derive them)")
    val sfDirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.KeywordFilterFusion.install(spark)
    for (dir <- sfDirs; name <- names) {
      graft.engine.Caching.scoped {
        // builders print their DIGEST lines in print mode; the count()
        // only forces the plan (and exercises the non-digest requires)
        graft.SparkEntry.queries(name)(spark, dir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
