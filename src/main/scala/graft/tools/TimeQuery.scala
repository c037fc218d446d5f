package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time registered queries (noop materialization, after
  * a warm-up) — the single-query feedback loop for perf work. Several
  * names may be comma-separated to get same-session warm reps for a
  * group (the cross-query comparison the round-7 verdict asks for).
  * Usage: runMain graft.tools.TimeQuery <name[,name…]> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.KeywordFilterFusion.install(spark)
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    graft.engine.HeapWarmup.touchFrontier()
    names.foreach { name =>
      (1 to reps).foreach { r =>
        // mimic the bench loop: caches from a prior rep must not flatter
        // later reps (JIT/codegen warm-up is the only cross-rep carryover)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.engine.Caching.scoped {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        println(f"$name rep $r: ${(System.nanoTime - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
