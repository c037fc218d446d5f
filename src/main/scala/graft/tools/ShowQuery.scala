package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print one registered query's result — the quick-look
  * companion to [[TimeQuery]] (which only times).
  * Usage: runMain graft.tools.ShowQuery <queryName> [sfDir] [maxRows]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.KeywordFilterFusion.install(spark)
    // scoped like every other runner; cached so show + count execute
    // the plan once
    graft.engine.Caching.scoped {
      val df = graft.engine.Caching.cached(
        graft.SparkEntry.queries(name)(spark, sfDir))
      df.show(maxRows, truncate = false)
      println(s"rows=${df.count()}")
    }
    spark.stop()
  }
}
