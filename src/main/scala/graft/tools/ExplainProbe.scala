package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the physical plan of a registered query — the
  * `.explain("formatted")` feedback loop the 100 TB design contract
  * demands (scan pushdown, partition pruning, broadcast, codegen spans).
  * Usage: runMain graft.tools.ExplainProbe <queryName> <sfDir>
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same optimizer setup as Verify/Bench so plans match the gate
    graft.plans.KeywordFilterFusion.install(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
