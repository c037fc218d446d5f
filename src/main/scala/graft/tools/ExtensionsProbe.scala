package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: build a session the way a DEPLOYMENT would —
  * `spark.sql.extensions=graft.plans.GraftExtensions` — and confirm the
  * injected optimizer rule fires (the extraOptimizations path used by
  * Verify/Bench is separate; this exercises the extension class itself,
  * including its reflective instantiation by Spark).
  * Usage: runMain graft.tools.ExtensionsProbe
  */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val part = graft.engine.Tables(spark, "/root/testdata/sf0.001", "part")
    val q = part.filter(graft.functions.TextFns.keywordAny(
      graft.functions.TextFns.normalizeText(col("p_type")),
      Seq("economy", "promo", "small")))
    val plan = q.queryExecution.optimizedPlan.toString
    println("fused=" + plan.contains("RLIKE"))
    println("rows=" + q.count())
    spark.stop()
  }
}
