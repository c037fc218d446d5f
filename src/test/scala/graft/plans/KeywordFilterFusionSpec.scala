package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

/** The rule must (a) actually rewrite the plan and (b) not change
  * results — checked by running the same query with and without it. */
class KeywordFilterFusionSpec extends SparkSpec {

  private def keywordQuery(df: org.apache.spark.sql.DataFrame) =
    // terms that exist in p_type so the semantic check is non-vacuous
    df.filter(TextFns.keywordAny(
      TextFns.normalizeText(col("fonte")), Seq("economy", "promo", "small")))

  test("or-of-contains fuses into a single quoted rlike") {
    // parquet-backed, NOT a local Seq: ConvertToLocalRelation would
    // otherwise evaluate the whole filter at optimize time and leave no
    // Filter node to rewrite.
    val part = graft.engine.Tables(spark, "/root/testdata/sf0.001", "part")
      .withColumnRenamed("p_type", "fonte")
    val q = keywordQuery(part).select(col("fonte"))

    val before = q.queryExecution.optimizedPlan.toString
    val unfused = q.collect().map(_.getString(0)).sorted.toSeq
    KeywordFilterFusion.install(spark)
    try {
      // queryExecution caches its optimized plan — build a fresh frame
      // so the rule actually runs
      val q2 = keywordQuery(part).select(col("fonte"))
      val after = q2.queryExecution.optimizedPlan.toString
      assert(after.contains("RLIKE"), s"expected fused RLIKE in:\n$after")
      assert(!after.contains(" OR "), s"OR-chain should be gone:\n$after")
      assert(before.contains("Contains") || before.contains("contains"),
        s"unfused plan should be an OR of Contains:\n$before")
      // (b) identical results with the rule active
      val fused = q2.collect().map(_.getString(0)).sorted.toSeq
      assert(fused == unfused, "fusion changed the result set")
      assert(fused.nonEmpty, "semantic check must compare real rows")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == KeywordFilterFusion)
    }
  }

  test("mixed predicates over different children are left alone") {
    import spark.implicits._
    val df = Seq(("a", "b")).toDF("x", "y")
    val q = df.filter(
      TextFns.normalizeText(col("x")).contains("a") ||
        TextFns.normalizeText(col("y")).contains("b"))
    KeywordFilterFusion.install(spark)
    try {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("RLIKE"),
        s"different children must not fuse:\n$plan")
      assert(q.count() == 1)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == KeywordFilterFusion)
    }
  }
}
