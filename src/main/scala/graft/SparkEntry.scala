package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import graft.functions.TextFns
import graft.queries.ReferenceQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 "minimum end-to-end slice"): *total paid
    * per creditor per month, largest first* — the question the reference
    * pipeline exists to answer — re-targeted at the test star schema:
    * scan → normalize (P1) → keyword predicate (F1) → decimal money math
    * (P3 pattern) → join → groupBy/sum → orderBy desc → limit.
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
      .filter(TextFns.keywordAny(
        TextFns.normalizeText(col("c_mktsegment")),
        Seq("building", "machinery", "automobile")))
    // No broadcast hint: customer is fact-scale at 100×, so AQE picks the
    // join strategy; explicit broadcast is reserved for genuinely tiny
    // dims (nation/region — see q07).
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_name"), year(col("o_orderdate")).as("yr"),
               month(col("o_orderdate")).as("mo"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total_paid"))
      .orderBy(col("total_paid").desc, col("c_name"), col("yr"), col("mo"))
      .limit(100)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.9
    * north-star pipeline operators in PipelineQueries). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (those
    * get the driver's weaker rows-only check + invariant specs). */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql ++ graft.queries.PipelineQueries.oracleSql
}
