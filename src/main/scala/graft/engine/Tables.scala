package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-provided parquet tables.
  *
  * The reference lands scraped records as per-month CSV partitions and
  * re-reads them by glob (`/root/reference/src/common/file_utils.py:22-23`);
  * our native store is columnar parquet, one file-set per table under
  * `$sfDir` (TESTDATA.md). Reads are lazy scans — Catalyst pushes filters
  * and prunes columns into the parquet reader, so callers should express
  * predicates/projections on the returned DataFrame rather than
  * materializing it.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects
    // (PARQUET_TYPE_ILLEGAL) unless read as a raw long via
    // spark.sql.legacy.parquet.nanosAsLong. The conf is session-wide,
    // so mutate it only for the one table that needs it, and only when
    // not already true (getOption returns the registered default
    // "false" when unset, so an .isEmpty guard would never fire) —
    // every other read leaves session state alone.
    if (name == "events" &&
        !spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      // nanos → micros must FLOOR, not truncate toward zero: for
      // pre-1970 timestamps (negative nanos) `ts div 1000` would round
      // up. (ts - pmod(ts, 1000)) is exactly divisible, so the div is a
      // true floor for either sign.
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(
            "(ts - pmod(ts, 1000)) div 1000")))
    else df
  }
}
