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
    // spark.sql.legacy.parquet.nanosAsLong. Convert nanos → microsecond
    // timestamp here so callers see a TimestampType column; DuckDB
    // (µs-precision timestamps) truncates identically, so oracle
    // comparisons stay exact.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
