package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** K-family, engine-native store — parquet writer with explicit layout
  * control. At 100 TB the WRITE layout is a first-class performance
  * decision, not an afterthought:
  *
  *   - `partitionBy` columns become directory partitions → plan-time
  *     pruning for every downstream reader (`PartitionFilters`).
  *   - `maxRecordsPerFile` bounds file size so a skewed task can't emit
  *     a multi-GB file (and small readers aren't forced to split it).
  *   - `sortWithinPartitions` clusters rows inside each file so parquet
  *     row-group min/max statistics become selective — readers skip
  *     row groups for range predicates on the sort key (poor-man's
  *     Z-order for the single-key case).
  *   - `coalesceTo` caps the file COUNT for low-volume partitions (the
  *     small-files problem: a 32-task write of 12 rows makes 32 files).
  *
  * Deliberately a thin composition of public writer options — the value
  * is the enforced pairing of layout choices, same stance as CsvIngest.
  *
  * The layout logic is format-agnostic: every lever above means the
  * same thing for ORC (directory partitions, file-size caps, in-file
  * clustering for stripe-level min/max skipping), so `format` accepts
  * Spark's other native columnar store too — q83 runs the identical
  * loop over ORC.
  */
object ParquetSink {

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Nil,
            sortCols: Seq[String] = Nil,
            maxRecordsPerFile: Long = 0L,
            coalesceTo: Int = 0,
            format: String = "parquet"): Unit = {
    // order matters: coalesce FIRST, then sort — the reverse would
    // concatenate independently-sorted runs and destroy the clustering
    // the row-group statistics depend on. The sort key is PREFIXED with
    // the partition columns: FileFormatWriter requires ordering on them
    // and would otherwise insert its own sort on top, paying the
    // clustering sort twice and (under spill-merge) voiding it.
    val sized =
      if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    val sortKeys = (partitionBy ++ sortCols).distinct
    val clustered =
      if (sortCols.nonEmpty)
        sized.sortWithinPartitions(sortKeys.map(col): _*)
      else sized
    val w0 = clustered.write.mode("overwrite").format(format)
    val w1 =
      if (maxRecordsPerFile > 0)
        w0.option("maxRecordsPerFile", maxRecordsPerFile)
      else w0
    (if (partitionBy.nonEmpty) w1.partitionBy(partitionBy: _*) else w1)
      .save(path)
  }

  /** Read a [[write]]-produced layout back (partition columns restored
    * from the directory structure; filters on them prune at plan time). */
  def read(spark: SparkSession, path: String,
           format: String = "parquet"): DataFrame =
    spark.read.format(format).load(path)
}
