package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the pre-shuffle answer to the repeated
  * fact⋈fact join at 100 TB: write both sides bucketed (and sorted) by
  * the join key once, and every subsequent equi-join on that key is
  * planned WITHOUT an Exchange on the bucketed side(s) — the shuffle
  * was paid at write time, once, instead of per query.
  *
  * Spark only honors bucketing through the catalog (`saveAsTable`);
  * path-based parquet ignores bucket metadata.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a managed-table DIRECTORY can outlive the catalog entry (each new
    // session starts a fresh in-memory catalog, but spark-warehouse
    // persists on disk) — saveAsTable then refuses with
    // LOCATION_ALREADY_EXISTS; remove the orphan location explicitly
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed catalog tables on their shared bucket key. With
    * equal bucket counts both Exchanges are elided; with sorted buckets
    * the sort is too (plan: SortMergeJoin over FileScans directly). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, key)
  }
}
