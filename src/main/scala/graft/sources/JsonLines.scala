package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S8/K-family — JSON-Lines source/sink: one JSON object per line, the
  * de-facto interchange format for LLM training corpora (and the data
  * plane the reference's config/detail dicts live in, `main.py:38-43`).
  * Spark's json writer IS jsonl (newline-delimited objects).
  *
  * The reader takes an EXPLICIT schema: schema inference reads the
  * whole dataset once before the real scan — at 100 TB that is a
  * full extra pass, so the engine treats the schema as an input, not
  * something to discover. Directory partitioning works exactly as for
  * parquet (partition columns come from the path, prune at plan time).
  */
object JsonLines {

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("json")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format("json").load(path)
}
