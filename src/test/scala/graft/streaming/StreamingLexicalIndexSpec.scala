package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Continuous lexical-index maintenance: micro-batch segment appends
  * compacted by the tiered merge, with the probe over the maintained
  * layout equal to a direct BM25 scan of everything ingested. */
class StreamingLexicalIndexSpec extends SparkSpec {

  test("six micro-batches stay within the segment budget and probe " +
      "exactly like a direct scan of the full ingested corpus") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val dir = java.nio.file.Files
      .createTempDirectory("streamlex").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("streamlex_ck").toString
    val source = MemoryStream[(Long, String)]
    val q = StreamingLexicalIndex.run(
      source.toDF().toDF("doc_id", "text"),
      "doc_id", "text", dir, maxSegments = 3, ckpt)
    // six single-batch waves of disjoint docs (batch boundaries forced
    // by processAllAvailable between adds)
    val waves = Seq(
      Seq((1L, "spark sort merge join"), (2L, "hash join scan")),
      Seq((3L, "merge sort window"), (4L, "table scan filter")),
      Seq((5L, "query filter merge")),
      Seq((6L, "sort sort sort"), (7L, "join merge hash")),
      Seq((8L, "window table query")),
      Seq((9L, "scan merge table"), (10L, "filter hash sort")))
    try {
      waves.foreach { w =>
        source.addData(w: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segDirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/postings"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg="))
      .map(_.getPath.getName).toSeq.sorted
    assert(segDirs.length <= 3,
      s"tiered maintenance left ${segDirs.length} segments: $segDirs")
    // probe parity: the maintained layout answers exactly like a
    // direct scan over everything ingested
    val all = waves.flatten.toDF("doc_id", "text")
    val panel = Seq((0L, "sort merge"), (1L, "table scan"))
      .toDF("qid", "qtext")
    val probed = TextAnalysis
      .bm25ProbeSegmented(spark, dir, panel, k = 10, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val direct = TextAnalysis
      .bm25TopK(all, "doc_id", "text", panel, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(probed == direct,
      "maintained streaming index diverged from the direct scan")
    assert(probed.nonEmpty)
  }
}
