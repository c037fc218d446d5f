package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming ingest dedup: one survivor per token-set signature within
  * the watermark window, token-order/multiplicity-insensitive, distinct
  * content untouched. */
class StreamingDedupSpec extends SparkSpec {

  test("duplicates within the watermark window are suppressed, " +
      "distinct docs pass through") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[(java.sql.Timestamp, Long, String)]
    val deduped = StreamingDedup.exactWithinWatermark(
      source.toDF().toDF("ts", "doc_id", "text"),
      textCol = "text", tsCol = "ts", delay = "10 minutes")

    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "alpha beta gamma"),
        // same token SET (reordered + repeated token) → duplicate
        (ts("2024-01-01 10:00:30"), 2L, "gamma beta alpha alpha"),
        (ts("2024-01-01 10:01:00"), 3L, "delta epsilon"))
      q.processAllAvailable()
      // second batch: another dup of doc 1, still inside the window
      source.addData(
        (ts("2024-01-01 10:02:00"), 4L, "beta alpha gamma"),
        (ts("2024-01-01 10:02:30"), 5L, "zeta eta"))
      q.processAllAvailable()

      val ids = spark.table("stream_dedup")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L),
        s"got $ids — docs 2 and 4 are token-set dups of doc 1")
    } finally q.stop()
  }
}
