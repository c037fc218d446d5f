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

  test("r17 out-of-order audit: dedup suppression is MONOTONE " +
      "(append-only) — an out-of-order duplicate with an OLDER event " +
      "time arriving in a later batch is suppressed, an exact " +
      "re-delivery cannot fan out, and no emitted row is ever " +
      "revised — the q191 version-rewind hazards cannot occur here " +
      "because there are no versions and no state rewind path") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[(java.sql.Timestamp, Long, String)]
    val deduped = StreamingDedup.exactWithinWatermark(
      source.toDF().toDF("ts", "doc_id", "text"),
      textCol = "text", tsCol = "ts", delay = "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup_ooo")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      def emitted() = spark.table("stream_dedup_ooo")
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      source.addData((ts("2024-01-01 10:05:00"), 1L, "alpha beta"))
      q.processAllAvailable()
      assert(emitted() == Seq(1L))
      // out-of-order: the SAME content with an EARLIER event time,
      // arriving later (the straggler shape that rewound a raw index
      // loop) — suppression is by signature, arrival/event order
      // cannot resurrect it; and an exact re-delivery cannot fan out
      source.addData(
        (ts("2024-01-01 10:01:00"), 2L, "beta alpha"),
        (ts("2024-01-01 10:05:00"), 1L, "alpha beta"))
      q.processAllAvailable()
      assert(emitted() == Seq(1L),
        "an out-of-order or re-delivered duplicate fanned out")
      // monotone: new distinct content APPENDS; the earlier emission
      // is untouched (append mode has no revision path by
      // construction — this pins it observably)
      source.addData((ts("2024-01-01 10:06:00"), 3L, "gamma delta"))
      q.processAllAvailable()
      assert(emitted() == Seq(1L, 3L))
    } finally q.stop()
  }

  test("chunk-level dedup suppresses repeated chunks across batches, " +
      "first arrival wins") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[(java.sql.Timestamp, Long, String)]
    val clean = StreamingDedup.chunksWithinWatermark(
      source.toDF().toDF("ts", "doc_id", "text"),
      idCol = "doc_id", textCol = "text", tsCol = "ts",
      chunkSize = 3, delay = "10 minutes")

    val q = clean.writeStream
      .format("memory").queryName("stream_chunk_dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // doc1 → [a b c][d e f]; doc2 shares its first chunk ("a b c"
      // boilerplate) but contributes [x y z]. MemoryStream delivers one
      // ordered partition, so the within-batch survivor is deterministic
      // HERE; the operator's cross-batch guarantee is what the second
      // batch below asserts (see the within-batch caveat in the
      // operator's Scaladoc).
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "a b c d e f"),
        (ts("2024-01-01 10:00:30"), 2L, "a b c x y z"))
      q.processAllAvailable()
      // next batch: doc3 is pure already-seen boilerplate (fully
      // suppressed, STATE carried across batches); doc4 is new
      source.addData(
        (ts("2024-01-01 10:01:00"), 3L, "x y z"),
        (ts("2024-01-01 10:01:30"), 4L, "p q r"))
      q.processAllAvailable()

      val kept = spark.table("stream_chunk_dedup")
        .select("doc_id", "cid", "chunk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(kept == Set(
        (1L, 0L, "a b c"), (1L, 1L, "d e f"),
        (2L, 1L, "x y z"), (4L, 0L, "p q r")),
        s"got $kept — doc2's boilerplate chunk and all of doc3 must drop")
    } finally q.stop()
  }
}
