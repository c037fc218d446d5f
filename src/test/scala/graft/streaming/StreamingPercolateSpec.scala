package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Continuous percolation: per-micro-batch alerts equal the batch
  * operator on each wave, and a replayed batch's partition-overwrite
  * is a bit-identical no-op. Also the BM25F-over-streamed-field-
  * indexes composition: the per-field layout q180 gates inherits the
  * streaming maintenance loop with zero new code. */
class StreamingPercolateSpec extends SparkSpec {

  test("BM25F probes per-field indexes maintained by the streaming " +
      "loop bit-identically to the scan of everything ingested") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    val tDir = java.nio.file.Files
      .createTempDirectory("sbm25f_t").toString
    val bDir = java.nio.file.Files
      .createTempDirectory("sbm25f_b").toString
    // one streaming loop per field index — Lucene's one-doc-many-
    // fields flush, composed from the standard per-field layouts
    val srcT = MemoryStream[(Long, String)]
    val srcB = MemoryStream[(Long, String)]
    val qT = StreamingLexicalIndex.run(
      srcT.toDF().toDF("doc_id", "text"), "doc_id", "text", tDir,
      maxSegments = 3,
      java.nio.file.Files.createTempDirectory("sbm25f_tc").toString)
    val qB = StreamingLexicalIndex.run(
      srcB.toDF().toDF("doc_id", "text"), "doc_id", "text", bDir,
      maxSegments = 3,
      java.nio.file.Files.createTempDirectory("sbm25f_bc").toString)
    val waves = Seq(
      Seq((1L, "spark sort", "merge join sort")),
      Seq((2L, "table scan", "sort filter"),
        (3L, "merge merge", "scan value")),
      Seq((4L, "sort", ""), (5L, "", "spark table")))
    try {
      waves.foreach { w =>
        srcT.addData(w.map { case (id, t, _) => (id, t) }: _*)
        srcB.addData(w.map { case (id, _, b) => (id, b) }: _*)
        qT.processAllAvailable(); qB.processAllAvailable()
      }
    } finally { qT.stop(); qB.stop() }
    val panel = Seq((0L, "sort table"), (1L, "merge spark"))
      .toDF("qid", "qtext")
    val probed = TextAnalysis.bm25fProbeIndexed(spark,
        Seq((tDir, 2.0, 0.4), (bDir, 1.0, 0.75)), panel, 10, "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    val all = waves.flatten.toDF("doc_id", "title", "body")
    val scanned = TextAnalysis.bm25fTopK(all, "doc_id",
        Seq(("title", 2.0, 0.4), ("body", 1.0, 0.75)), panel, 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(probed == scanned,
      s"streamed field indexes diverged from the scan: $probed vs " +
        s"$scanned")
  }

  test("the event-time front closes percolation's delivery hazards: " +
      "through the RAW loop a re-delivered doc alerts twice and an " +
      "out-of-order OLDER version fires a stale alert; through the " +
      "settle front each key alerts once, on its winning version " +
      "only, and a straggler past the watermark never alerts") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val stored = Seq(
      (1L, Seq("stale"), Seq.empty[String]),
      (2L, Seq("fresh"), Seq.empty[String]))
      .toDF("query_id", "must", "must_not")
    // --- the hazard, demonstrated on the RAW loop ------------------
    val rawAlerts = java.nio.file.Files
      .createTempDirectory("sp_raw").toString
    val rawSrc = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val rawQ = StreamingPercolate.run(
      rawSrc.toDF().toDF("ts", "doc_id", "text", "v"),
      "doc_id", "text", stored, rawAlerts,
      java.nio.file.Files.createTempDirectory("sp_rawck").toString)
    try {
      // v2 (fresh) arrives first; the out-of-order v1 (stale) lands
      // in a LATER batch; doc 7 is re-delivered across batches
      rawSrc.addData((ts("2024-01-01 10:00:00"), 5L, "fresh copy", 2L),
        (ts("2024-01-01 10:00:00"), 7L, "fresh too", 1L))
      rawQ.processAllAvailable()
      rawSrc.addData((ts("2024-01-01 09:55:00"), 5L, "stale copy", 1L),
        (ts("2024-01-01 10:00:00"), 7L, "fresh too", 1L))
      rawQ.processAllAvailable()
    } finally rawQ.stop()
    val raw = spark.read.parquet(rawAlerts)
      .select(col("query_id"), col("doc_id"))
      .as[(Long, Long)].collect().toSeq
    assert(raw.contains((1L, 5L)),
      "expected the raw loop to demonstrate the stale alert " +
        "(out-of-order v1 firing after v2)")
    assert(raw.count(_ == ((2L, 7L))) == 2,
      "expected the raw loop to demonstrate the re-delivery fan-out")
    // --- the front -------------------------------------------------
    val alerts = java.nio.file.Files
      .createTempDirectory("sp_front").toString
    val src = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val q = StreamingPercolate.runEventTime(
      src.toDF().toDF("ts", "doc_id", "text", "v"),
      "doc_id", "text", versionCol = "v", tsCol = "ts",
      delay = "10 minutes", stored, alerts,
      java.nio.file.Files.createTempDirectory("sp_frontck").toString)
    try {
      src.addData((ts("2024-01-01 10:00:00"), 5L, "fresh copy", 2L),
        (ts("2024-01-01 10:00:00"), 7L, "fresh too", 1L))
      q.processAllAvailable()
      src.addData((ts("2024-01-01 09:55:00"), 5L, "stale copy", 1L),
        (ts("2024-01-01 10:00:00"), 7L, "fresh too", 1L))
      q.processAllAvailable()
      // nothing settled yet: both keys still open under the watermark
      // — in particular no stale alert transiently fired (the sink
      // dir holds no partition: empty settle batches skip the write)
      assert(Option(new java.io.File(alerts).listFiles()).toSeq.flatten
        .forall(f => f.getName.startsWith("_") ||
          f.getName.startsWith(".")),
        "an alert fired before its key settled")
      // advance the watermark far past every key's newest ts + delay
      src.addData((ts("2024-01-01 12:00:00"), 99L, "other", 1L))
      q.processAllAvailable()
      // a straggler PAST the watermark (11:50 now): dropped at
      // admission, never alerts — no rewound content reaches the
      // saved searches
      src.addData((ts("2024-01-01 10:30:00"), 8L, "fresh late", 1L),
        (ts("2024-01-01 13:00:00"), 98L, "other", 1L))
      q.processAllAvailable()
      src.addData((ts("2024-01-01 15:00:00"), 97L, "other", 1L))
      q.processAllAvailable()
    } finally q.stop()
    val settledAlerts = spark.read.parquet(alerts)
      .select(col("query_id"), col("doc_id"))
      .as[(Long, Long)].collect().toSeq
    // each key alerted exactly ONCE, on its WINNING version: doc 5 →
    // v2 "fresh copy" (query 2, never query 1's stale), doc 7 → once
    // despite the re-delivery
    assert(settledAlerts.sorted == Seq((2L, 5L), (2L, 7L)),
      s"settled alerts wrong: $settledAlerts")
  }

  test("three waves alert exactly like per-wave batch percolation; " +
      "a replayed batch rewrite leaves the sink unchanged") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val alerts = java.nio.file.Files
      .createTempDirectory("streamperc").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("streamperc_ck").toString
    val stored = Seq(
      (1L, Seq("sort", "merge"), Seq("scan")),
      (2L, Seq("query"), Seq.empty[String]))
      .toDF("query_id", "must", "must_not")
    val source = MemoryStream[(Long, String)]
    val q = StreamingPercolate.run(
      source.toDF().toDF("doc_id", "text"),
      "doc_id", "text", stored, alerts, ckpt)
    val waves = Seq(
      Seq((1L, "sort merge join"), (2L, "sort merge scan")),
      Seq((3L, "query filter"), (4L, "plain text")),
      Seq((5L, "query sort merge")))
    try {
      waves.foreach { w =>
        source.addData(w: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def sink() = spark.read.parquet(alerts)
      .select(col("batch_id").cast("long"), col("query_id"),
        col("doc_id"))
      .as[(Long, Long, Long)].collect().toSet
    val got = sink()
    val want = waves.zipWithIndex.flatMap { case (w, i) =>
      TextAnalysis.percolate(w.toDF("doc_id", "text"),
          "doc_id", "text", stored)
        .as[(Long, Long)].collect()
        .map { case (qid, did) => (i.toLong, qid, did) }
    }.toSet
    assert(got == want, s"streamed alerts diverged: $got vs $want")
    // doc 1 fires q1 (sort+merge, no scan); doc 2 blocked by scan;
    // docs 3 and 5 fire q2; 5 also fires q1 — sanity-pin the shape
    assert(got == Set((0L, 1L, 1L), (1L, 2L, 3L), (2L, 1L, 5L),
      (2L, 2L, 5L)))
    // replay idempotence: re-running batch 1's write (the exact
    // foreachBatch body) must leave the sink bit-identical — the
    // dynamic overwrite touches only its own partition and rewrites
    // the same deterministic content
    TextAnalysis.percolate(waves(1).toDF("doc_id", "text"),
        "doc_id", "text", stored)
      .withColumn("batch_id", lit(1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(alerts)
    assert(sink() == want, "replayed batch changed the alerts sink")
  }
}
