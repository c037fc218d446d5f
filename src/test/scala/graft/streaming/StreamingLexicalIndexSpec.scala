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
    val segs = graft.operators.SegmentManifest.latest(spark, dir)
      .get.segs("postings")
    assert(segs.length <= 3,
      s"tiered maintenance left ${segs.length} segments: $segs")
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
    // positions ride the streamed segments too: phrase answers off
    // the maintained layout equal the consecutive-token semantics of
    // everything ingested (docs 1 and 9 carry no "sort merge" run;
    // doc 1 has "sort merge" at pos 1, doc 9 "scan merge" — check
    // against a locally computed truth)
    val phrase = TextAnalysis
      .phraseSearch(spark, dir, Seq("sort", "merge"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val truth = waves.flatten.flatMap { case (id, text) =>
      val t = text.split(" ")
      val starts = (0 until t.length - 1)
        .filter(i => t(i) == "sort" && t(i + 1) == "merge")
      if (starts.isEmpty) None
      else Some((id, starts.length.toLong, starts.head.toLong))
    }.toSet
    assert(phrase == truth,
      "phrase over the streamed layout diverged from token truth")
    assert(phrase.nonEmpty)
  }

  test("the loop's periodic vacuum bounds the manifest axis: " +
      "generations stay at the retention cap, probes keep answering, " +
      "and as-of below the floor fails loudly") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    val dir = java.nio.file.Files
      .createTempDirectory("streamlex_vac").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("streamlex_vac_ck").toString
    val source = MemoryStream[(Long, String)]
    val q = StreamingLexicalIndex.run(
      source.toDF().toDF("doc_id", "text"),
      "doc_id", "text", dir, maxSegments = 3, ckpt,
      vacuumEvery = 2, keepGenerations = 2)
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
    // wave 6 (batchId 5) vacuumed last: exactly keepGenerations remain
    val gens = graft.operators.SegmentManifest.generations(spark, dir)
    assert(gens.length == 2,
      s"vacuum cadence left ${gens.length} generations: $gens")
    // probe parity is untouched by the manifest GC
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
    assert(probed == direct && probed.nonEmpty,
      "vacuumed streaming index diverged from the direct scan")
    // the time-travel floor moved with the vacuum: a generation below
    // it is gone, loudly
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25ProbeSegmented(spark, dir, panel, k = 10,
        "doc_id", asOfGeneration = Some(1))
    }
    assert(e.getMessage.contains("no sealed generation"),
      s"wrong floor message: $e")
  }

  test("full-CRUD streaming loop: upsert and delete waves maintain " +
      "the index snapshot-free; probe equals a direct scan of the " +
      "final corpus") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    val dir = java.nio.file.Files
      .createTempDirectory("streamcrud").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("streamcrud_ck").toString
    // bootstrap index at segment 0 (runUpserts' firstSegment=1 keeps
    // the generation clock above it)
    val initial = Seq((1L, "spark sort merge join"),
      (2L, "hash join scan"), (3L, "table scan filter"))
      .toDF("doc_id", "text")
    TextAnalysis.bm25AppendSegment(initial, "doc_id", "text", dir, 0)
    val source = MemoryStream[(Long, String, String)]
    val q = StreamingLexicalIndex.runUpserts(
      source.toDF().toDF("doc_id", "text", "op"),
      "doc_id", "text", dir, maxSegments = 3, ckpt)
    val waves = Seq(
      Seq((4L, "merge sort window", "upsert"),
        (1L, "spark sort merge join upd", "upsert")),   // add + modify
      Seq((2L, "", "delete"),                            // remove
        (5L, "query filter merge", "upsert")))
    try {
      waves.foreach { w =>
        source.addData(w: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val finalCorpus = Seq((1L, "spark sort merge join upd"),
      (3L, "table scan filter"), (4L, "merge sort window"),
      (5L, "query filter merge")).toDF("doc_id", "text")
    val panel = Seq((0L, "sort merge upd"), (1L, "table scan"))
      .toDF("qid", "qtext")
    val probed = TextAnalysis
      .bm25ProbeSegmented(spark, dir, panel, k = 10, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val direct = TextAnalysis
      .bm25TopK(finalCorpus, "doc_id", "text", panel, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(probed == direct,
      "CRUD streaming loop diverged from the direct scan")
    assert(probed.nonEmpty)
  }

  test("event-time CRUD front: out-of-order versions settle to the " +
      "batch winner BEFORE touching the index, a delete-as-winner " +
      "kills the doc, nothing ingests before the watermark closes a " +
      "key, and a post-watermark straggler is dropped") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files
      .createTempDirectory("streamcrud_et").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("streamcrud_et_ck").toString
    val initial = Seq((1L, "spark sort merge join"),
      (2L, "hash join scan"), (3L, "table scan filter"))
      .toDF("doc_id", "text")
    TextAnalysis.bm25AppendSegment(initial, "doc_id", "text", dir, 0)
    val panel = Seq((0L, "sort merge upd"), (1L, "table scan"))
      .toDF("qid", "qtext")
    def probe() = TextAnalysis
      .bm25ProbeSegmented(spark, dir, panel, k = 10, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val bootstrapAnswer = probe()
    val source = MemoryStream[
      (java.sql.Timestamp, Long, String, Long, String)]
    val q = StreamingLexicalIndex.runUpsertsEventTime(
      source.toDF().toDF("ts", "doc_id", "text", "v", "op"),
      "doc_id", "text", versionCol = "v", tsCol = "ts",
      delay = "10 minutes", dir, maxSegments = 3, ckpt)
    try {
      // key 1: v1 then an OUT-OF-ORDER higher version (earlier event
      // time) — only the settled v2 text may ever reach a segment;
      // key 2: upsert v1 then delete v2 — the winner is the delete;
      // key 4: a new doc, re-delivered exactly (must not fan out)
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "spark sort merge join v1", 1L,
          "upsert"),
        (ts("2024-01-01 10:00:10"), 2L, "hash join scan v1", 1L,
          "upsert"),
        (ts("2024-01-01 10:00:20"), 4L, "merge sort window upd", 1L,
          "upsert"))
      q.processAllAvailable()
      source.addData(
        (ts("2024-01-01 09:59:00"), 1L,
          "spark sort merge join upd", 2L, "upsert"),
        (ts("2024-01-01 10:00:30"), 2L, "", 2L, "delete"),
        (ts("2024-01-01 10:00:20"), 4L, "merge sort window upd", 1L,
          "upsert"))
      q.processAllAvailable()
      // nothing may have been ingested: every key is still open
      // under the 10-minute watermark
      assert(probe() == bootstrapAnswer,
        "a version reached the index before its key settled")
      // advance the watermark far past every key's newest ts + delay
      source.addData(
        (ts("2024-01-01 11:00:00"), 99L, "wm pusher", 1L, "upsert"))
      q.processAllAvailable()
      val settled = probe()
      val finalCorpus = Seq(
        (1L, "spark sort merge join upd"),   // v2 won, v1 never indexed
        (3L, "table scan filter"),           // untouched bootstrap doc
        (4L, "merge sort window upd"))       // re-delivery collapsed
        .toDF("doc_id", "text")              // doc 2: deleted (v2 won)
      val direct = TextAnalysis
        .bm25TopK(finalCorpus, "doc_id", "text", panel, k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(settled == direct,
        "event-time CRUD loop diverged from the settled corpus scan")
      assert(settled.exists(_._2 == 1L) && !settled.exists(_._2 == 2L),
        "winner/delete semantics leaked into the index")
      // a straggler BELOW the watermark (an old higher-version claim
      // for doc 1) must be dropped, not rewind the document. The
      // second pusher closes key 99, so the final corpus gains the
      // first pusher doc (stats shift honestly) — the direct-scan
      // comparison proves doc 1 kept its settled text while the
      // rewound v9 never entered
      source.addData(
        (ts("2024-01-01 10:01:00"), 1L, "rewound text", 9L, "upsert"))
      q.processAllAvailable()
      source.addData(
        (ts("2024-01-01 12:00:00"), 98L, "wm pusher 2", 1L, "upsert"))
      q.processAllAvailable()
      val finalCorpus2 = Seq(
        (1L, "spark sort merge join upd"),
        (3L, "table scan filter"),
        (4L, "merge sort window upd"),
        (99L, "wm pusher")).toDF("doc_id", "text")
      val direct2 = TextAnalysis
        .bm25TopK(finalCorpus2, "doc_id", "text", panel, k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(probe() == direct2,
        "a post-watermark straggler rewound a settled document")
    } finally q.stop()
  }
}
