package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming corpus upsert: one winning row per key, decided by the
  * batch latestByKey rule (highest version, NULL versions lose, equal
  * ties → min tiebreak, re-deliveries never fan out), emitted when the
  * watermark closes the key and state evicted with it. */
class StreamingUpsertSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("cross-batch re-delivery, late higher version, and all-NULL-" +
      "version keys collapse to exactly the batch winner per key") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[(java.sql.Timestamp, Long, String, Option[Long])]
    val latest = StreamingUpsert.latestByKeyWithinWatermark(
      source.toDF().toDF("ts", "id", "text", "v"),
      key = "id", ordCol = "v", rowTieBreak = "text",
      tsCol = "ts", delay = "10 minutes")

    val q = latest.writeStream
      .format("memory").queryName("stream_upsert")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: key 1 v1; key 2 with only-NULL versions (the q84 bug
      // case: must survive, min-text tiebreak); key 3 tie on v=5;
      // key 4 ties on v=7 with a NULL vs non-NULL tiebreak — batch
      // min(tb) SKIPS the NULL, so the non-NULL row must win (the
      // round-8 review caught the streaming rule inverting this)
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "one-v1", Some(1L)),
        (ts("2024-01-01 10:00:10"), 2L, "nv-b", None),
        (ts("2024-01-01 10:00:20"), 2L, "nv-a", None),
        (ts("2024-01-01 10:00:30"), 3L, "tie-b", Some(5L)),
        (ts("2024-01-01 10:00:40"), 3L, "tie-a", Some(5L)),
        (ts("2024-01-01 10:00:50"), 4L, null, Some(7L)),
        (ts("2024-01-01 10:00:55"), 4L, "tbx", Some(7L)))
      q.processAllAvailable()
      // batch 2: EXACT re-delivery of key 1's row (the retry case —
      // must not fan out), plus a LATE-but-admissible higher version
      // for key 1 with an EARLIER event time than the re-delivery
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "one-v1", Some(1L)),
        (ts("2024-01-01 09:59:00"), 1L, "one-v2-late", Some(2L)))
      q.processAllAvailable()
      assert(spark.table("stream_upsert").count() == 0,
        "nothing may emit before the watermark closes the keys")
      // push the watermark far past every key's (latest ts + delay)
      source.addData(
        (ts("2024-01-01 11:00:00"), 99L, "wm-pusher", Some(1L)))
      q.processAllAvailable()

      val out = spark.table("stream_upsert")
        .collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[String]("text"),
            Option(r.getAs[java.lang.Long]("v")).map(_.toLong))))
        .toMap
      assert(out == Map(
        1L -> (("one-v2-late", Some(2L))), // late v2 beats re-delivered v1
        2L -> (("nv-a", None)), // all-NULL-version key survives, min text
        3L -> (("tie-a", Some(5L))), // equal v → min tiebreak
        4L -> (("tbx", Some(7L)))), // NULL tiebreak LOSES (batch parity)
        s"got $out")
      assert(spark.table("stream_upsert").count() == 4,
        "exactly one row per closed key")
    } finally q.stop()
  }

  test("the timeout keys on the key's LATEST event time, not the " +
      "winner's own: a winner older than a losing sibling must not " +
      "evict early — an admissible re-delivery of the loser would " +
      "re-open the key and fan out a second winner") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    val source = MemoryStream[(java.sql.Timestamp, Long, String, Option[Long])]
    val latest = StreamingUpsert.latestByKeyWithinWatermark(
      source.toDF().toDF("ts", "id", "text", "v"),
      key = "id", ordCol = "v", rowTieBreak = "text",
      tsCol = "ts", delay = "10 minutes")
    val q = latest.writeStream
      .format("memory").queryName("stream_upsert_ts")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // ONE batch: the WINNER (v2) carries the OLDER event time; the
      // losing v1 sibling carries the newer one. The key's admission
      // horizon is the v1 row's 10:20 — evicting at 10:00 + delay
      // would release the winner while v1 re-deliveries are still
      // admissible.
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "one-v2", Some(2L)),
        (ts("2024-01-01 10:20:00"), 1L, "one-v1", Some(1L)))
      q.processAllAvailable()
      // watermark to 10:15: past the WINNER's ts + delay, but not
      // past the key's latest (10:20) + delay — the key must stay
      // open (the old winner-ts timeout emitted here)
      source.addData(
        (ts("2024-01-01 10:25:00"), 98L, "wm-pusher-1", Some(1L)))
      q.processAllAvailable()
      assert(spark.table("stream_upsert_ts").count() == 0,
        "key evicted on the winner's event time while a losing " +
          "sibling's horizon was still open")
      // the loser's re-delivery is admissible (10:20 >= wm 10:15) —
      // with the key still open it merges into the winner's state
      source.addData(
        (ts("2024-01-01 10:20:00"), 1L, "one-v1", Some(1L)))
      q.processAllAvailable()
      // close everything: exactly ONE winner for key 1, the v2 row
      source.addData(
        (ts("2024-01-01 11:00:00"), 99L, "wm-pusher-2", Some(1L)))
      q.processAllAvailable()
      val key1 = spark.table("stream_upsert_ts")
        .filter($"id" === 1L).collect()
        .map(r => (r.getAs[String]("text"),
          r.getAs[java.lang.Long]("v").toLong))
      assert(key1.toSeq == Seq(("one-v2", 2L)),
        s"expected exactly one settled v2 winner, got ${key1.toSeq}")
    } finally q.stop()
  }

  test("admission boundary: a row with event time EXACTLY equal to " +
      "the watermark lands the same way in the operator and the " +
      "batch replay (Spark's STRICT > admission, pinned empirically)") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    val source = MemoryStream[(java.sql.Timestamp, Long, String, Option[Long])]
    val latest = StreamingUpsert.latestByKeyWithinWatermark(
      source.toDF().toDF("ts", "id", "text", "v"),
      key = "id", ordCol = "v", rowTieBreak = "text",
      tsCol = "ts", delay = "1 minutes")
    val q = latest.writeStream
      .format("memory").queryName("stream_upsert_bd")
      .outputMode(OutputMode.Append())
      .start()
    val waves: Seq[Seq[(java.sql.Timestamp, Long, String, Option[Long])]] =
      Seq(
        // wave 1 drives the watermark to 10:05 − 1 min = 10:04:00
        Seq((ts("2024-01-01 10:00:00"), 1L, "a-v1", Some(1L)),
          (ts("2024-01-01 10:05:00"), 2L, "b-v1", Some(1L))),
        // wave 2's v2 claim for key 1 sits EXACTLY on the watermark
        Seq((ts("2024-01-01 10:04:00"), 1L, "a-v2-boundary", Some(2L))),
        Seq((ts("2024-01-01 11:00:00"), 9L, "wm-adv", Some(1L))))
    try {
      waves.foreach { w => source.addData(w: _*); q.processAllAvailable() }
      val got = spark.table("stream_upsert_bd")
        .filter($"id" === 1L).collect()
        .map(r => (r.getAs[String]("text"),
          r.getAs[java.lang.Long]("v").toLong)).toSeq
      val replay = graft.operators.Upsert.latestByKeyWavedReplay(
          waves.zipWithIndex.flatMap { case (w, i) =>
            w.map(r => (r._1.getTime, r._2, r._3, r._4, i + 1))
          }.toDF("tsms", "id", "text", "v", "wave"),
          "id", "v", "text", "tsms", delayMs = 60000L, "wave")
        .filter($"evicted" && $"id" === 1L)
        .collect().map(r => (r.getAs[String]("text"),
          r.getAs[java.lang.Long]("v").toLong)).toSeq
      assert(got == replay,
        s"boundary admission diverged: operator=$got replay=$replay")
      // Spark DROPS a watermark-equal row (strict > admission) — the
      // empirical pin that moved the replay (and the q92/q191/q192
      // oracle algebra) off the >= rule it used to encode
      assert(got == Seq(("a-v1", 1L)),
        s"expected the boundary row dropped (strict > rule), got $got")
    } finally q.stop()
  }

  test("eviction boundary: a key whose timeout timestamp EQUALS the " +
      "final watermark lands the same way in the operator and the " +
      "batch replay") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    val source = MemoryStream[(java.sql.Timestamp, Long, String, Option[Long])]
    val latest = StreamingUpsert.latestByKeyWithinWatermark(
      source.toDF().toDF("ts", "id", "text", "v"),
      key = "id", ordCol = "v", rowTieBreak = "text",
      tsCol = "ts", delay = "1 minutes")
    val q = latest.writeStream
      .format("memory").queryName("stream_upsert_ev")
      .outputMode(OutputMode.Append())
      .start()
    // key 1's timeout = 10:00:00 + 1 min + 1 ms = 10:01:00.001; the
    // pusher drives the watermark to EXACTLY that value
    val waves: Seq[Seq[(java.sql.Timestamp, Long, String, Option[Long])]] =
      Seq(
        Seq((ts("2024-01-01 10:00:00"), 1L, "a-v1", Some(1L))),
        Seq((java.sql.Timestamp.valueOf("2024-01-01 10:02:00.001"),
          9L, "wm-adv", Some(1L))))
    try {
      waves.foreach { w => source.addData(w: _*); q.processAllAvailable() }
      val emitted = spark.table("stream_upsert_ev")
        .filter($"id" === 1L).count() == 1
      val replayEvicted = graft.operators.Upsert.latestByKeyWavedReplay(
          waves.zipWithIndex.flatMap { case (w, i) =>
            w.map(r => (r._1.getTime, r._2, r._3, r._4, i + 1))
          }.toDF("tsms", "id", "text", "v", "wave"),
          "id", "v", "text", "tsms", delayMs = 60000L, "wave")
        .filter($"id" === 1L)
        .select($"evicted").head().getBoolean(0)
      assert(emitted == replayEvicted,
        s"eviction boundary diverged: operator emitted=$emitted " +
          s"replay evicted=$replayEvicted")
    } finally q.stop()
  }

  test("waved batch replay reproduces the streaming operator exactly: " +
      "admission, winner rule, and eviction (the q92 gate-row bridge)") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    // wave 2's watermark is 10:05 − 1 min = 10:04: the v9 recrawl at
    // 10:03 must be DROPPED (its higher version never wins) while the
    // 10:04:30 row is admitted; wave 3 advances the final watermark so
    // keys 1-3 close and key 4 stays open in state
    val waves: Seq[Seq[(java.sql.Timestamp, Long, String, Option[Long])]] =
      Seq(
        Seq((ts("2024-01-01 10:00:00"), 1L, "a-v1", Some(1L)),
          (ts("2024-01-01 10:05:00"), 2L, "b-v1", Some(1L))),
        Seq((ts("2024-01-01 10:03:00"), 1L, "a-v9-late", Some(9L)),
          (ts("2024-01-01 10:04:30"), 2L, "b-v2", Some(2L)),
          (ts("2024-01-01 10:06:00"), 3L, "c-v1", Some(1L))),
        Seq((ts("2024-01-01 10:30:00"), 4L, "wm-adv", Some(1L))))

    val source = MemoryStream[(java.sql.Timestamp, Long, String, Option[Long])]
    val latest = StreamingUpsert.latestByKeyWithinWatermark(
      source.toDF().toDF("ts", "id", "text", "v"),
      key = "id", ordCol = "v", rowTieBreak = "text",
      tsCol = "ts", delay = "1 minute")
    val q = latest.writeStream.format("memory").queryName("waved_replay")
      .outputMode(OutputMode.Append()).start()
    val streamed = try {
      waves.foreach { w => source.addData(w: _*); q.processAllAvailable() }
      spark.table("waved_replay").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("text"),
          Option(r.getAs[java.lang.Long]("v")).map(_.toLong))).toSet
    } finally q.stop()

    val batch = waves.zipWithIndex.flatMap { case (w, i) =>
      w.map { case (t, id, tx, v) => (id, tx, v, t.getTime, i + 1) } }
      .toDF("id", "text", "v", "tsms", "wave")
    val replay = graft.operators.Upsert.latestByKeyWavedReplay(
      batch, "id", "v", "text", "tsms", delayMs = 60000L, "wave").collect()
    val evicted = replay.filter(_.getAs[Boolean]("evicted"))
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("text"),
        Option(r.getAs[java.lang.Long]("v")).map(_.toLong))).toSet
    assert(evicted == streamed,
      s"replay evicted $evicted != streaming emissions $streamed")
    assert(streamed == Set(
      (1L, "a-v1", Some(1L)), // the dropped late v9 never wins
      (2L, "b-v2", Some(2L)), // the admitted late v2 does
      (3L, "c-v1", Some(1L))), s"got $streamed")
    val open = replay.filterNot(_.getAs[Boolean]("evicted"))
      .map(_.getAs[Long]("id")).toSet
    assert(open == Set(4L), s"keys still in state: $open")
  }

  test("continuous corpus refresh: finalized winners merge into a " +
      "corpus store via foreachBatch + the batch byKey merge") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    // the production composition: the watermark-finalized winner
    // stream (one row per closed key, already deduplicated) drives the
    // SAME batch merge the nightly job uses — replace same-key rows,
    // append new keys — one micro-batch at a time. foreachBatch is the
    // standard streaming→table-merge bridge; localCheckpoint keeps the
    // evolving corpus lineage flat across batches.
    var corpus = Seq((1L, "old", 0L), (2L, "keep", 0L))
      .toDF("id", "text", "v").localCheckpoint(true)
    val source = MemoryStream[(java.sql.Timestamp, Long, String, Option[Long])]
    val winners = StreamingUpsert.latestByKeyWithinWatermark(
      source.toDF().toDF("ts", "id", "text", "v"),
      key = "id", ordCol = "v", rowTieBreak = "text",
      tsCol = "ts", delay = "5 minutes")
    val q = winners.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          corpus = graft.operators.Upsert.byKey(
            corpus, batch.drop("ts"), "id").localCheckpoint(true)
      }
      .start()
    try {
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "new-v1", Some(1L)),
        (ts("2024-01-01 10:00:10"), 1L, "new-v2", Some(2L)),
        (ts("2024-01-01 10:00:20"), 5L, "ins", Some(1L)))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 11:00:00"), 60L, "wm", Some(1L)))
      q.processAllAvailable()

      val out = corpus.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("text")).toMap
      assert(out == Map(1L -> "new-v2", 2L -> "keep", 5L -> "ins"),
        s"got $out — replace same-key, append new-key, keep untouched")
    } finally q.stop()
  }

  test("state is evicted on emit: a key re-appearing after its window " +
      "closed starts a fresh upsert window") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[(java.sql.Timestamp, Long, String, Option[Long])]
    val latest = StreamingUpsert.latestByKeyWithinWatermark(
      source.toDF().toDF("ts", "id", "text", "v"),
      key = "id", ordCol = "v", rowTieBreak = "text",
      tsCol = "ts", delay = "5 minutes")
    val q = latest.writeStream
      .format("memory").queryName("stream_upsert_evict")
      .outputMode(OutputMode.Append())
      .start()
    try {
      source.addData((ts("2024-01-01 10:00:00"), 1L, "w1-v9", Some(9L)))
      q.processAllAvailable()
      // watermark pusher closes key 1's first window
      source.addData((ts("2024-01-01 10:30:00"), 50L, "wm", Some(1L)))
      q.processAllAvailable()
      // key 1 re-appears LATER with a LOWER version: the old v9 state
      // must be gone — the new window's winner is v3
      source.addData((ts("2024-01-01 10:31:00"), 1L, "w2-v3", Some(3L)))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 11:30:00"), 60L, "wm2", Some(1L)))
      q.processAllAvailable()

      val key1 = spark.table("stream_upsert_evict")
        .filter(org.apache.spark.sql.functions.col("id") === 1L)
        .collect().map(r => (r.getAs[String]("text"), r.getAs[Long]("v")))
      assert(key1.toSet == Set(("w1-v9", 9L), ("w2-v3", 3L)),
        s"two independent windows expected; got ${key1.toSeq}")
    } finally q.stop()
  }
}
