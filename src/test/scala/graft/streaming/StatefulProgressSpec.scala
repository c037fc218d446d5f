package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StatefulProgress.ProgressEvent

/** mapGroupsWithState driven through a real incremental streaming query:
  * per-task state must accumulate across micro-batches, not reset. */
class StatefulProgressSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming sessions close via event-time timeout as watermark advances") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql
    import StatefulProgress.SessionEvent

    val source = MemoryStream[SessionEvent]
    val sessions = StatefulProgress.streamingSessions(source.toDS(), gapMinutes = 5)
    val q = sessions.writeStream
      .format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 7: two events 30s apart → one open session
      source.addData(
        SessionEvent(7L, ts("2024-01-01 10:00:00")),
        SessionEvent(7L, ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      assert(spark.table("stream_sessions").count() == 0,
        "session still open, nothing emitted")

      // another user's much later event advances the watermark past
      // 10:00:30 + 5min → user 7's session times out and is emitted
      source.addData(SessionEvent(8L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // timeout fires on the batch AFTER the watermark advances
      source.addData(SessionEvent(8L, ts("2024-01-01 10:31:00")))
      q.processAllAvailable()

      val rows = spark.table("stream_sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
      assert(rows.toSeq == Seq(
        (7L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:30.0", 2L)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("per-task state accumulates across micro-batches and updates ETA") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[ProgressEvent]
    val progress = StatefulProgress.runningEta(source.toDS(), totalItems = 10)

    val q = progress.writeStream
      .format("memory").queryName("task_progress")
      .outputMode(OutputMode.Update())
      .start()
    try {
      source.addData(
        ProgressEvent("aracaju", ts("2024-01-01 10:00:00")),
        ProgressEvent("aracaju", ts("2024-01-01 10:00:10")),
        ProgressEvent("pacatuba", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val b1 = spark.table("task_progress").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
      assert(b1("aracaju") == ((2L, 10.0, 40.0)),
        s"2 done over 10s, avg 5s, 8 left -> eta 40s; got ${b1("aracaju")}")
      assert(b1("pacatuba")._1 == 1L)

      // batch 2: state must CONTINUE from 2, not restart
      source.addData(
        ProgressEvent("aracaju", ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      // Update mode re-emits only changed keys; read the latest row per task
      val rows = spark.table("task_progress").collect()
        .filter(_.getString(0) == "aracaju")
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      val latest = rows.maxBy(_._1)
      assert(latest == ((3L, 30.0, 10.0)),
        s"3 done over 30s, avg 10s; got $latest")
    } finally q.stop()
  }
}
