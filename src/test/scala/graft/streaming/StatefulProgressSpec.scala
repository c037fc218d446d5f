package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StatefulProgress.ProgressEvent

/** mapGroupsWithState driven through a real incremental streaming query:
  * per-task state must accumulate across micro-batches, not reset. */
class StatefulProgressSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

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
