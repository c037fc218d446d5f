package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Stream-stream master⊕detail join: watermark-bounded state, matches
  * only within the lookback window. */
class StreamingJoinSpec extends SparkSpec {

  test("details join their master within the lookback window; stale " +
      "details do not match") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val masters = MemoryStream[(java.sql.Timestamp, Long, String)]
    val details = MemoryStream[(java.sql.Timestamp, Long, String)]
    val joined = StreamingJoin.masterDetail(
      masters.toDF().toDF("ts", "key", "master_val"),
      details.toDF().toDF("ts", "key", "detail_val"),
      keyCol = "key", tsCol = "ts",
      // delay must cover cross-batch arrival skew: a detail older than
      // the GLOBAL watermark (min over both inputs) is dropped as late
      // data before the join ever sees it
      lookback = "10 minutes", delay = "10 minutes")

    val q = joined.writeStream
      .format("memory").queryName("stream_md")
      .outputMode(OutputMode.Append())
      .start()
    try {
      details.addData(
        (ts("2024-01-01 10:00:00"), 1L, "d-in-window"),
        (ts("2024-01-01 09:40:00"), 1L, "d-too-old"),
        (ts("2024-01-01 10:06:00"), 1L, "d-after-master"),
        (ts("2024-01-01 10:00:00"), 2L, "d-other-key"))
      masters.addData((ts("2024-01-01 10:05:00"), 1L, "m1"))
      q.processAllAvailable()
      // a detail arriving in a later micro-batch still matches while
      // the master is inside the buffered-state window
      details.addData((ts("2024-01-01 10:02:00"), 1L, "d-late-arrival"))
      q.processAllAvailable()

      val got = spark.table("stream_md")
        .select("detail_val").collect().map(_.getString(0)).toSet
      assert(got == Set("d-in-window", "d-late-arrival"),
        s"got $got — expected only details in [09:55, 10:05] for key 1")
    } finally q.stop()
  }
}
