package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Dedup

/** The streaming analog of the q102 curation capstone: quality gate →
  * decontamination → watermark-bounded exact dedup COMPOSED in one
  * stream, with the result pinned against the same funnel applied in
  * batch (stream/batch parity is the contract for every stage, so it
  * must survive composition too). */
class StreamingPipelineSpec extends SparkSpec {

  test("composed hygiene stream (quality → decontam → dedup) drops " +
      "each hazard at its stage and matches the batch funnel") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val benchDf = Seq("bench secret answer key").toDF("text")
    val sigs = StreamingFilters.benchmarkSignatures(benchDf, "text")

    def funnel(docs: org.apache.spark.sql.DataFrame) =
      StreamingFilters.qualityGate(
        StreamingFilters.decontaminate(
          StreamingFilters.qualityGate(docs, "text",
            minToks = 3, maxToks = 10, minMeanTokLen = 1.0,
            maxMeanTokLen = 10.0, maxStopFrac = 0.5,
            stopwords = Seq("the")),
          sigs, "text"),
        // second (no-op) gate proves stacked filters survive streaming
        "text", minToks = 1, maxToks = 100, minMeanTokLen = 0.5,
        maxMeanTokLen = 20.0, maxStopFrac = 1.0,
        stopwords = Seq("the"))

    val source = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = StreamingDedup.exactWithinWatermark(
      funnel(source.toDF().toDF("ts", "doc_id", "text")),
      textCol = "text", tsCol = "ts", delay = "10 minutes")

    val q = out.writeStream
      .format("memory").queryName("stream_pipeline")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val rows = Seq(
        (ts("2026-01-01 10:00:00"), 1L, "good solid doc content here"),
        (ts("2026-01-01 10:00:01"), 2L, "x"),                // quality
        (ts("2026-01-01 10:00:02"), 3L, "bench secret answer key"), // decontam
        // same token SET as doc 1 → in-window duplicate
        (ts("2026-01-01 10:00:03"), 4L, "here content doc solid good"),
        (ts("2026-01-01 10:00:04"), 5L, "another unique document entirely"))
      source.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_pipeline")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == Set(1L, 5L), s"got $streamed")

      // batch parity: the same funnel + batch exact dedup (keep min
      // id per signature) over the same rows selects the same docs
      val batchIn = rows.toDF("ts", "doc_id", "text")
      val gated = funnel(batchIn)
      val reps = Dedup.exact(gated, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val batch = gated.join(reps, Seq("doc_id"), "left_semi")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batch == streamed,
        s"stream $streamed != batch $batch — composition broke parity")
    } finally q.stop()
  }
}
