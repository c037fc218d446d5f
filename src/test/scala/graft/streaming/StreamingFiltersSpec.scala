package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming corpus-hygiene filters: stream/batch predicate parity for
  * the quality gate, and stream-static anti-join decontamination. */
class StreamingFiltersSpec extends SparkSpec {

  test("streaming quality gate drops short and stopword-heavy docs") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[(Long, String)]
    val gated = StreamingFilters.qualityGate(
      source.toDF().toDF("doc_id", "text"), "text",
      minToks = 3, maxToks = 10, maxStopFrac = 0.3)
    val q = gated.writeStream.format("memory").queryName("stream_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(
        (1L, "solid content with five tokens"),
        (2L, "too short"),                        // < minToks
        (3L, "the a the a the a the"),            // stopword-saturated
        (4L, "one two three four five six seven eight nine ten eleven"))
      q.processAllAvailable()
      val ids = spark.table("stream_gate")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L))
    } finally q.stop()
  }

  test("stream-static decontamination drops docs whose signature is in " +
      "the benchmark, order- and multiplicity-insensitively") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val bench = StreamingFilters.benchmarkSignatures(
      Seq((100L, "eval question alpha")).toDF("doc_id", "text"), "text")
    val source = MemoryStream[(Long, String)]
    val cleaned = StreamingFilters.decontaminate(
      source.toDF().toDF("doc_id", "text"), bench, "text")
    val q = cleaned.writeStream.format("memory").queryName("stream_decon")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(
        (1L, "alpha question eval"),        // benchmark token set, reordered
        (2L, "genuinely novel training doc"),
        (3L, "eval question alpha alpha"))  // multiplicity variant → dup
      q.processAllAvailable()
      val ids = spark.table("stream_decon")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(2L))
    } finally q.stop()
  }
}
