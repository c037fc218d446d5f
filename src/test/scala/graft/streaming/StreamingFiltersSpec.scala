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

  test("streaming LM gate passes in-distribution docs and drops " +
      "out-of-distribution ones once the watermark closes their window") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    // model corpus: "a b" dominates; vocabulary {a, b, z}
    val (c2, c1, v) = graft.operators.TextAnalysis.bigramModel(
      Seq("a b a b a b a b", "a b a b z").toDF("text"), "text")
    assert(v == 3)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val source = MemoryStream[(java.sql.Timestamp, Long, String)]
    val gated = StreamingFilters.lmScoreGate(
      source.toDF().toDF("ts", "doc_id", "text"),
      "doc_id", "text", "ts", c2, c1, v,
      // model: c2(a,b)=6, c2(b,a)=4, c1(a)=6, c1(b)=5, V=3. Doc 1
      // averages ln(7/9)·3/5 + ln(5/8)·2/5 ≈ −0.339; the all-unseen
      // "z z z z" doc scores ln(1/3) ≈ −1.099 — threshold between
      minScore = -1.0, delay = "1 minute", windowLen = "1 minute")
    val q = gated.writeStream.format("memory").queryName("stream_lm")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "a b a b a b"),
        (ts("2024-01-01 10:00:10"), 2L, "z z z z"))
      q.processAllAvailable()
      // advance the watermark past the 10:00 window
      source.addData((ts("2024-01-01 10:05:00"), 3L, "a b"))
      q.processAllAvailable()
      val rows = spark.table("stream_lm")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(rows.keySet == Set(1L), s"got $rows")
      val expected =
        (3 * math.log(7.0 / 9) + 2 * math.log(5.0 / 8)) / 5
      assert(math.abs(rows(1L) - expected) < 1e-3,
        s"score ${rows(1L)} vs expected $expected")
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
