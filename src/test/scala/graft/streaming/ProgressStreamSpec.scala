package graft.streaming

// Spark 4 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** W1–W3 driven end-to-end through a real streaming query: unbounded
  * source (MemoryStream) → classify → stateful counters → memory sink,
  * with incremental batches proving update semantics. */
class ProgressStreamSpec extends SparkSpec {

  test("stdout-style stream classifies and counts incrementally") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[String]
    val counted = ProgressStream.counters(
      ProgressStream.classify(source.toDF()))

    val q = counted.writeStream
      .format("memory").queryName("progress_counts")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      source.addData(
        "Extraindo dados da página 1",
        "Extraindo dados da página 2",
        "Dados salvos para aracaju 2024-01",
        // a no-records month also completes a task (interface.py:174)
        "Nenhum registro de royalties foi extraído para barra 2024-02",
        "log noise")
      q.processAllAvailable()
      val t1 = spark.table("progress_counts")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(t1("page_done") == 2 && t1("task_done") == 2 && t1("other") == 1)

      // second micro-batch updates the running state, not a fresh count
      source.addData("Extraindo dados da página 3", "[PROGRESSO] 10%")
      q.processAllAvailable()
      val t2 = spark.table("progress_counts")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(t2("page_done") == 3 && t2("progress") == 1)
    } finally q.stop()
  }

  test("file-sink query resumes from checkpoint exactly once") {
    import java.nio.file.{Files, Paths}
    val base = Paths.get("target", "test-scratch", "stream_ckpt")
    if (Files.exists(base))
      Files.walk(base).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    val (in, out, ckpt) = (base.resolve("in"), base.resolve("out"),
      base.resolve("ckpt"))
    Files.createDirectories(in)

    def startQuery() =
      ProgressStream.classify(spark.readStream.text(in.toString))
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()

    Files.write(in.resolve("b1.txt"),
      "Extraindo dados da página 1\nDados salvos para x\n".getBytes("UTF-8"))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // restart from the SAME checkpoint with one new file: the old file
    // must not be reprocessed (exactly-once), the new one must land
    Files.write(in.resolve("b2.txt"),
      "Extraindo dados da página 2\n".getBytes("UTF-8"))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(out.toString)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 3, s"exactly-once violated: ${rows.toSeq}")
    assert(rows.count(_._2 == "page_done") == 2)
    assert(rows.count(_._2 == "task_done") == 1)
  }

  test("windowed rate groups by event-time minute with watermark") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[(java.sql.Timestamp, String)]
    val rated = ProgressStream.windowedRate(
      ProgressStream.classify(
        source.toDF().toDF("ts", "value")), "ts")

    val q = rated.writeStream
      .format("memory").queryName("progress_rate")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      source.addData(
        (ts("2024-01-01 10:00:05"), "Extraindo dados da página 1"),
        (ts("2024-01-01 10:00:40"), "Extraindo dados da página 2"),
        (ts("2024-01-01 10:01:10"), "Extraindo dados da página 3"))
      q.processAllAvailable()
      val rows = spark.table("progress_rate")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(rows.contains(("2024-01-01 10:00:00.0", "page_done", 2L)))
      assert(rows.contains(("2024-01-01 10:01:00.0", "page_done", 1L)))
    } finally q.stop()
  }

  test("sliding rate: each event lands in both overlapping windows") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val sqlCtx = sql

    val source = MemoryStream[(java.sql.Timestamp, String)]
    val rated = ProgressStream.slidingRate(
      ProgressStream.classify(
        source.toDF().toDF("ts", "value")), "ts")

    val q = rated.writeStream
      .format("memory").queryName("progress_sliding")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      source.addData(
        (ts("2024-01-01 10:00:05"), "Extraindo dados da página 1"),
        (ts("2024-01-01 10:00:40"), "Extraindo dados da página 2"),
        (ts("2024-01-01 10:01:10"), "Extraindo dados da página 3"))
      q.processAllAvailable()
      val rows = spark.table("progress_sliding")
        .filter($"event" === "page_done")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).toSet
      // 2-min windows sliding 1 min: 10:00:05 & 10:00:40 hit windows
      // starting 09:59 and 10:00; 10:01:10 hits 10:00 and 10:01
      assert(rows == Set(
        ("2024-01-01 09:59:00.0", 2L),
        ("2024-01-01 10:00:00.0", 3L),
        ("2024-01-01 10:01:00.0", 1L)), s"got $rows")
    } finally q.stop()
  }
}
