package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.sources.CsvIngest

/** S5 × W — the PERMISSIVE corrupt-record contract under continuous
  * ingest: files landing over time, malformed lines surviving as
  * corrupt-flagged rows per micro-batch instead of failing the stream
  * (the streaming form of the reference's warn-and-continue read,
  * `file_utils.py:36-42`). */
class StreamingCsvSpec extends SparkSpec {

  test("streaming tolerant CSV ingest accounts corrupt rows across " +
      "micro-batches") {
    val dir = scratch("streamcsv_in")
    // the scratch tree persists across sbt runs — start from an empty
    // source dir or batch 1 would see the previous run's second file
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    Files.createDirectories(dir)
    val schema = StructType.fromDDL("a STRING, b STRING, c STRING")
    // batch 1: one clean row, one extra-field row
    Files.write(dir.resolve("f1.csv"),
      "a;b;c\nr0;0;x0\nr1;1;x1;EXTRA\n".getBytes("UTF-8"))
    val stream = CsvIngest.readStream(spark, s"$dir/*.csv", schema)
    val q = stream.writeStream.format("memory")
      .queryName("csv_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows1 = spark.table("csv_stream").collect()
      assert(rows1.length == 2)
      assert(rows1.count(_.getAs[String](CsvIngest.CorruptCol) != null) == 1,
        "the extra-field row must be corrupt-flagged, not dropped")
      // batch 2: a missing-field row (also malformed) plus a clean row
      Files.write(dir.resolve("f2.csv"),
        "a;b;c\nr2;2\nr3;3;x3\n".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows2 = spark.table("csv_stream").collect()
      assert(rows2.length == 4, "later files must append, never rescan")
      assert(rows2.count(_.getAs[String](CsvIngest.CorruptCol) != null) == 2)
      // clean rows parse their typed fields
      assert(rows2.filter(_.getAs[String](CsvIngest.CorruptCol) == null)
        .map(_.getAs[String]("a")).toSet == Set("r0", "r3"))
    } finally q.stop()
  }
}
