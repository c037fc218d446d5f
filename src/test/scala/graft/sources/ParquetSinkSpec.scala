package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Parquet sink layout control: partition directories prune at plan
  * time, file sizes/counts obey the knobs, roundtrip is lossless. */
class ParquetSinkSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("partitioned write prunes directories at plan time and " +
      "round-trips losslessly") {
    val out = scratch("psink_part").toString
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("yr"))
    ParquetSink.write(o, out, partitionBy = Seq("yr"))
    val back = ParquetSink.read(spark, out).filter(col("yr") === 1997)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("yr"),
      s"partition filter did not prune:\n${plan.take(1500)}")
    val expected = o.filter(col("yr") === 1997).count()
    assert(back.count() == expected && expected > 0)
  }

  test("maxRecordsPerFile splits large partitions; coalesceTo caps " +
      "file count for small ones") {
    import spark.implicits._
    val out1 = scratch("psink_split").toString
    val big = (1L to 1000L).toDF("id")
    ParquetSink.write(big, out1, maxRecordsPerFile = 100, coalesceTo = 1)
    val files1 = new java.io.File(out1).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files1 >= 10, s"1000 rows / 100-row cap needs >= 10 files, got $files1")

    val out2 = scratch("psink_coalesce").toString
    ParquetSink.write(big, out2, coalesceTo = 1)
    val files2 = new java.io.File(out2).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files2 == 1, s"coalesceTo=1 must emit one file, got $files2")
  }

  test("sortWithinPartitions clusters rows so row-group stats are " +
      "selective (sorted file reads back in order)") {
    import spark.implicits._
    val out = scratch("psink_sorted").toString
    val scrambled = (1L to 10000L).map(i => (i * 7919) % 10007).toDF("k")
    ParquetSink.write(scrambled, out, sortCols = Seq("k"), coalesceTo = 1)
    // read back WITHOUT sorting: file order == write order == sorted
    val vals = ParquetSink.read(spark, out).collect().map(_.getLong(0))
    assert(vals.length == 10000)
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b },
      "rows must be clustered by k inside the file")
  }

  test("the same layout loop over ORC: partition pruning, lossless " +
      "roundtrip, .orc files on disk") {
    val out = scratch("osink_part").toString
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("yr"))
    ParquetSink.write(o, out, partitionBy = Seq("yr"), format = "orc")
    val back = ParquetSink.read(spark, out, format = "orc")
      .filter(col("yr") === 1997)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("yr"),
      s"ORC partition filter did not prune:\n${plan.take(1500)}")
    val expected = o.filter(col("yr") === 1997).count()
    assert(back.count() == expected && expected > 0)
    val partDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("yr="))
    assert(partDirs.nonEmpty &&
      partDirs.head.listFiles().exists(_.getName.endsWith(".orc")),
      "partition dirs must contain .orc data files")
  }
}
