package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SegmentManifest

/** Member-count axis of the manifest READ path: [[SegmentManifest
  * .read]] resolves a pinned layout as a UNION of one parquet scan
  * per entry — fine at gate scale (≤ 16 cells / segments), but a
  * production inverted file holds 10³–10⁵ cells and Catalyst pays
  * per-branch planning (FileIndex, listing, schema merge) plus an
  * O(branches) analyzer walk for every probe. This probe seals one
  * manifest with N single-file members and times (a) the pinned
  * union read (plan + one pruned collect, the probe shape) vs (b) a
  * PARENT-GROUPED read — all member dirs under one hive parent read
  * through a single multi-path scan with `basePath`, the key column
  * recovered by partition discovery. Pass criteria: if (a)'s wall
  * grows superlinearly past 10³ members while (b) stays flat, the
  * manifest read should group entries by parent directory.
  *
  * Usage: runMain graft.tools.UnionReadScaleProbe [counts...]
  */
object UnionReadScaleProbe {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(64, 256, 1024, 4096)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    println(f"${"members"}%8s ${"build s"}%8s ${"union probe s"}%14s " +
      f"${"grouped probe s"}%16s")
    for (n <- counts) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"unionprobe_$n").toString
      // one tiny single-file member per cell, written in one pass
      (0 until n).map(c => (c.toLong, c.toLong * 7, s"payload$c"))
        .toDF("centroid_id", "id", "payload")
        .repartition(col("centroid_id"))
        .write.partitionBy("centroid_id").parquet(s"$dir/live")
      val t0 = System.nanoTime()
      val entries = (0 until n).map(c =>
        SegmentManifest.Entry(c, s"live/centroid_id=$c"))
      val m = SegmentManifest.Manifest(1,
        Map("cells" -> entries))
      SegmentManifest.seal(spark, dir, m)
      val build = (System.nanoTime() - t0) / 1e9
      val probeCells = Seq(0L, (n / 2).toLong, (n - 1).toLong)
      def timed(body: => Long): (Double, Long) = {
        val t = System.nanoTime()
        val r = body
        ((System.nanoTime() - t) / 1e9, r)
      }
      val (tUnion, rowsU) = timed {
        SegmentManifest.read(spark, dir,
            SegmentManifest.latest(spark, dir).get, "cells",
            "centroid_id").get
          .filter(col("centroid_id").isin(probeCells: _*))
          .count()
      }
      val (tGrouped, rowsG) = timed {
        spark.read.option("basePath", s"$dir/live")
          .parquet(probeCells.map(c => s"$dir/live/centroid_id=$c"): _*)
          .count()
      }
      require(rowsU == rowsG, s"row mismatch $rowsU vs $rowsG")
      println(f"$n%8d $build%8.2f $tUnion%14.2f $tGrouped%16.2f")
      new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    spark.stop()
  }
}
