package graft.tools

import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession

import graft.operators.SegmentManifest

/** Clone-AXIS scale probe: [[SegmentManifest.cloneGeneration]] copies
  * one member directory per task inside a Spark job (the distcp
  * shape), so its wall should stay flat-per-member as the member
  * count grows — the 10⁴-cell index clones with cluster parallelism,
  * never a driver loop. This probe seals a manifest of N cell
  * members (one 256 KiB file each — the writers' one-compact-file
  * discipline; the copy is byte-level, so payload shape beyond size
  * is irrelevant) and times:
  *
  *   - `cloneGeneration` (the shipped entry-parallel copy + re-seal),
  *   - the DRIVER-LOOP baseline it replaces (sequential per-member
  *     `FileUtil.copy`, same delete-then-copy discipline) — the
  *     shape a naive backup script would run.
  *
  * Pass criteria: the shipped clone's per-member cost FALLS with N
  * (task parallelism amortizing job overhead) while the driver loop's
  * stays flat-to-rising — at equal local[8] IO bandwidth the probe
  * mainly demonstrates the overhead class, not raw throughput: on a
  * real cluster the driver loop is bounded by ONE machine's NIC, the
  * job by the cluster's aggregate.
  *
  * Usage: runMain graft.tools.CloneScaleProbe [memberCounts...]
  */
object CloneScaleProbe {
  def main(args: Array[String]): Unit = {
    val counts =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(8, 64, 512)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    val payload = Array.fill[Byte](256 * 1024)(0x5a)

    def timeS[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"members"}%8s ${"clone s"}%9s ${"ms/member"}%10s " +
      f"${"driver s"}%9s ${"ms/member"}%10s")
    for (n <- counts) {
      val src = java.nio.file.Files
        .createTempDirectory(s"cloneprobe_$n").toString
      val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
      val entries = (0 until n).map { i =>
        val d = new org.apache.hadoop.fs.Path(s"$src/centroid_id=$i")
        fs.mkdirs(d)
        val out = fs.create(
          new org.apache.hadoop.fs.Path(d, "part-00000.parquet"), true)
        try out.write(payload) finally out.close()
        SegmentManifest.Entry(i, s"centroid_id=$i")
      }
      SegmentManifest.seal(spark, src,
        SegmentManifest.Manifest(1, Map("cells" -> entries)))

      val dstJob = java.nio.file.Files
        .createTempDirectory(s"cloneprobe_dst_$n").toString + "/idx"
      val tClone = timeS {
        SegmentManifest.cloneGeneration(spark, src, dstJob)
      }

      // driver-loop baseline: same per-member delete-then-copy, no job
      val dstLoop = java.nio.file.Files
        .createTempDirectory(s"cloneprobe_loop_$n").toString + "/idx"
      val confW = new SerializableWritable(conf)
      val tLoop = timeS {
        entries.foreach { e =>
          val sp = new org.apache.hadoop.fs.Path(s"$src/${e.loc}")
          val dp = new org.apache.hadoop.fs.Path(s"$dstLoop/${e.loc}")
          val dfs = dp.getFileSystem(confW.value)
          if (dfs.exists(dp)) dfs.delete(dp, true)
          else dfs.mkdirs(dp.getParent)
          require(org.apache.hadoop.fs.FileUtil.copy(fs, sp, dfs, dp,
            false, true, confW.value))
        }
        SegmentManifest.seal(spark, dstLoop,
          SegmentManifest.Manifest(1, Map("cells" -> entries)))
      }

      // the clone must be complete: every member readable at dst
      val cloned = SegmentManifest.latest(spark, dstJob).get
      require(cloned.entries("cells").size == n, "clone lost members")
      println(f"$n%8d ${tClone}%9.2f ${tClone * 1000 / n}%10.2f " +
        f"${tLoop}%9.2f ${tLoop * 1000 / n}%10.2f")
    }
    spark.stop()
  }
}
