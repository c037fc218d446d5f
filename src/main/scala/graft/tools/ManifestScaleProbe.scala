package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.SegmentManifest

/** Manifest-AXIS scale probe (r14 verdict item 3): every probe entry
  * of a manifest layout pays `SegmentManifest.latest` — one `_gen/`
  * listing plus one manifest parse — and every maintenance op pays the
  * same via `sealNext`. At streaming cadence a lexical loop seals 2–4
  * generations per wave, so 10³–10⁴ accumulated generations between
  * vacuums is the realistic band to measure. This probe seals N
  * generations of a steady-state composition (8 segments × 4 layouts
  * = 32 entries per manifest), then times:
  *
  *   - `generations()` (the bare `_gen/` listing),
  *   - `latest()` (listing + newest-manifest parse) — the per-probe
  *     entry cost,
  *   - `seal` of the next generation (listing + parse + render +
  *     temp-write + link) — the per-maintenance-op cost,
  *   - `vacuum(keep = 2)` over the accumulated manifests plus a
  *     200-dir unreferenced `_rev` population (the dir sweep is
  *     dir-count-sized, the manifest walk generation-sized),
  *   - `latest()` again after the vacuum.
  *
  * Pass criteria: latest()/seal stay in the low-millisecond band
  * through 10³ (a sub-percent tax on any real probe) and the vacuum
  * wall is linear in the reclaimed generation count; the numbers pick
  * the streaming loops' default vacuum cadence (PLANS.md table).
  *
  * Usage: runMain graft.tools.ManifestScaleProbe [gens...]
  */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val counts =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(100, 1000, 10000)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeMs[T](reps: Int)(body: => T): Double = {
      body // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body)
      (System.nanoTime() - t0) / 1e6 / reps
    }

    println(f"${"gens"}%7s ${"sealAll s"}%10s ${"list ms"}%8s " +
      f"${"latest ms"}%10s ${"seal ms"}%8s ${"vacuum ms"}%10s " +
      f"${"latest' ms"}%11s")
    for (n <- counts) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"manifestprobe_$n").toString
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // steady-state physical population: 8 live segment dirs per
      // layout + 200 unreferenced _rev dirs for the vacuum sweep
      for (l <- SegmentManifest.Layouts; s <- 0 until 8)
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/$l/seg=$s"))
      for (g <- 0 until 200)
        fs.mkdirs(new org.apache.hadoop.fs.Path(
          s"$dir/_rev/g$g-probe000/postings/seg=9"))
      def composition(gen: Int) = SegmentManifest.Manifest(gen,
        SegmentManifest.Layouts.map(l =>
          l -> (0 until 8).map(s =>
            SegmentManifest.Entry(s, s"$l/seg=$s"))).toMap)
      val t0 = System.nanoTime()
      (0 until n).foreach(g =>
        SegmentManifest.seal(spark, dir, composition(g)))
      val sealAll = (System.nanoTime() - t0) / 1e9
      val listMs = timeMs(20)(SegmentManifest.generations(spark, dir))
      val latestMs = timeMs(20)(SegmentManifest.latest(spark, dir))
      // one throwaway gen per rep would grow n; time 5 seal+delete
      val sealMs = timeMs(5) {
        SegmentManifest.seal(spark, dir, composition(n))
        fs.delete(new org.apache.hadoop.fs.Path(
          f"$dir/_gen/m$n%09d"), false)
      }
      val tv = System.nanoTime()
      val (removed, kept) = SegmentManifest.vacuum(spark, dir, 2)
      val vacuumMs = (System.nanoTime() - tv) / 1e6
      val latestMs2 = timeMs(20)(SegmentManifest.latest(spark, dir))
      println(f"$n%7d $sealAll%10.2f $listMs%8.2f $latestMs%10.2f " +
        f"$sealMs%8.2f $vacuumMs%10.1f $latestMs2%11.2f " +
        f"(removed=$removed kept=$kept)")
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    spark.stop()
  }
}
