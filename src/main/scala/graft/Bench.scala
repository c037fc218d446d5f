package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Each query is materialized through the `noop`
  * datasource write — a full end-to-end execution of the registered plan
  * (a bare `.count()` lets Catalyst's EliminateSorts drop the global sorts
  * and under-measures). Failures are recorded per query instead of being
  * swallowed as fake-fast timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the driver captures a bounded tail of stdout and
    // every stray log line competes with the one JSON line for it
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.KeywordFilterFusion.install(spark)
    // warm-up: JVM/codegen/noop-datasource initialization otherwise
    // lands entirely on whichever query runs first
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    // big-heap only: walk the (build.sbt-bounded) allocation frontier
    // once, untimed — first-touch page zeroing is slow on this host and
    // otherwise lands on the first allocation-heavy query (the r8
    // record's q39 45.8 s reading; see HeapWarmup)
    graft.engine.HeapWarmup.touchFrontier()
    // one realistic untimed pass: parquet reader init, scan codegen,
    // and executor-pool first-touch otherwise land on q01 (the
    // alphabetically-first query) — measured ~5 s of one-time cost on
    // a 90 GB heap even after the synthetic frontier walk
    try Seq("lineitem", "documents", "orders").foreach { t =>
      graft.engine.Tables(spark, sfDir, t)
        .write.format("noop").mode("overwrite").save()
    } catch { case scala.util.control.NonFatal(_) => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // dt is captured right after save(), BEFORE the scope's exit
      // unpersist — the cleanup is bookkeeping, not the plan under
      // measurement (r6 briefly timed it; numbers were within noise)
      var dt = 0.0
      val err =
        // scoped: operator-internal caches (simhash sigs, shingle sets,
        // …) are unpersisted at scope exit — without release, by
        // mid-alphabet the BlockManager carries every prior query's
        // blocks and timings measure cache pressure, not the plan
        try { graft.engine.Caching.scoped {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          dt = (System.nanoTime() - t0) / 1e9 }; None }
        catch { case e: Throwable =>
          dt = (System.nanoTime() - t0) / 1e9
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      // final sweep for caches the scope does not own (Spark-ML-internal)
      spark.catalog.clearCache()
      (name, dt, err)
    }
    def jstr(s: String) =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // bounded-precision timings: full-precision doubles made the line
    // ~1 KB longer than it needs to be, and the driver's bounded
    // stdout-tail capture truncated BENCH_r06's head (q01–q10 lost,
    // parse failed). The short stdout line carries 2 decimals (10 ms —
    // plenty for the driver's mover tracking); the committed
    // BENCH_LOCAL.json keeps 4.
    def num(v: Double, scale: Int) =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
    def qmap(key: String => String, scale: Int) =
      results.map { case (k, v, _) => s"${jstr(key(k))}:${num(v, scale)}" }
        .mkString("{", ",", "}")
    // errors keyed CONSISTENTLY with the queries map of the same line
    // (short keys on the short line), so the two maps always join —
    // and a burst of long full-name error entries can't push the
    // short line back over the bounded stdout-tail capture
    def emap(key: String => String, errLen: Int) =
      results.collect { case (k, _, Some(e)) =>
        s"${jstr(key(k))}:${jstr(e.take(errLen))}" }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // the stdout line truncates error VALUES too (a burst of verbose
    // exception messages would otherwise push it back over the bounded
    // tail capture); full messages live in BENCH_LOCAL.json
    def line(key: String => String, scale: Int, errLen: Int = Int.MaxValue) =
      s"""{"metric":"total","value":${num(total, 4)},"unit":"sec","queries":${qmap(key, scale)},"errors":${emap(key, errLen)},"sf":"$sfDir","names":"BENCH_LOCAL.json"}"""
    // STDOUT gets the qNN-keyed line: the driver's tail capture is 2000
    // chars and the full-name line outgrew it at ~84 queries (BENCH_r07
    // lost q01–q09 and failed to parse); the 4-decimal qNN line outgrew
    // it too at 145 queries (round 13 — 2064 chars, caught before the
    // driver run). qNN prefixes are unique by construction and join 1:1
    // to CORRECTNESS keys; the full-name 4-decimal map is written to the
    // committed BENCH_LOCAL.json. 2 decimals holds ~160 queries; the
    // 1-decimal fallback ~190 — degrade rather than clip, loudly.
    val short2 = line(_.takeWhile(_ != '_'), scale = 2, errLen = 80)
    println(if (short2.length <= 1900) short2
            else line(_.takeWhile(_ != '_'), scale = 1, errLen = 60))
    // belt-and-suspenders artifacts: the full-name record survives on
    // disk even if the stdout capture clips, and BENCH_LOCAL.json is
    // committed per-round as the durable full-fidelity copy
    val full = line(identity, scale = 4)
    for (p <- Seq(java.nio.file.Paths.get("target", "bench_last.json"),
                  java.nio.file.Paths.get("BENCH_LOCAL.json"))) {
      try {
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(p, (full + "\n").getBytes("UTF-8"))
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.stop()
  }
}
