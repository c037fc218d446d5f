package graft.tools

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingUpsert

/** STATE-SCALE probe for the event-time settle operator (r16 verdict
  * stretch 7): [[StreamingUpsert.latestByKeyWithinWatermark]] claims
  * state bounded by OPEN KEYS — one winner row per in-flight key,
  * never version history — which is the only property that lets the
  * settle front sit under an unbounded recrawl stream. This probe
  * measures the claim under the adversarial shape: a SKEWED hot-key
  * stream where half of every batch is versions of ONE key (the
  * recrawl-storm case) and the other half sweeps a rotating uniform
  * slice of the key space.
  *
  * Per batch it records the state store's row counts
  * (StateOperatorProgress: total/updated/removed), the emitted winner
  * count, and the batch wall — then one far-future watermark pusher
  * triggers the full EVICTION SWEEP (every open key times out in one
  * batch) and its wall is recorded separately.
  *
  * Pass criteria: state rows track the OPEN KEY count (never the
  * version count — the hot key's 10⁵ versions/batch must hold exactly
  * one state row), per-batch wall is linear in input rows (the
  * driver-free reduce), and the sweep wall is linear in closed keys.
  * The numbers pick the settle front's delay/cadence dial the way
  * ManifestScaleProbe's picked the vacuum cadence (PLANS.md table).
  * The hot key also demonstrates the one real skew axis: all its
  * versions land in one task's reduce — linear, single-core, the
  * groupByKey contract; the probe prints the wall so the axis has a
  * measured magnitude, not a scaladoc caveat.
  *
  * Usage: runMain graft.tools.UpsertStateProbe [keys rowsPerBatch batches]
  */
object UpsertStateProbe {
  def main(args: Array[String]): Unit = {
    val keys = args.lift(0).map(_.toInt).getOrElse(20000)
    val rowsPerBatch = args.lift(1).map(_.toInt).getOrElse(200000)
    val batches = args.lift(2).map(_.toInt).getOrElse(6)
    require(keys >= 2 && rowsPerBatch >= 2 && batches >= 1,
      s"UpsertStateProbe: need keys >= 2 (hot + cold), rowsPerBatch " +
        s">= 2, batches >= 1 — got $keys/$rowsPerBatch/$batches")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val source = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val emitted = new java.util.concurrent.atomic.AtomicLong
    val settled = StreamingUpsert.latestByKeyWithinWatermark(
      source.toDF().toDF("ts", "k", "v", "payload"),
      key = "k", ordCol = "v", rowTieBreak = "payload",
      tsCol = "ts", delay = "2 minutes")
    val q = settled.writeStream
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("upsertprobe_ck").toString)
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        emitted.addAndGet(b.count()); ()
      }
      .start()

    val t0ms = 1700000000000L
    // batch b's event time advances one minute per batch, so with a
    // 2-minute delay a cold key's slice stays open ~3 batches — the
    // steady state holds ≈ (churn window × slice size) + 1 open keys
    def batchRows(b: Int) = {
      val ts = new java.sql.Timestamp(t0ms + b * 60000L)
      val half = rowsPerBatch / 2
      val hot = (0 until half).iterator.map(i =>
        (ts, 0L, b.toLong * half + i, s"p$i"))
      val cold = (0 until half).iterator.map { i =>
        val k = 1L + ((b.toLong * half + i) % (keys - 1))
        (ts, k, b.toLong, s"p$i")
      }
      (hot ++ cold).toSeq
    }

    println(f"${"batch"}%5s ${"input"}%8s ${"stateRows"}%10s " +
      f"${"updated"}%8s ${"removed"}%8s ${"emitted"}%8s ${"wall ms"}%8s")
    for (b <- 0 until batches) {
      val before = emitted.get()
      source.addData(batchRows(b))
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e6
      val so = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty).lastOption
        .map(_.stateOperators(0))
      println(f"$b%5d $rowsPerBatch%8d " +
        f"${so.map(_.numRowsTotal).getOrElse(-1L)}%10d " +
        f"${so.map(_.numRowsUpdated).getOrElse(-1L)}%8d " +
        f"${so.map(_.numRowsRemoved).getOrElse(-1L)}%8d " +
        f"${emitted.get - before}%8d $wall%8.0f")
    }
    // the eviction sweep: one far-future pusher closes EVERY open key
    // in a single timeout pass
    val before = emitted.get()
    source.addData(Seq(
      (new java.sql.Timestamp(t0ms + 86400000L), -1L, 0L, "push")))
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e6
    val finalRows = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty).lastOption
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    println(f"sweep: ${emitted.get - before}%d winners evicted in " +
      f"$wall%.0f ms; state rows after sweep = $finalRows%d")
    q.stop()
    spark.stop()
  }
}
