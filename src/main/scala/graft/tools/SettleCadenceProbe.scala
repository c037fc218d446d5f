package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.streaming.StreamingVectorIndex

/** END-TO-END latency instrument for the event-time settle FRONT
  * composed with a REAL wave loop (r17 verdict item 5):
  * [[graft.tools.UpsertStateProbe]] measured the settle stage alone;
  * this probe drives [[StreamingVectorIndex.runQuantizedEventTime]] —
  * settle → applyWaveQuantized, the production composition — at
  * recrawl shape and measures the latency from a version's ARRIVAL to
  * its PROBE VISIBILITY as a function of the two dials an operator
  * actually sets: the watermark `delay` and the wave CADENCE (how far
  * event time advances per wave).
  *
  * The tracked version is a fresh key carrying the query vector
  * itself, so "visible" is unambiguous: the instant the winner is
  * applied, [[StreamingVectorIndex.probeLiveQuantized]]'s top-1 flips
  * to the tracked key at cosine ≈ 1.
  *
  * The model the table documents (the vacuum-cadence analog of
  * ManifestScaleProbe): a winner EVICTS — and only evicted winners
  * reach the index — when the watermark passes its event time plus
  * `delay`, and the watermark itself lags max event time by `delay`
  * and one batch. So visibility needs event time to advance ~2·delay
  * past the version, rounded UP to the next wave boundary, plus one
  * wave of watermark lag and the applying wave itself:
  * waves-to-visible ≈ ceil(2·delay / cadence) + 2, and wall latency =
  * that many wave walls (each measured here: settle + delta append +
  * dirty-cell refresh + drift fold + vacuum). The dial reading:
  * `delay` buys out-of-order tolerance at 2× its value in event-time
  * staleness; CADENCE converts that staleness into wave count — a
  * fast cadence burns waves polling the watermark forward, a slow one
  * adds up to one cadence of rounding. Both effects are measured, not
  * derived.
  *
  * Usage: runMain graft.tools.SettleCadenceProbe
  *          [sfDir] [delayMin:cadenceMin,...]
  */
object SettleCadenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val combos = args.lift(1).getOrElse("1:1,2:1,2:2,5:5")
      .split(",").toSeq.map { s =>
        val Array(d, c) = s.split(":"); (d.toInt, c.toInt)
      }
    require(combos.forall { case (d, c) => d >= 1 && c >= 1 },
      s"SettleCadenceProbe: delay/cadence minutes must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val e = Tables(spark, sfDir, "embeddings")
    val corpus = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val qv = e.filter(col("vec_id") === 0)
      .select(VectorFns.toDouble(col("embedding")).as("qvec"))
      .localCheckpoint()
    val trackedVec = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val trackedKey = 999000L
    val t0ms = 1700000000000L

    println(f"${"delay"}%6s ${"cad"}%4s ${"waves"}%6s ${"pred"}%5s " +
      f"${"evtLat s"}%9s ${"wallLat s"}%10s ${"wave s"}%7s " +
      f"${"state"}%6s")
    for ((dMin, cMin) <- combos) {
      graft.engine.Caching.scoped {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"settlecad_${dMin}_$cMin")
        val root = s"$tmp/loop"
        val ckpt = s"$tmp/ck"
        StreamingVectorIndex.bootstrapQuantized(corpus, root,
          "vec_id", "embedding", k = 8)
        val source =
          MemoryStream[(java.sql.Timestamp, Long, Seq[Float], Long,
            String)]
        val q = StreamingVectorIndex.runQuantizedEventTime(
          source.toDF().toDF("ts", "vec_id", "embedding", "v", "op"),
          root, "vec_id", "embedding", versionCol = "v", tsCol = "ts",
          delay = s"$dMin minutes", k = 8, checkpoint = ckpt)
        try {
          // recrawl shape: wave w re-delivers the %17 slice of the
          // corpus (fresh version numbers, vectors unchanged — the
          // common recrawl outcome), event time advancing `cadence`
          // minutes per wave; the tracked version rides wave 1
          def slice(w: Int) = corpus
            .filter(col("vec_id") % 17 === (w % 17).toLong)
            .collect().toSeq.map { r =>
              (new java.sql.Timestamp(t0ms + w.toLong * cMin * 60000L),
                r.getLong(0), r.getSeq[Float](1), w.toLong, "upsert")
            }
          def visible(): Boolean = {
            val top = StreamingVectorIndex.probeLiveQuantized(spark,
              root, qv, "vec_id", k = 1, nProbe = 8).head()
            top.getLong(0) == trackedKey
          }
          val maxWaves = 2 * ((dMin + cMin - 1) / cMin + 1) + 6
          var wavesToVisible = -1
          var wallToVisible = 0.0
          var waveWalls = List.empty[Double]
          var stateRows = -1L
          val tArrive = System.nanoTime()
          var w = 1
          while (w <= maxWaves && wavesToVisible < 0) {
            val rows = slice(w) ++ (if (w == 1)
              Seq((new java.sql.Timestamp(t0ms + cMin * 60000L),
                trackedKey, trackedVec, 1L, "upsert"))
            else Nil)
            source.addData(rows)
            val t0 = System.nanoTime()
            q.processAllAvailable()
            waveWalls ::= (System.nanoTime() - t0) / 1e9
            stateRows = q.recentProgress.toSeq
              .filter(_.stateOperators.nonEmpty).lastOption
              .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
            if (visible()) {
              wavesToVisible = w
              wallToVisible = (System.nanoTime() - tArrive) / 1e9
            }
            w += 1
          }
          val pred = (2 * dMin + cMin - 1) / cMin + 2
          val evtLat = wavesToVisible.toLong * cMin * 60 - cMin * 60
          println(f"$dMin%5dm $cMin%3dm $wavesToVisible%6d $pred%5d " +
            f"$evtLat%9d $wallToVisible%10.1f " +
            f"${waveWalls.sum / waveWalls.size}%7.1f $stateRows%6d")
          require(wavesToVisible > 0,
            s"SettleCadenceProbe: tracked version never became " +
              s"visible within $maxWaves waves (delay=$dMin, " +
              s"cadence=$cMin)")
        } finally q.stop()
      }
    }
    spark.stop()
  }
}
