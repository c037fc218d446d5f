package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.{SegmentManifest, TextAnalysis}
import graft.streaming.StreamingVectorIndex

/** Step profiler for the q189 cross-family capstone: times each
  * lifecycle phase (lexical waves + fold, the two vector bootstraps,
  * their waves, and the three as-of probes) so a wall regression can
  * be pinned to a phase. Usage: runMain graft.tools.XftProfile
  * [sfDir] [reps]
  */
object XftProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    graft.engine.HeapWarmup.touchFrontier()
    val s = spark

    def step[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $label%-16s ${(System.nanoTime - t0) / 1e9}%6.2f s")
      r
    }

    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      println(s"rep $rep:")
      val t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        val isBase = col("id") % 4 =!= 3
        val isMod = isBase && col("id") % 7 === 1
        val isDel = isBase && col("id") % 7 =!= 1 && col("id") % 9 === 2
        val docs = Tables(s, sfDir, "documents")
          .select(col("doc_id").as("id"),
            coalesce(col("text"), lit("")).as("text"))
          .filter(col("id") % 2 === 1)
        val emb = Tables(s, sfDir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding"))
          .filter(col("id") % 2 === 1)
        val qv = Tables(s, sfDir, "embeddings")
          .filter(col("vec_id") === 0)
          .select(VectorFns.toDouble(col("embedding")).as("qvec"))
        def tmp(n: String) =
          java.nio.file.Files.createTempDirectory(n).toString
        val lex = tmp("xftp_lex")
        step("lex base") {
          TextAnalysis.bm25AppendSegment(docs.filter(isBase)
            .select(col("id").as("doc_id"), col("text")),
            "doc_id", "text", lex, 0)
        }
        step("lex waveA") {
          TextAnalysis.bm25ApplyUpserts(s, lex,
            docs.filter(col("id") % 4 === 3)
              .unionByName(docs.filter(isMod)
                .select(col("id"), concat(col("text"), lit(" v2"))
                  .as("text")))
              .select(col("id").as("doc_id"), col("text")),
            docs.filter(isDel).select(col("id").as("doc_id")),
            "doc_id", "text", segment = 1, maxSegments = 8)
        }
        val gMid = SegmentManifest.latestGen(s, lex).get
        step("lex waveB+fold") {
          TextAnalysis.bm25ApplyUpserts(s, lex,
            docs.filter(col("id") % 5 === 0)
              .select(col("id").as("doc_id"),
                concat(col("text"), lit(" v3")).as("text")),
            docs.limit(0).select(col("id").as("doc_id")),
            "doc_id", "text", segment = 2, maxSegments = 8)
          TextAnalysis.bm25MergeSegments(s, lex, "doc_id")
        }
        def wave(ups: DataFrame, dels: DataFrame) = ups
          .select(col("id").as("vec_id"), col("embedding"),
            lit("upsert").as("op"))
          .unionByName(dels.select(col("id").as("vec_id"),
            col("embedding"), lit("delete").as("op")))
        def shift(df: DataFrame, by: Float) = df.select(col("id"),
          transform(col("embedding"), x => x + lit(by)).as("embedding"))
        val waveA = wave(
          emb.filter(col("id") % 4 === 3)
            .unionByName(shift(emb.filter(isMod), 0.25f)),
          emb.filter(isDel))
        val waveB = wave(shift(emb.filter(col("id") % 5 === 0), 0.5f),
          emb.limit(0))
        val vq = tmp("xftp_vq")
        val vp = tmp("xftp_vp")
        step("vq bootstrap") {
          StreamingVectorIndex.bootstrapQuantized(emb.filter(isBase)
            .select(col("id").as("vec_id"), col("embedding")),
            vq, "vec_id", "embedding", k = 16)
        }
        step("vp bootstrap") {
          StreamingVectorIndex.bootstrapIvfPq(emb.filter(isBase)
            .select(col("id").as("vec_id"), col("embedding")),
            vp, "vec_id", "embedding", kCells = 16, m = 8, k = 16)
        }
        step("vq waves") {
          for ((w, b) <- Seq((waveA, 0L), (waveB, 1L)))
            StreamingVectorIndex.applyWaveQuantized(s, vq, w, b,
              "vec_id", "embedding", k = 16,
              cdFactorX100 = 1000000L, skewFactorX100 = 1000000L,
              historyRetention = 8)
        }
        step("vp waves") {
          for ((w, b) <- Seq((waveA, 0L), (waveB, 1L)))
            StreamingVectorIndex.applyWaveIvfPq(s, vp, w, b,
              "vec_id", "embedding", kCells = 16, m = 8, k = 16,
              cdFactorX100 = 1000000L, skewFactorX100 = 1000000L,
              historyRetention = 8)
        }
        step("snap ids x2") {
          def snapIds(root: String) = StreamingVectorIndex
            .readSnapshot(s, root, 1, "vec_id", "embedding")
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          require(snapIds(vq) == snapIds(vp))
        }
        val panel = Seq((0L, "sort merge join"),
          (1L, "query filter v2")).toDF("qid", "qtext")
        step("lex asof probe") {
          TextAnalysis.bm25ProbeSegmented(s, lex, panel,
              k = 10, "doc_id", asOfGeneration = Some(gMid))
            .write.format("noop").mode("overwrite").save()
        }
        step("vq asof probe") {
          StreamingVectorIndex.probeAsOfQuantized(s, vq, 1,
              qv, "vec_id", "embedding", k = 10, nProbe = 3)
            .write.format("noop").mode("overwrite").save()
        }
        step("vp asof probe") {
          StreamingVectorIndex.probeAsOfIvfPq(s, vp, 1,
              qv, "vec_id", "embedding", k = 10, nProbe = 3)
            .write.format("noop").mode("overwrite").save()
        }
      }
      println(f"  TOTAL            ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
