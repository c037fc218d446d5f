package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.Similarity

/** Dev instrument (r10 verdict item 5): the 50-query ANN recall panel
  * swept over nProbe ∈ {1,3,5,8} and centroid seeds {42,43,44}, plus
  * the seeded LSH path — the recall curve PLANS.md records and the
  * evidence behind q75's driver-enforced floors. Recall@10 out of 500
  * (50 queries × k=10) against exact brute-force cosine.
  *
  * Usage: runMain graft.tools.AnnRecallPanelProbe [sfDir ...]
  */
object AnnRecallPanelProbe {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nPanel = 50
    for (dir <- sfDirs) graft.engine.Caching.scoped {
      val e = Tables(spark, dir, "embeddings")
      val queries = graft.engine.Caching.cached(
        e.filter(col("vec_id") < nPanel)
          .select(col("vec_id").as("qid"),
            VectorFns.toDouble(col("embedding")).as("qvec")))
      val base = graft.engine.Caching.cached(
        e.filter(col("vec_id") >= nPanel))
      val exact = graft.engine.Caching.cached(
        Similarity.topKMulti(base, queries, "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id")))
      exact.count()
      def recallOf(approx: org.apache.spark.sql.DataFrame): Long =
        approx.join(exact, Seq("qid", "vec_id")).count()
      for (seed <- Seq(42L, 43L, 44L)) {
        val cents = Similarity.learnedCentroids(base, "embedding",
          k = 16, seed = seed)
        val line = Seq(1, 3, 5, 8).map { nProbe =>
          val r = recallOf(
            Similarity.ivfTopKCosineMulti(base, cents, queries,
                "vec_id", "embedding", k = 10, nProbe = nProbe)
              .select(col("qid"), col("vec_id")))
          f"nProbe=$nProbe:$r%3d"
        }.mkString(" ")
        println(s"RECALL ${graft.engine.GateChecks.sfKey(dir)} " +
          s"ivf seed=$seed $line /500")
      }
      val qlocal = queries.collect()
        .map(r => r.getLong(0) ->
          org.apache.spark.ml.linalg.Vectors.dense(
            r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
      val lsh = recallOf(
        Similarity.brpLshTopKMulti(base, "vec_id", "embedding",
            qlocal, k = 10)
          .select(col("qid"), col("vec_id")))
      println(s"RECALL ${graft.engine.GateChecks.sfKey(dir)} " +
        s"lsh seed=42 $lsh /500")
      // PQ family (round-11): flat ADC (quantization loss only — the
      // recall ceiling PQ's 8×16-code geometry imposes), then IVF-PQ's
      // nProbe sweep (quantization loss × pruning loss composed)
      locally {
        // codebook-size sweep: recall vs code width (k=16 is the
        // 4-bit gate-row setting; 256 is FAISS's standard 1-byte code)
        Seq(16, 64, 256).foreach { kcb =>
          val pqPath = s"target/probe-scratch/annpq${kcb}_" +
            graft.engine.GateChecks.sfKey(dir)
          graft.operators.ProductQuantize.pqWriteIndex(base, "vec_id",
            "embedding", m = 8, k = kcb, pqPath)
          val flat = recallOf(
            graft.operators.ProductQuantize.pqProbeADCMulti(spark,
                pqPath, queries, "vec_id", 10)
              .select(col("qid"), col("vec_id")))
          println(s"RECALL ${graft.engine.GateChecks.sfKey(dir)} " +
            s"pq-adc flat k=$kcb $flat /500")
        }
        val cents = Similarity.learnedCentroids(base, "embedding",
          k = 16, seed = 42L)
        val ivfPath = s"target/probe-scratch/annivfpq_" +
          graft.engine.GateChecks.sfKey(dir)
        graft.operators.ProductQuantize.ivfPqWriteIndex(base, cents,
          "vec_id", "embedding", m = 8, k = 16, ivfPath)
        val line = Seq(1, 3, 5, 8).map { nProbe =>
          val r = recallOf(
            graft.operators.ProductQuantize.ivfPqProbeMulti(spark,
                ivfPath, cents, queries, "vec_id", k = 10,
                nProbe = nProbe)
              .select(col("qid"), col("vec_id")))
          f"nProbe=$nProbe:$r%3d"
        }.mkString(" ")
        println(s"RECALL ${graft.engine.GateChecks.sfKey(dir)} " +
          s"ivfpq seed=42 $line /500")
        // residual rung, same m·k budget — the q131 accuracy claim
        val resPath = s"target/probe-scratch/annivfpqr_" +
          graft.engine.GateChecks.sfKey(dir)
        graft.operators.ProductQuantize.ivfPqWriteIndexResidual(base,
          cents, "vec_id", "embedding", m = 8, k = 16, resPath)
        val rline = Seq(1, 3, 5, 8).map { nProbe =>
          val r = recallOf(
            graft.operators.ProductQuantize.ivfPqProbeResidualMulti(
                spark, resPath, cents, queries, "vec_id", k = 10,
                nProbe = nProbe)
              .select(col("qid"), col("vec_id")))
          f"nProbe=$nProbe:$r%3d"
        }.mkString(" ")
        println(s"RECALL ${graft.engine.GateChecks.sfKey(dir)} " +
          s"ivfpq-res seed=42 $rline /500")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
