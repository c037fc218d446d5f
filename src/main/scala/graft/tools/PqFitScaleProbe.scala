package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.{ProductQuantize, Similarity}

/** Empirical probe for the round-12 bounded-sample PQ fit (r11 verdict
  * item 1): the 100 TB claim is that the codebook fit's wall is
  * SAMPLE-sized — after the one distinct-subvector/count pass, the
  * Lloyd's loop never touches the corpus. Two measurements:
  *
  *   1. Fit wall vs corpus multiplier (×1/×10/×20, every dim perturbed
  *      per copy so distinct subvectors genuinely grow ×m), with a
  *      BINDING cap (the gate-scale corpora never reach the FAISS
  *      default, so the probe forces the regime) against the
  *      effectively-unbounded fit. Pass = capped wall flat-ish in m
  *      (only the scan pass grows) while the unbounded wall grows
  *      with the corpus.
  *   2. Recall parity: the 50-query flat-ADC panel recall with the
  *      binding cap vs the unbounded fit at the same scale — the
  *      sample must not cost measurable quality (Jégou et al. / FAISS
  *      practice: codebooks saturate at ~39·k training points).
  *
  * Usage: runMain graft.tools.PqFitScaleProbe [sfDir] [multipliers]
  */
object PqFitScaleProbe {

  /** ×m corpus inflation for VECTORS: each copy shifts ids and
    * perturbs every dimension, so per-subspace distinct-subvector
    * counts scale ×m (a plain copy would dedup back to ×1). */
  def inflate(vecs: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      vecs.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(i * 1e-4f)).as("embedding"))
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,10,20")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cap = 2000L // binds from ×2 on the sf0.1 corpus (2000 vectors)

    def time3(label: String)(body: => Unit): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${reps.map(r => f"$r%.2f").mkString(" / ")} s " +
        f"(min ${reps.min}%.2f)")
    }

    println(s"== fit wall (m=8, k=16, cap=$cap vs unbounded)")
    mults.foreach { m =>
      val v = graft.engine.Caching.cached(inflate(emb, m))
      val n = v.count()
      time3(f"x$m%-2d ($n%7d vecs) capped   ") {
        ProductQuantize.pqTrain(v, "embedding", m = 8, k = 16,
          sampleCap = cap).collect()
      }
      time3(f"x$m%-2d ($n%7d vecs) unbounded") {
        ProductQuantize.pqTrain(v, "embedding", m = 8, k = 16)
          .collect()
      }
      v.unpersist()
    }

    println("== recall parity (50-query flat-ADC panel, k=16 codes)")
    val nPanel = 50
    val queries = graft.engine.Caching.cached(
      emb.filter(col("vec_id") < nPanel)
        .select(col("vec_id").as("qid"),
          VectorFns.toDouble(col("embedding")).as("qvec")))
    val base = graft.engine.Caching.cached(
      emb.filter(col("vec_id") >= nPanel))
    val exact = graft.engine.Caching.cached(
      Similarity.topKMulti(base, queries, "vec_id", "embedding", 10)
        .select(col("qid"), col("vec_id")))
    exact.count()
    // a cap of 39·k = 624 BINDS on the ~1950-vector base — the probe's
    // parity claim is about the production regime, so force it
    for ((label, sc) <- Seq(("cap=624 (39k, binding)", 624L),
        ("cap=1000 (binding)", 1000L), ("unbounded", 0L))) {
      val cb = ProductQuantize.pqTrain(base, "embedding", m = 8,
        k = 16, sampleCap = sc)
      val codes = ProductQuantize.pqEncode(base, "vec_id", "embedding",
        cb, m = 8)
      val r = ProductQuantize.pqScoreCodesMulti(codes, cb, queries,
          "vec_id", k = 10, m = 8)
        .select(col("qid"), col("vec_id"))
        .join(exact, Seq("qid", "vec_id")).count()
      println(s"RECALL flat-adc $label: $r /500")
    }
    spark.stop()
  }
}
