package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.{ProductQuantize, Similarity}

/** WHY does the residual IVF-PQ rung measure at/below direct IVF-PQ
  * here (the round-11 finding, open since)? FAISS's residual encoding
  * wins when vectors CLUSTER — residuals against the cell centroid
  * then concentrate in a tighter distribution than the raw vectors,
  * so the same m·k codebook budget quantizes finer. The synthetic
  * corpus is near-isotropic (labels are uniform noise, not modes), so
  * the residual transform buys nothing. This probe makes the claim
  * MEASURED, not argued: sweep a deterministic "clusteredness" dial
  * and watch the residual-vs-direct gap flip sign.
  *
  * The dial: blend each unit vector toward its assigned (spherical
  * k-means) centroid — v(α) = (1−α)·uv + α·c_cell — α=0 is the
  * corpus as-is, α→1 collapses each cell to a point. Everything
  * downstream (centroid fit, both index writes, exact panel, recall)
  * recomputes per α from the blended corpus, so the two rungs face
  * identical conditions at every step.
  * Usage: runMain graft.tools.ResidualClusterProbe [sfDir]
  */
object ResidualClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = math.min(8, Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nq = 50
    val e = Tables(spark, sfDir, "embeddings")
    val uvCol = {
      val v = VectorFns.toDouble(col("embedding"))
      transform(v, x => x / VectorFns.norm(v))
    }
    val unit = e.select(col("vec_id"), uvCol.as("uv")).cache()
    // the blend centers: one spherical fit on the RAW corpus, reused
    // across α so the cluster GEOMETRY is fixed and only the
    // concentration varies
    val blendCents = Similarity.learnedCentroids(e, "embedding", k = 16)
      .cache()
    val assign = Similarity.ivfAssignCosine(e, blendCents, "vec_id",
      "embedding").cache()
    val scratch = java.nio.file.Files
      .createTempDirectory("residual_cluster_probe").toString
    for (alpha <- Seq(0.0, 0.5, 0.8, 0.95)) {
      val blended = unit.join(assign, Seq("vec_id"))
        .join(broadcast(blendCents), Seq("centroid_id"))
        .select(col("vec_id"),
          zip_with(col("uv"), col("cvec"),
            (a, b) => a * (1 - alpha) + b * alpha).as("emb"))
        .cache()
      val queries = blended.filter(col("vec_id") < nq)
        .select(col("vec_id").as("qid"), col("emb").as("qvec")).cache()
      val base = blended.filter(col("vec_id") >= nq).cache()
      val exact = Similarity.topKMulti(base, queries, "vec_id",
          "emb", 10)
        .select(col("qid"), col("vec_id")).cache()
      exact.count()
      def hits(approx: org.apache.spark.sql.DataFrame): Long =
        approx.select(col("qid"), col("vec_id"))
          .join(exact, Seq("qid", "vec_id")).count()
      val cents = Similarity.learnedCentroids(base, "emb", k = 16)
        .cache()
      val dirPath = s"$scratch/direct_$alpha"
      val resPath = s"$scratch/residual_$alpha"
      ProductQuantize.ivfPqWriteIndex(base, cents, "vec_id", "emb",
        m = 8, k = 16, dirPath)
      ProductQuantize.ivfPqWriteIndexResidual(base, cents, "vec_id",
        "emb", m = 8, k = 16, resPath)
      val line = Seq(3, 5, 8).map { nProbe =>
        val d = hits(ProductQuantize.ivfPqProbeMulti(spark, dirPath,
          cents, queries, "vec_id", k = 10, nProbe = nProbe))
        val r = hits(ProductQuantize.ivfPqProbeResidualMulti(spark,
          resPath, cents, queries, "vec_id", k = 10, nProbe = nProbe))
        f"nProbe=$nProbe direct=$d%3d residual=$r%3d Δ=${r - d}%+4d"
      }.mkString("  ")
      println(f"alpha=$alpha%.2f  $line  (of ${10 * nq})")
      Seq(blended, queries, base, exact, cents).foreach(_.unpersist())
    }
    spark.stop()
  }
}
