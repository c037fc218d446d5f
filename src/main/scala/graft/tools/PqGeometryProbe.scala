package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.{ProductQuantize, Similarity}

/** QUALITY/COST frontier for the IVF-PQ geometry (r17 verdict
  * stretch 7): the gate rows run m=8·k=16 — 4-bit codes, 32 bits per
  * vector — whose flat-ADC recall at the sf0.1 hard end is inherently
  * low (the measured 2/10 single-query band that kept q190's
  * single-query floor a collapse alarm). This sweep scores the SAME
  * %29 panel the recall floors ride, against exact brute force, across
  * (m, k, nProbe), isolating the PQ geometry: centroids (kCells=8) and
  * cell assignment are fit ONCE and shared, so the recall movement is
  * purely codebook resolution × pruning.
  *
  * Cost axes printed per geometry: bits/vector (m·log2 k — the index
  * size that scales with the corpus and the real budget at 100 TB),
  * LUT entries per query (m·k — the per-probe arithmetic), and the
  * train+encode wall at this SF. The table turns the conservative
  * gate floors into an engineering choice with numbers: the gate
  * geometry is the smallest-index point on the frontier, not a
  * quality recommendation.
  *
  * Usage: runMain graft.tools.PqGeometryProbe [sfDir] [m:k:nProbe,...]
  */
object PqGeometryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val geoms = args.lift(1)
      .getOrElse("8:16:8,8:64:8,8:256:8,16:16:8,16:256:8,8:16:4," +
        "8:256:4,4:16:8")
      .split(",").toSeq.map { s =>
        val Array(m, k, np) = s.split(":"); (m.toInt, k.toInt, np.toInt)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.engine.Caching.scoped {
      val e = Tables(spark, sfDir, "embeddings")
      val corpus = graft.engine.Caching.cached(
        e.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding")))
      val dims = corpus.select(size(col("embedding"))).head().getInt(0)
      val panel = graft.engine.Caching.cached(
        e.filter(col("vec_id") % 29 === 1)
          .select(col("vec_id").as("qid"),
            VectorFns.toDouble(col("embedding")).as("qvec")))
      val nPanel = panel.count()
      require(nPanel > 0, s"PqGeometryProbe: empty %29 panel at $sfDir")
      val exact = graft.engine.Caching.cached(
        Similarity.topKMulti(corpus, panel, "vec_id", "embedding", 10)
          .select(col("qid"), col("vec_id")))
      exact.count()
      // fixed across geometries: the recall movement is purely PQ
      val cents = Similarity.learnedCentroids(corpus, "embedding", 8)
        .localCheckpoint()
      val assign = graft.engine.Caching.cached(
        Similarity.ivfAssignCosine(corpus, cents, "vec_id",
          "embedding"))
      assign.count()
      println(s"corpus=${corpus.count()} dims=$dims panel=$nPanel " +
        s"kCells=8 (recall@10 vs exact cosine, all geometries share " +
        "one centroid fit)")
      println(f"${"m"}%3s ${"k"}%4s ${"nProbe"}%6s ${"bits/vec"}%8s " +
        f"${"LUT"}%5s ${"recall@10"}%10s ${"fit+enc s"}%9s")
      for ((m, k, np) <- geoms) {
        require(dims % m == 0,
          s"PqGeometryProbe: m=$m does not divide dims=$dims")
        val t0 = System.nanoTime()
        val books = ProductQuantize.pqTrain(corpus, "embedding", m, k)
        val codes = graft.engine.Caching.cached(
          ProductQuantize.pqEncode(corpus, "vec_id", "embedding",
            books, m).join(assign, Seq("vec_id")))
        codes.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val hits = ProductQuantize.ivfPqScoreCodesMulti(codes, books,
            cents, panel, "vec_id", k = 10, nProbe = np, m = m)
          .select(col("qid"), col("vec_id"))
          .join(exact, Seq("qid", "vec_id"))
          .count()
        codes.unpersist()
        val bits = m * (math.log(k) / math.log(2)).round
        println(f"$m%3d $k%4d $np%6d $bits%8d ${m * k}%5d " +
          f"${hits * 100.0 / (nPanel * 10)}%9.1f%% $wall%9.1f")
      }
    }
    spark.stop()
  }
}
