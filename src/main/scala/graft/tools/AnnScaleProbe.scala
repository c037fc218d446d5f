package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Dedup, Similarity}
import graft.functions.VectorFns

/** Empirical scaling for the ANN/embedding family — the companion to
  * ScaleProbe's dedup table. The sf0.1 embeddings are inflated ×m by
  * stacking m copies, each transformed by a DISTINCT deterministic
  * sign-flip pattern (flip dim j in copy i iff popcount(j & i) is
  * odd): a sign flip is an isometry, so WITHIN-copy geometry (near-dup
  * structure, cluster shape) is preserved exactly, while cross-copy
  * cosines collapse toward 0 — the inflated corpus is m independent
  * populations, not m-cliques of planted duplicates. Pipelines:
  *
  *   - q13 shape: brute cosine top-k (linear scan bound)
  *   - q48 shape: LSH-bucketed embedding near-dup (banded join)
  *   - q82 shape: learned-cluster semantic near-dup (fit + block join)
  *
  * Usage: runMain graft.tools.AnnScaleProbe [sfDir] [multipliers]
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,5,10")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dim = e.select(size(col("embedding"))).first().getInt(0)

    def inflated(m: Int): DataFrame =
      (0 until m).map { i =>
        val signs = array(Seq.tabulate(dim) { j =>
          lit(if (Integer.bitCount(j & i) % 2 == 0) 1.0d else -1.0d)
        }: _*)
        e.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          zip_with(VectorFns.toDouble(col("embedding")), signs,
            (x, s) => x * s).as("embedding"))
      }.reduce(_.unionByName(_))

    def time(label: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        df.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    mults.foreach { m =>
      val d = inflated(m)
      println(s"-- x$m (${d.count()} vectors)")
      val qv = d.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      time(f"x$m q13_brute_topk", Similarity.topK(
        d.filter(col("vec_id") =!= 0), qv, "vec_id", "embedding", 10))
      // the documented scale recipes applied, not fixed toy params:
      // q48's bucket count doubles as the corpus doubles (nPlanes =
      // 8 + log2 m) so per-bucket occupancy — and with it pair volume
      // per bucket — stays constant (the x20 probe with nPlanes FIXED
      // at 8 measured 29 s: occupancy grows ∝ m, in-bucket pairs ∝ m²);
      // q82's k ∝ m keeps cluster SIZE constant, at the price of a
      // k-means fit term ∝ n·k — fit-dominated growth at probe scale,
      // amortized in production by materializing the fitted index (q31)
      val nPlanes = 8 + (math.log(m.toDouble) / math.log(2.0)).ceil.toInt
      time(f"x$m q48_embed_lsh ", Dedup.embedNearDupsLSH(
        d, "vec_id", "embedding", dim = dim, minSim = 0.9,
        nPlanes = nPlanes))
      time(f"x$m q82_clustered ", Dedup.embedNearDupsClustered(
        d, "vec_id", "embedding", k = 8 * m, minSim = 0.4))
    }
    spark.stop()
  }
}
