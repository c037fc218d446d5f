package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.Similarity

/** PANEL-AVERAGED recall@10 sweep over IVF centroid count × nProbe —
  * the parameter-selection instrument behind q31/q75's settings.
  * Single-query recall on the isotropic synthetic corpus swings ±5
  * hits with the query draw, so every number here is averaged over a
  * 50-query panel (vec_id < 50).
  * Usage: runMain graft.tools.IvfRecallProbe [sfDir]
  */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nq = 50
    val e = Tables(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"),
        VectorFns.toDouble(col("embedding")).as("qvec")).cache()
    val base = e.filter(col("vec_id") >= nq).cache()
    val exact = Similarity.topKMulti(base, queries, "vec_id",
        "embedding", 10)
      .select(col("qid"), col("vec_id")).cache()
    exact.count()
    def hits(approx: org.apache.spark.sql.DataFrame): Long =
      approx.select(col("qid"), col("vec_id"))
        .join(exact, Seq("qid", "vec_id")).count()
    for (k <- Seq(8, 10, 16, 22); np <- Seq(2, 3, 5)) {
      val c = Similarity.learnedCentroids(base, "embedding", k = k)
      val h = hits(Similarity.ivfTopKCosineMulti(base, c, queries,
        "vec_id", "embedding", k = 10, nProbe = np))
      println(f"learned-cos k=$k nProbe=$np avgRecall=${h / (10.0 * nq)}%.3f" +
        f" probeFrac=${np.toDouble / k}%.2f")
    }
    spark.stop()
  }
}
