package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Similarity, TextAnalysis}

/** Recall dial of the late-interaction CANDIDATE-GENERATION rung
  * ([[Similarity.maxSimTopKPruned]]): returned scores are exact by
  * construction (candidates rescore with their full token set), so
  * the ONLY quality loss is a relevant document whose every token
  * misses the probed cells. This probe measures top-k overlap of the
  * pruned form against exact brute MaxSim over the documents table
  * for a sweep of (kCells, nProbe), per query panel — the number
  * that prices nProbe the way RecallFloorProbe prices the IVF
  * families' dials.
  *
  * Usage: runMain graft.tools.MaxSimRecallProbe [sfDir] [k]
  */
object MaxSimRecallProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val d = Tables(spark, sf, "documents")
    val docVecs = d.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(
          coalesce(col("text"), lit(""))))).as("tok"))
      .select(col("doc_id"),
        Similarity.tokenPseudoVec(col("tok")).as("tokvec"))
      .localCheckpoint()
    // three panels spanning the rarity spectrum of the q197 design
    val panels = Seq(
      "common" -> Seq("scan", "filter", "table", "join"),
      "mixed" -> Seq("scan", "filter", "dup", "zetadrive"),
      "oov" -> Seq("zetadrive", "qux", "flibbertigibbet", "xyzzy"))
    println(f"${"panel"}%8s ${"kCells"}%7s ${"nProbe"}%7s " +
      f"${"recall@" + k}%10s")
    for ((name, toks) <- panels) {
      val qv = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("qtok_id", "tok")
        .select(col("qtok_id"),
          Similarity.tokenPseudoVec(col("tok")).as("qvec"))
        .localCheckpoint()
      val brute = Similarity.maxSimTopK(docVecs, qv, "doc_id", k)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      for (kc <- Seq(8, 16); np <- Seq(1, 2, 4, kc)) {
        val pruned = Similarity.maxSimTopKPruned(docVecs, qv,
            "doc_id", k, kCells = kc, nProbe = np)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val rec = (brute & pruned).size.toDouble / brute.size
        println(f"$name%8s $kc%7d $np%7d ${rec * 100}%9.1f%%")
      }
    }
    spark.stop()
  }
}
