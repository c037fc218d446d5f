package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing/cardinality of the MinHash LSH
  * pipeline at a given SF. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables(spark, sfDir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    import graft.operators.{Dedup, TextAnalysis}
    val toks = TextAnalysis.tokens(col("text"))
    time("0 docs count")(println("  docs=" + docs.count()))
    time("1 shingles only") {
      println("  shingle rows=" + docs.select(col("doc_id"),
        TextAnalysis.shingles(toks, 3).as("shs")).selectExpr("sum(size(shs))").collect()(0))
    }
    time("2 signatures") {
      println("  sigs=" + docs.select(col("doc_id"),
        Dedup.minhashSignature(TextAnalysis.shingles(toks, 3), 24).as("sig"))
        .count())
    }
    time("3 candidates") {
      println("  cands=" + Dedup.minhashCandidates(docs, "doc_id", "text").count())
    }
    time("4 full neardups") {
      println("  pairs=" + Dedup.minhashNearDups(docs, "doc_id", "text", 0.5).count())
    }
    spark.stop()
  }
}
