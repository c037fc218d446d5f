package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Dev utility (round 9): stage-by-stage timing of the q95 novelty
  * profile, which read 47 s warm at sf0.1 — ~20× the same-shape q26.
  * Isolates: shingle explode pass, min-id aggregate, join+final agg.
  * Usage: runMain graft.tools.NoveltyProbe [sfDir]
  */
object NoveltyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }

    // stage 1: one explode pass (the shared subtree), as written
    val sh = docs
      .select(col("doc_id"),
        explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3))
          .as("sh_str"))
      .select(col("doc_id"), xxhash64(col("sh_str")).as("sh"))
    t("explode pass (count)") { sh.count() }
    t("explode pass again") { sh.count() }

    // stage 1b: explode with toks materialized in its own projection
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val sh2 = toks
      .select(col("doc_id"),
        explode(TextAnalysis.shingles(col("toks"), 3)).as("sh_str"))
      .select(col("doc_id"), xxhash64(col("sh_str")).as("sh"))
    t("explode, toks own projection") { sh2.count() }
    t("explode, toks own projection again") { sh2.count() }

    // stage 2: the aggregate
    t("min-id aggregate") {
      sh2.groupBy("sh").agg(min("doc_id")).count()
    }

    // stage 3: full operator as shipped
    t("full noveltyProfile (shipped)") {
      TextAnalysis.noveltyProfile(docs, "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save()
    }
    t("full noveltyProfile rep2") {
      TextAnalysis.noveltyProfile(docs, "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
