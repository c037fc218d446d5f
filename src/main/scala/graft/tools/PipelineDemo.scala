package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Decontaminate, Dedup, TextAnalysis}

/** End-to-end training-data pipeline composed from the library the way
  * a user would: benchmark decontamination → quality gate (incl.
  * repetition) → exact dedup → near-dup drop (jaccard pairs →
  * connected components → anti-join) → PII redaction → deterministic
  * split → sequence packing. Prints one JSON summary line per stage.
  *
  * Every stage is a lazy DataFrame transform — the whole pipeline is
  * ONE Catalyst plan per action, and each stage's operator is the same
  * one the gate queries verify (q57/q23+q58/q14/q26+q39/q62/q51/q50
  * semantics).
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val allDocs = Tables(spark, sfDir, "documents")
    val total = allDocs.count()

    // 0. test-set decontamination (q57 semantics): the held-out
    // benchmark slice must never reach the training corpus
    val docs = Decontaminate.clean(
      allDocs.filter(col("doc_id") % 23 =!= 0),
      allDocs.filter(col("doc_id") % 23 === 0),
      "doc_id", "text", n = 8).cache()
    val nDecontaminated = docs.count()

    // 1. quality gate (q23 semantics) + repetition cap (q58 semantics)
    // — the cheap stateless filter runs FIRST so the repetition
    // explode+aggregates only process surviving docs (Catalyst can't
    // push a filter through repetitionStats' aggregations itself)
    val toks = TextAnalysis.tokens(col("text"))
    val gated = docs.filter(
      col("n_chars") >= 150 && col("n_chars") <= 400 && size(toks) >= 30)
    val rep = TextAnalysis.repetitionStats(gated, "doc_id", "text")
      .filter(col("top_tok_frac") <= 0.5).select("doc_id")
    val quality = gated.join(rep, Seq("doc_id")).cache()
    val nQuality = quality.count()

    // 2. exact dedup: keep the min-id representative per token set
    val keep = Dedup.exact(quality, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = quality.join(keep, Seq("doc_id")).cache()
    val nExact = exactDeduped.count()

    // 3. near-dup drop: jaccard pairs → components → anti-join
    val pairs = TextAnalysis.jaccardPairs(exactDeduped, "doc_id", "text",
      n = 3, minJaccard = 0.5)
    val clean = exactDeduped.join(Dedup.nearDupDropList(pairs),
        exactDeduped("doc_id") === col("drop_id"), "left_anti")
      .cache()
    val nClean = clean.count()

    // 4. PII redaction (q62 semantics) then deterministic split (q51)
    val redacted = clean.withColumn("text",
      TextAnalysis.redactPII(col("text")))
    val split = redacted.withColumn("split",
      when(col("doc_id") % 100 < 80, lit("train"))
        .when(col("doc_id") % 100 < 90, lit("val"))
        .otherwise(lit("test")))

    // 5. sequence packing per (split, source) shard (q50 semantics)
    val w = Window.partitionBy(col("split"), col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = split
      .select(col("split"), col("source"), col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_toks"))
      .withColumn("bin",
        ((sum(col("n_toks")).over(w) - col("n_toks")) / 4096).cast("long"))
      .groupBy(col("split"))
      .agg(countDistinct(col("source"), col("bin")).as("n_bins"),
        sum(col("n_toks")).as("tokens"))
      .orderBy(col("split"))
      .collect()
      .map(r => s""""${r.getString(0)}":{"bins":${r.getLong(1)},"tokens":${r.getLong(2)}}""")
      .mkString("{", ",", "}")

    println(s"""{"total":$total,"decontaminated":$nDecontaminated,"quality":$nQuality,"exact_deduped":$nExact,"near_deduped":$nClean,"splits":$packed}""")
    spark.stop()
  }
}
