package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Streaming forms of the corpus-hygiene filters: a continuously-ingesting
  * training-data pipeline applies these AT INGEST so contaminated or
  * low-quality documents never land in the corpus at all.
  *
  * Two execution shapes, chosen per filter:
  *   - Stateless predicates (quality gate) are plain streaming filters —
  *     codegen'd maps over each micro-batch, no state, no watermark.
  *   - Decontamination is a STREAM-STATIC LEFT-ANTI JOIN: the benchmark
  *     signature set is a static (periodically refreshed) frame; Spark
  *     re-plans the static side each micro-batch, broadcasts it when
  *     small, and the stream side carries only a 32-byte digest per doc.
  *     No streaming state at all — the static side IS the state.
  */
object StreamingFilters {

  /** Gopher-style quality gate as a streaming filter — the FULL q59
    * batch predicate (token count, mean token length, stopword
    * fraction, with q59's round-to-4 on the ratios) so a doc passes the
    * stream gate iff it passes the batch gate: stream/batch parity is a
    * contract here, not a resemblance. */
  def qualityGate(docs: DataFrame, textCol: String,
                  minToks: Int = 30, maxToks: Int = 80,
                  minMeanTokLen: Double = 3.0, maxMeanTokLen: Double = 10.0,
                  maxStopFrac: Double = 0.08,
                  stopwords: Seq[String] = Seq("a", "the")): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val nToks = size(toks)
    val meanTokLen = round(
      (length(col(textCol)) - (nToks - 1)).cast("double") /
        nToks.cast("double"), 4)
    val stopFrac = round(TextAnalysis.wordSetRatio(toks, stopwords), 4)
    docs.filter(
      nToks.between(minToks, maxToks) &&
        meanTokLen.between(minMeanTokLen, maxMeanTokLen) &&
        stopFrac <= maxStopFrac)
  }

  /** Doc-level exact decontamination: drop any streamed document whose
    * token-set signature appears in the benchmark. `benchSigs` must be
    * a static 1-column ("sig") frame of md5 signatures (build it with
    * [[benchmarkSignatures]]); left_anti stream-static joins are
    * stateless on the stream side. */
  def decontaminate(docs: DataFrame, benchSigs: DataFrame,
                    textCol: String): DataFrame =
    docs
      .withColumn("_sig", md5(Dedup.tokenSetSignature(col(textCol))))
      .join(benchSigs, col("_sig") === benchSigs("sig"), "left_anti")
      .drop("_sig")

  /** Benchmark signature set for [[decontaminate]] — computed once from
    * the (batch) benchmark table; at scale this is a small materialized
    * table refreshed when the benchmark suite changes. */
  def benchmarkSignatures(bench: DataFrame, textCol: String): DataFrame =
    bench.select(md5(Dedup.tokenSetSignature(col(textCol))).as("sig"))
      .distinct()

  /** Perplexity-style gate at ingest: score each streamed document
    * under a STATIC bigram model ([[TextAnalysis.bigramModel]], built
    * offline from a reference corpus) and emit only docs whose mean
    * add-1-smoothed log-probability clears `minScore`.
    *
    * Shape: per-doc bigram explode → stream-static LEFT joins against
    * the model counts (unseen bigrams/contexts smooth to (0+1)/(0+V))
    * → watermark-bounded event-time aggregate folds the rows back to
    * one per (doc, window). The aggregation is why this is not a plain
    * filter: a doc's row emits in Append mode once the watermark
    * closes its window — the structural price of a score that needs
    * the whole document. `vocabSize` is a model constant (driver
    * scalar), not a third stream-static join.
    *
    * Docs with < 2 tokens have no bigrams, hence no defined LM score —
    * they are DROPPED (same contract as the batch
    * [[TextAnalysis.bigramLmScores]]); run them through a length gate
    * first if they must be dispositioned explicitly. */
  def lmScoreGate(docs: DataFrame, idCol: String, textCol: String,
                  tsCol: String, c2: DataFrame, c1: DataFrame,
                  vocabSize: Long, minScore: Double,
                  delay: String, windowLen: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val bg = docs.withWatermark(tsCol, delay)
      .select(col(idCol), col(tsCol), col(textCol),
        explode(TextAnalysis.bigramPairs(toks)).as("b"))
      .select(col(idCol), col(tsCol), col(textCol),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
    bg.join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .withColumn("_lnp",
        log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + lit(vocabSize.toDouble))))
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(first(col(textCol)).as(textCol),
        round(avg(col("_lnp")), 4).as("lm_score"))
      .filter(col("lm_score") >= minScore)
      .select(col(idCol), col(textCol), col("lm_score"))
  }
}
