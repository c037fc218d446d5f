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
}
