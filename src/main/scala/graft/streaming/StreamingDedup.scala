package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** X1 × W — exact dedup on a STREAMING ingest path: a training-data
  * pipeline that consumes documents continuously must suppress
  * duplicates at ingest, not in a later batch pass, or downstream
  * stages train on the dup before the batch job runs.
  *
  * `dropDuplicatesWithinWatermark` keeps one state row per signature
  * and — unlike plain streaming `dropDuplicates`, whose state grows
  * without bound — evicts a signature once the watermark passes its
  * event time + the watermark delay. The deduped contract is therefore
  * time-scoped: a duplicate arriving AFTER the signature was evicted
  * passes through. That is the standard (and only state-bounded)
  * streaming dedup semantics; exact global dedup remains the batch
  * operator ([[graft.operators.Dedup.exact]]), and the two compose:
  * stream-dedup bounds the hot window, a periodic batch pass sweeps
  * the tail.
  *
  * The signature is the SAME order/multiplicity-insensitive token-set
  * signature as the batch operator, so stream- and batch-deduped
  * corpora agree on what "duplicate" means.
  */
object StreamingDedup {

  /** Deduplicate a streaming documents frame (`tsCol` event time,
    * `textCol` content) within `delay` of event time. */
  def exactWithinWatermark(docs: DataFrame, textCol: String,
                           tsCol: String, delay: String): DataFrame =
    docs
      // digest, not raw signature: the dedup state store keeps one row
      // per signature for the whole watermark window — 32 bytes per doc
      // instead of the document itself
      .withColumn("_sig", md5(Dedup.tokenSetSignature(col(textCol))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_sig")
      .drop("_sig")
}
