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

  /** Chunk-level dedup on the streaming path — the continuous form of
    * [[graft.operators.Dedup.chunkDedupStats]]: explode each incoming
    * document into non-overlapping `chunkSize`-token chunks (the same
    * shared chunker as batch, so stream and batch agree on chunk
    * boundaries and signatures) and suppress any chunk whose digest
    * was already seen within the watermark window. The surviving rows
    * (id, ts, cid, chunk) are the "clean lines" stream a downstream
    * assembler or trainer consumes — boilerplate repeated across
    * documents is dropped at ingest time. ONE survivor per digest per
    * window, with earlier micro-batches always beating later ones;
    * WITHIN a micro-batch the survivor is whichever row reaches the
    * state store first (partition-order-dependent), not a
    * deterministic minimum — the batch operator's min-(doc, position)
    * rule is the deterministic form.
    *
    * State = one 32-byte digest row per distinct chunk in the window
    * (never chunk text), evicted by the watermark — the only
    * state-bounded semantics; the batch operator remains the global
    * sweep, same composition contract as [[exactWithinWatermark]]. */
  def chunksWithinWatermark(docs: DataFrame, idCol: String,
                            textCol: String, tsCol: String,
                            chunkSize: Int, delay: String): DataFrame =
    Dedup.chunkRows(docs.withWatermark(tsCol, delay),
        idCol, textCol, chunkSize, carry = Seq(tsCol))
      .dropDuplicatesWithinWatermark("sig")
      .select(col(idCol), col(tsCol), col("cid"), col("chunk"))
}
