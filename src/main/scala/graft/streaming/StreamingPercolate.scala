package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** X3 × W — CONTINUOUS percolation: every micro-batch of arriving
  * documents is matched against the stored boolean-query table
  * ([[TextAnalysis.percolate]] → q173) and its alerts land in a
  * parquet sink partitioned by `batch_id` — the streaming half of the
  * alerting/routing primitive ("fire the saved searches this new doc
  * triggers"), composed from the batch operator the gate already
  * verifies.
  *
  * Replay safety: percolation is a DETERMINISTIC pure function of
  * (batch, stored queries), and the sink write is a dynamic-partition
  * overwrite keyed by `batch_id` — a replayed batch rewrites ITS OWN
  * partition with identical content and touches no other partition,
  * so the alerts sink is exactly-once under micro-batch replay with
  * no marker protocol needed (contrast the index-maintenance loops,
  * whose layouts mutate shared state and need sealed markers). The
  * stored query table is captured at stream start; a changed rule set
  * is a new stream — rule hot-swap would need per-batch re-read,
  * which trades determinism under replay and is deliberately not
  * offered. */
object StreamingPercolate {

  /** EVENT-TIME front for [[run]] (the r17 audit's one REAL hazard in
    * this module): raw percolation alerts once per DELIVERY, so a
    * re-delivered document fires its saved searches twice (two
    * batch_id partitions — the alert-stream form of the fan-out the
    * index loops closed), and an out-of-order OLDER version arriving
    * after a newer one fires STALE alerts for content the corpus no
    * longer holds. This front reuses the index loops' shared settle
    * stage ([[StreamingUpsert.latestByKeyWithinWatermark]] — one
    * watermark-settle semantics across the engine): a key's versions
    * settle to ONE winner under the q92 rules, and only settled,
    * EVICTED winners percolate — each key alerts exactly once per
    * settle window, on its winning version only; a straggler past the
    * watermark is dropped instead of alerting on rewound content. The
    * cost is the same watermark latency the index fronts pay: alerts
    * fire `delay` past the key's newest admissible version.
    * Dedup, by contrast, needs no front: suppression is MONOTONE
    * (append-only, no state ever rewinds), proven by spec instead. */
  def runEventTime(docs: DataFrame, idCol: String, textCol: String,
                   versionCol: String, tsCol: String, delay: String,
                   queries: DataFrame, alertsPath: String,
                   checkpoint: String): StreamingQuery =
    run(StreamingUpsert.latestByKeyWithinWatermark(docs, key = idCol,
        ordCol = versionCol, rowTieBreak = textCol, tsCol = tsCol,
        delay = delay)
        .select(col(idCol), col(textCol)),
      idCol, textCol, queries, alertsPath, checkpoint)

  def run(docs: DataFrame, idCol: String, textCol: String,
          queries: DataFrame, alertsPath: String,
          checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          TextAnalysis.percolate(batch.toDF(), idCol, textCol, queries)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(alertsPath)
          ()
        }
      }
      .start()
}
