package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W1–W4 — the reference's one genuinely streaming dataflow, re-expressed
  * as Structured Streaming transforms.
  *
  * Reference (`/root/reference/interface.py:166-197`): an unbounded
  * line stream (child-process stdout) is pattern-matched into event
  * types, driving monotone counters and a windowed rate/ETA. Here the
  * same transforms are defined over any streaming (or batch — the
  * functions are source-agnostic) DataFrame with a `value: string`
  * column: `readStream.text(...)` / socket / MemoryStream all work.
  *
  * Scale note: `classify` is a stateless map (no shuffle);
  * `counters` is a streaming hash-aggregate whose state is |event types|
  * rows; `windowedRate` bounds state with a watermark so late data
  * older than the threshold is dropped and state is evicted — the
  * standard unbounded-source safety contract.
  */
object ProgressStream {

  /** W2 — substring-trigger event extraction (`interface.py:171-178`).
    * The task-done trigger is an OR of two substrings per
    * `interface.py:174`: a month completes either by saving data OR by
    * finding no royalty records at all. */
  def classify(lines: DataFrame): DataFrame =
    lines.withColumn("event",
      when(col("value").contains("Extraindo dados da página"), lit("page_done"))
        .when(col("value").contains("Dados salvos para") ||
          col("value").contains("Nenhum registro de royalties foi extraído"),
          lit("task_done"))
        .when(col("value").contains("[PROGRESSO]"), lit("progress"))
        .otherwise(lit("other")))

  /** W3 — running counters per event type (`interface.py:150-153`);
    * stream with `outputMode("update")` / `"complete"`. */
  def counters(classified: DataFrame): DataFrame =
    classified.groupBy(col("event")).count()

  /** W4 — event-time tumbling rate with watermark-bounded state
    * (`interface.py:185-194` ETA restated as events/minute). The
    * reference has no late-data concept; the 10-minute watermark is the
    * Spark-native default posture for an unbounded source. */
  def windowedRate(classified: DataFrame, tsCol: String): DataFrame =
    classified
      .withWatermark(tsCol, "10 minutes")
      .groupBy(window(col(tsCol), "1 minute"), col("event"))
      .count()
      .select(col("window.start").as("minute"), col("event"), col("count"))

  /** X4 — SLIDING event-time rate (2-minute window every 1 minute):
    * each event feeds 2 overlapping windows, a smoothed rate with no
    * second pass (Spark plans the overlap as a streaming Expand, not a
    * join). State = |open windows| × |event types| rows, bounded
    * because the watermark evicts windows older than the threshold —
    * same unbounded-source safety contract as the tumbling variant.
    * Batch analog: q43. */
  def slidingRate(classified: DataFrame, tsCol: String): DataFrame =
    classified
      .withWatermark(tsCol, "10 minutes")
      .groupBy(window(col(tsCol), "2 minutes", "1 minute"), col("event"))
      .count()
      .select(col("window.start").as("start"), col("event"), col("count"))
}
