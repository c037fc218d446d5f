package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus refresh — the upsert a living training corpus runs every
  * recrawl: a batch of updated documents replaces same-key rows and
  * appends new ones, without a table format's MERGE (no external
  * storage layer in this engine — the operator IS the merge, writable
  * through any sink).
  *
  * Two pieces, composable:
  *   - [[latestByKey]] collapses an update batch that may carry several
  *     versions of one key (multiple recrawls since the last merge) to
  *     the single winning row per key — highest `ordCol` wins, min-key
  *     ties broken deterministically by the same portable
  *     max → filter → min composition as [[Dedup.keepBest]] (never
  *     `max_by`, whose tiebreak is unspecified).
  *   - [[byKey]] applies the (deduplicated) batch: anti-join the corpus
  *     against the update keys, union the updates by name.
  *
  * Scale shape: the anti-join is the q65 incremental-dedup join — at
  * steady state the batch is ≪ the corpus, so AQE broadcasts the
  * distinct update-key set and the corpus is one scan, shuffle-free;
  * against a bucketed corpus store the join is exchange-free (the
  * JoinStrategiesSpec shape). `latestByKey` is two |batch|-sized
  * map-side-combined aggregates. Nothing in either path touches
  * corpus×corpus.
  */
object Upsert {

  /** One row per key: the highest-`ordCol` version, ties to the row
    * with... keys are unique per (key, ord) in a sane ingest; if a
    * batch violates that, the surviving row among equal (key, ord) is
    * the one `rowTieBreak` picks (a column whose min is unique, e.g.
    * an ingest offset). */
  def latestByKey(updates: DataFrame, key: String, ordCol: String,
                  rowTieBreak: String): DataFrame = {
    val best = updates.groupBy(col(key))
      .agg(max(col(ordCol)).as("_best_ord"))
    val winners = updates
      .join(best, updates(key) === best(key) &&
        col(ordCol) === col("_best_ord"))
      .drop(best(key)).drop("_best_ord")
    // among equal (key, ord): deterministic min on the tiebreak column
    val tb = winners.groupBy(col(key))
      .agg(min(col(rowTieBreak)).as("_tb"))
    winners
      .join(tb, winners(key) === tb(key) &&
        col(rowTieBreak) === col("_tb"))
      .drop(tb(key)).drop("_tb")
  }

  /** Updates replace same-key corpus rows; new keys append. `updates`
    * must be one row per key ([[latestByKey]] if it is not) and
    * schema-compatible by name. */
  def byKey(corpus: DataFrame, updates: DataFrame, key: String): DataFrame =
    corpus
      .join(updates.select(col(key)).distinct(), Seq(key), "left_anti")
      .unionByName(updates)
}
