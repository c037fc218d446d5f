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
  * update-key projection and the corpus is one scan; against a
  * bucketed corpus store the join is exchange-free (the
  * JoinStrategiesSpec shape). Everything in `latestByKey` (a dedup
  * distinct, two map-side-combined aggregates, two key joins) is
  * |batch|-sized, with the multi-consumer frames cached per the
  * engine's cache-ownership convention. Nothing in either path
  * touches corpus×corpus.
  */
object Upsert {

  /** One row per key: the highest-`ordCol` version wins; among equal
    * (key, ord) rows the deterministic MIN of `rowTieBreak` wins (pick
    * a column that uniquely ranks rows within (key, ord) — an ingest
    * offset, a content digest). Full-row duplicates (the retry /
    * double-delivery case) are collapsed up front, so re-delivered
    * rows can never fan the output out. NULL-safe throughout — for the
    * version column (a key whose versions are all NULL still survives:
    * `max`/`min` skip NULLs, so the winner matches use `<=>` rather
    * than dropping the key) AND for the key itself (every key join is
    * `<=>`, so NULL-key rows — one group, as in GROUP BY — rank and
    * collapse like any other key instead of silently vanishing at the
    * first null-unsafe join). */
  def latestByKey(updates: DataFrame, key: String, ordCol: String,
                  rowTieBreak: String): DataFrame = {
    import graft.engine.Caching.cached
    // cached: feeds the ranking aggregate AND the winner join (and its
    // own lineage may be an expensive multi-wave union)
    val u = cached(updates.distinct())
    // groupBy already treats NULL keys as one group; the joins back
    // must match them null-safely or NULL-key rows drop here
    val best = u.groupBy(col(key)).agg(max(col(ordCol)).as("_best_ord"))
      .withColumnRenamed(key, "_bk")
    // cached: feeds the tiebreak aggregate AND the final join
    val winners = cached(u.join(best, col(key) <=> col("_bk"))
      .filter(col(ordCol) <=> col("_best_ord"))
      .drop("_bk", "_best_ord"))
    val tb = winners.groupBy(col(key))
      .agg(min(col(rowTieBreak)).as("_tb"))
      .withColumnRenamed(key, "_tk")
    winners.join(tb, col(key) <=> col("_tk"))
      .filter(col(rowTieBreak) <=> col("_tb"))
      .drop("_tk", "_tb")
  }

  /** Updates replace same-key corpus rows; new keys append. `updates`
    * must be one row per key ([[latestByKey]] if it is not) and
    * schema-compatible by name. No distinct on the anti-join side:
    * left-anti is an existence check, and under the one-row-per-key
    * contract the key projection is already duplicate-free. The
    * anti-join is null-safe: a NULL-key update REPLACES a NULL-key
    * corpus row (one logical key, same as `latestByKey`'s grouping)
    * instead of duplicating it. */
  def byKey(corpus: DataFrame, updates: DataFrame, key: String): DataFrame =
    corpus
      .join(updates.select(col(key).as("_uk")),
        col(key) <=> col("_uk"), "left_anti")
      .unionByName(updates)
}
