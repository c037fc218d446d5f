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

  /** Corpus version diff — what changed between two snapshots of a
    * living corpus, by key and content signature: `added` (key only in
    * `newer`), `removed` (only in `older`), `modified` (both, signature
    * differs), `unchanged`. The audit every recrawl merge wants BEFORE
    * applying [[byKey]] — and the anti-entropy check after.
    *
    * One full-outer equi-join on the key carrying only (key, 32-byte
    * signature) — at 100 TB both projections are narrow scans and the
    * join co-locates on a bucketed store; nothing corpus×corpus.
    * Null-safe on the key (a NULL-key row is one logical key, as
    * everywhere in this engine) and on the signature (two NULL
    * signatures compare equal → `unchanged`). Precondition: one row
    * per key per snapshot ([[latestByKey]] first if not).
    *
    * Returns one row per key in either snapshot: (key, status). */
  def diffByKey(older: DataFrame, newer: DataFrame, key: String,
                sigCol: String): DataFrame = {
    val o = older.select(col(key).as("_ok"), col(sigCol).as("_os"),
      lit(true).as("_in_old"))
    val n = newer.select(col(key).as("_nk"), col(sigCol).as("_ns"),
      lit(true).as("_in_new"))
    o.join(n, col("_ok") <=> col("_nk"), "full_outer")
      .select(coalesce(col("_ok"), col("_nk")).as(key),
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(col("_os") <=> col("_ns"), lit("unchanged"))
          .otherwise(lit("modified")).as("status"))
  }

  /** Deterministic BATCH REPLAY of the streaming watermark upsert
    * ([[graft.streaming.StreamingUpsert.latestByKeyWithinWatermark]])
    * over an explicitly waved event sequence — the bridge that puts the
    * streaming semantics under a SQL oracle: every streaming-only rule
    * is restated relationally.
    *
    *   - `waveCol` plays the micro-batch: the watermark in force while
    *     wave w processes is max(event time over waves < w) − delay
    *     (Spark advances the watermark at batch END from all observed
    *     event times), NULL (no filtering) for the first wave.
    *   - admission: a row is DROPPED iff its event time is AT OR
    *     below that watermark (strict `>` keeps) — Spark's late-row
    *     filter drops watermark-EQUAL rows, pinned empirically by the
    *     boundary spec; a `>=` here silently diverged on exactly that
    *     hairline.
    *   - winner per key among admitted rows: exactly [[latestByKey]]
    *     (the streaming `better` fold agrees with it by construction;
    *     event-time and wave columns are excluded from the payload
    *     first, so a row re-delivered across waves collapses instead
    *     of fanning out — the streaming re-delivery rule).
    *   - `evicted`: whether the streaming operator would have EMITTED
    *     the key by end-of-input — its timeout timestamp
    *     (max admitted event time + delay + 1, mirroring
    *     `setTimeoutTimestamp`) lies strictly below the final
    *     watermark. Un-evicted keys are rows still sitting in state.
    *
    * Precondition (documented, not checked): no key re-appears after
    * its window closed — the replay merges all of a key's admitted
    * rows into ONE window, where the streaming operator would open a
    * fresh one (that path is spec-covered separately).
    *
    * Scale shape: the wave/watermark frames are |waves|-sized (the
    * single-partition running-max window is over waves, not rows); the
    * row-level work is one join against that tiny frame, the
    * [[latestByKey]] aggregates, and one broadcast of the 1-row final
    * watermark. `tsMsCol` must be epoch-millis LONG. */
  def latestByKeyWavedReplay(updates: DataFrame, key: String,
                             ordCol: String, rowTieBreak: String,
                             tsMsCol: String, delayMs: Long,
                             waveCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.engine.Caching.cached
    val u = cached(updates)
    val waveMax = u.groupBy(col(waveCol).as("_w"))
      .agg(max(col(tsMsCol)).as("_wmax"))
    val wm = waveMax.withColumn("_wm",
      max(col("_wmax")).over(
        Window.orderBy(col("_w"))
          .rowsBetween(Window.unboundedPreceding, -1)) - delayMs)
    val admitted = cached(u
      .join(wm.select(col("_w"), col("_wm")), col(waveCol) === col("_w"))
      .filter(col("_wm").isNull || col(tsMsCol) > col("_wm")))
    // watermark tracking observes every row (even ones later dropped
    // as late), so the final watermark derives from ALL of u
    val finalWm = u.agg((max(col(tsMsCol)) - delayMs).as("_finwm"))
    val maxTs = admitted.groupBy(col(key).as("_ek"))
      .agg(max(col(tsMsCol)).as("_maxts"))
    latestByKey(admitted.drop(tsMsCol, waveCol, "_w", "_wm"),
        key, ordCol, rowTieBreak)
      .join(maxTs, col(key) <=> col("_ek"))
      .crossJoin(broadcast(finalWm))
      .withColumn("evicted",
        col("_maxts") + lit(delayMs) + lit(1L) < col("_finwm"))
      .drop("_ek", "_maxts", "_finwm")
  }
}
