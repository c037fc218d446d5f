package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling + domain mixing for a training-data pipeline.
  *
  * The property both operators must have (and `rand()` does not): the
  * decision for a row is a PURE FUNCTION of its id — stable across runs,
  * engines, partitionings, and re-ingestions, so a carve-out or sample
  * never silently shifts between pipeline runs. Same rationale as the
  * q51 split assignment; here the hash is md5 (bit-identical in every
  * engine, unlike murmur/xxhash) so the sample is oracle-checkable.
  */
object Sampling {

  /** THE digest both sampling operators rank/threshold on — one
    * definition so the sample predicate and the reservoir order can
    * never diverge. Matches DuckDB's `md5(CAST(id AS VARCHAR))`
    * (lowercase hex of the decimal string) for oracle parity. */
  private def md5Hex(id: Column): Column =
    md5(id.cast("string").cast("binary"))

  /** Keep-predicate for an ~`pct`% deterministic sample: compare the
    * md5 hex digest of the id against a hex threshold. Each leading hex
    * digit step is 1/16 of the space, so thresholds compose to within
    * 2⁻¹²⁸ of the target rate: "1a" keeps 26/256 ≈ 10.16%. Stateless,
    * codegen'd, no shuffle — a 100 TB scan samples at wire speed. */
  def md5Keep(id: Column, hexThreshold: String): Column =
    md5Hex(id) < lit(hexThreshold)

  /** Stratified sample accounting: per-stratum total vs sampled counts
    * (one hash-aggregate; map-side combined). */
  def stratifiedCounts(df: DataFrame, idCol: String, stratumCol: String,
                       hexThreshold: String): DataFrame =
    df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_total"),
        sum(when(md5Keep(col(idCol), hexThreshold), 1L).otherwise(0L))
          .as("n_sampled"))

  /** Exact-k deterministic "reservoir" per stratum: rank rows inside
    * each stratum by the md5 of their id (a pseudorandom but pure and
    * engine-portable order) and keep the first k. Unlike a true
    * streaming reservoir the result is independent of encounter order —
    * rerunning over re-partitioned, re-sorted, or incrementally-grown
    * data keeps the SAME sample for the ids already present (rows only
    * enter/leave when ids do). Window partitioned by the stratum key —
    * thousands of independent partitions, never a whole-table sort. */
  def reservoirPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                          k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5Hex(col(idCol)), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Greedy token-budget corpus selection — "fill a fixed training
    * budget with the best-scoring documents". All docs in score groups
    * that fit wholly above the budget line are kept; the boundary
    * group is filled in md5-rank order until the budget is exhausted.
    *
    * Scale design: the budget cumulative runs over the per-score
    * AGGREGATE (|distinct scores| rows), never the corpus — and as a
    * TWO-LEVEL cumulative sum, so no single-partition window ever
    * sees the per-score frame: scores group into coarse buckets
    * (floor(score/4096) — monotone, so bucket-desc ordering agrees
    * with score-desc), the within-bucket cumulative runs under an
    * exchange-partitioned window, and only the |buckets|-row bucket
    * totals pay a global-order window (|S|/4096 rows — at a billion
    * distinct quantized scores, a quarter-million-row tail). The r19
    * location of this comment ran ONE unpartitioned window over the
    * whole per-score aggregate, which is |corpus|-sized in one
    * partition when an upstream forgets the quantize-first contract.
    * The fill window partitions by score. `scoreCol` must be
    * integer-valued (quantize a float score upstream) — it is both
    * the ordering and the partition key, so its cardinality controls
    * boundary-group size and skew.
    *
    * Selection rule (greedy prefix): a doc is kept iff the token mass
    * strictly before it — higher score groups wholly, same-group
    * md5-predecessors — totals < `budget`; the selection overshoots by
    * at most one document. Pure function of (id, score, tokens) —
    * stable across runs and engines. */
  def selectToTokenBudget(docs: DataFrame, idCol: String,
                          scoreCol: String, tokensCol: String,
                          budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = docs.groupBy(col(scoreCol))
      .agg(sum(col(tokensCol)).as("grp_tokens"))
      // floor division (not `div`, which truncates toward zero and
      // would fold negative scores into bucket 0): monotone in score,
      // exact for |score| < 2^52 — far past any quantized-score range
      .withColumn("_bkt",
        floor(col(scoreCol).cast("double") / lit(4096.0)).cast("long"))
    val perBucket = perScore.groupBy(col("_bkt"))
      .agg(sum(col("grp_tokens")).as("_bkt_tokens"))
    val wB = Window.orderBy(col("_bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bktCum = perBucket
      .withColumn("_bkt_before",
        coalesce(sum(col("_bkt_tokens")).over(wB), lit(0L)))
      .select(col("_bkt"), col("_bkt_before"))
    val wIn = Window.partitionBy(col("_bkt"))
      .orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // cum_before(score) = Σ tokens of strictly-greater scores
    //   = Σ over strictly-greater buckets (the tiny global tail)
    //   + Σ over strictly-greater scores in the SAME bucket
    // — exact long sums regrouped associatively, identical to the
    // one-window form value for value
    val cum = perScore
      .withColumn("_in_before",
        coalesce(sum(col("grp_tokens")).over(wIn), lit(0L)))
      .join(bktCum, Seq("_bkt"))
      .withColumn("cum_before", col("_bkt_before") + col("_in_before"))
      .filter(col("cum_before") < budget)
      .select(col(scoreCol), col("cum_before"))
    val wG = Window.partitionBy(col(scoreCol))
      .orderBy(md5Hex(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.join(broadcast(cum), Seq(scoreCol))
      .withColumn("_run", sum(col(tokensCol)).over(wG))
      .filter(col("cum_before") + col("_run") - col(tokensCol) <
        budget)
      .select(col(idCol), col(scoreCol), col(tokensCol))
  }

  /** Temperature-flattened mixture resampling (the pretraining-mixture
    * pass, τ = 2): per-source keep counts ∝ √c_s — flattening a
    * head-heavy source distribution toward the tail, the standard
    * knob for "don't let the biggest crawl dominate the mixture".
    *
    * Determinism: √ is IEEE-exact, but a SUM of square roots is
    * addend-order-dependent — so each √c_s is quantized to 1e-7 fixed
    * point first (the spelled-rounding convention) and the allocation
    * is floor((targetTotal · w_fp) / Σw_fp) over exact integers and
    * one correctly-rounded double division, identical in both engines.
    * Selection within a source is the md5-ranked reservoir (same
    * contract as [[reservoirPerStratum]]: stable under repartitioning
    * and corpus growth). Caps at the source's own size.
    *
    * Scale: one |sources|-row aggregate, a broadcast allocation join,
    * and a per-source ranking window — no global sort, no skew beyond
    * the source key itself. */
  def temperatureMixSqrt(docs: DataFrame, idCol: String,
                         sourceCol: String,
                         targetTotal: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_total"))
      .withColumn("w_fp",
        floor(sqrt(col("n_total").cast("double")) * lit(1e7) + lit(0.5))
          .cast("long"))
    val tot = per.agg(sum(col("w_fp")).as("w_sum"))
    // w_fp is cast to double BEFORE the multiply: a Long product wraps
    // silently (ANSI off) at design-scale inputs (1e6-doc source ×
    // 1e9-doc target ⇒ 1e19 > Long.MaxValue → negative n_keep →
    // silently empty output); the double product is correctly rounded
    // and spelled the same way in the oracle
    val alloc = per.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        least(col("n_total"),
          floor(col("w_fp").cast("double") * lit(targetTotal.toDouble) /
            col("w_sum").cast("double")).cast("long")).as("n_keep"))
    val wG = Window.partitionBy(col(sourceCol))
      .orderBy(md5Hex(col(idCol)), col(idCol))
    docs.join(broadcast(alloc), Seq(sourceCol))
      .withColumn("_rn", row_number().over(wG))
      .filter(col("_rn") <= col("n_keep"))
      .drop("_rn", "n_keep")
  }

  /** Epoch-repeat mixing — the UP-sampling counterpart to the
    * down-sampling mixers above: when the token target exceeds a
    * source's corpus, the source is repeated whole (epochs) up to
    * `maxEpochs` (the "don't over-repeat small high-quality sources"
    * cap), and the fractional remainder is filled by an md5-ranked
    * greedy prefix of its documents (same stability contract as
    * [[reservoirPerStratum]]: pure function of ids, stable under
    * repartitioning and corpus growth).
    *
    * Allocation: each source gets an equal integer share
    * `targetTokens div n_sources`; epochs = min(maxEpochs,
    * share div c_tokens); the remainder fills only BELOW the cap (at
    * the cap the budget is forfeit — that is the cap's meaning). The
    * fill keeps a doc iff the token mass strictly before it is under
    * the remainder (the [[selectToTokenBudget]] overshoot-by-≤1 rule).
    * All-integer arithmetic end to end.
    *
    * Output per source: (source, n_docs, c_tokens, epochs, fill_docs,
    * fill_tokens, total_tokens). Scale: one |sources|-row aggregate,
    * broadcast allocation join, per-source ranking window — no global
    * sort; the corpus is scanned once. */
  def epochMix(docs: DataFrame, idCol: String, sourceCol: String,
               tokensCol: String, targetTokens: Long,
               maxEpochs: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("c_tokens"))
    val nSrc = per.agg(count(lit(1)).as("n_sources"))
    val alloc = per.crossJoin(broadcast(nSrc))
      .withColumn("t_share", expr(s"${targetTokens}L div n_sources"))
      .withColumn("epochs",
        least(lit(maxEpochs.toLong), expr("t_share div c_tokens")))
      .withColumn("leftover", when(col("epochs") < maxEpochs,
        col("t_share") - col("epochs") * col("c_tokens"))
        .otherwise(lit(0L)))
    val wG = Window.partitionBy(col(sourceCol))
      .orderBy(md5Hex(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val fill = docs
      .join(broadcast(alloc.select(col(sourceCol), col("leftover"))),
        Seq(sourceCol))
      .withColumn("_run", sum(col(tokensCol)).over(wG))
      .filter(col("_run") - col(tokensCol) < col("leftover"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("fill_docs"),
        sum(col(tokensCol)).as("fill_tokens"))
    alloc.join(fill, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"), col("c_tokens"),
        col("epochs"),
        coalesce(col("fill_docs"), lit(0L)).as("fill_docs"),
        coalesce(col("fill_tokens"), lit(0L)).as("fill_tokens"),
        (col("epochs") * col("c_tokens") +
          coalesce(col("fill_tokens"), lit(0L))).as("total_tokens"))
  }

  /** Domain-mixing weights: per-domain token mass scaled by a sampling
    * weight, normalized to the final mixture fraction each domain
    * contributes to the training stream.
    *
    * Aggregates the corpus to |domains| rows FIRST (one map-side-combined
    * shuffle), then joins the 1-row grand total back via broadcast — no
    * global window over unaggregated data, no single-partition stage on
    * the corpus-sized frame. */
  def domainMix(docs: DataFrame, domainCol: String, tokenCount: Column,
                weight: Column): DataFrame = {
    val perDomain = docs
      .groupBy(col(domainCol))
      .agg(sum(tokenCount).as("tokens"))
      .withColumn("weight", weight)
      .withColumn("effective", col("tokens") * col("weight"))
    val total = perDomain.agg(sum(col("effective")).as("total_eff"))
    perDomain.crossJoin(broadcast(total))
      .select(col(domainCol), col("tokens"), col("weight"),
        round(col("effective") / col("total_eff"), 6).as("mix_frac"))
  }
}
