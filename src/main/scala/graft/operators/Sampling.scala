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
