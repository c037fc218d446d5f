package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join — `fact.value ∈ [range.lo, range.hi)` — made
  * shuffle-joinable.
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin
  * (fine for a handful of bands, quadratic death for many). The
  * scalable form buckets both sides by a fixed width: the fact row's
  * value falls in exactly one bucket; each range explodes into the
  * buckets it overlaps; the join becomes an equi-join on bucket id
  * with the exact range predicate as a residual filter. Cost:
  * |fact| + Σ(range spans) join input — linear, shuffle-partitioned,
  * skew governed by bucket width.
  */
object RangeJoin {

  /** Inner join on `lo <= fact(valueCol) < hi`. `width` should be on
    * the order of typical range spans (each range explodes into
    * span/width bucket rows). */
  def bucketedRangeJoin(fact: DataFrame, ranges: DataFrame,
                        valueCol: String, loCol: String, hiCol: String,
                        width: Double): DataFrame = {
    require(width > 0)
    val fb = fact.withColumn("_bucket",
      floor(col(valueCol) / width).cast("long"))
    // hi is exclusive: a range ending exactly on a bucket boundary must
    // not claim the next bucket — nudge below the boundary. Inverted or
    // empty ranges (hi <= lo) must yield ZERO bucket rows: a bare
    // sequence(start, stop) with stop < start DESCENDS and would
    // explode spurious buckets for garbage input.
    val rb = ranges.withColumn("_bucket",
      explode(when(col(hiCol) > col(loCol),
        sequence(
          floor(col(loCol) / width).cast("long"),
          floor((col(hiCol) - lit(width * 1e-9)) / width).cast("long")))
        .otherwise(array().cast("array<long>"))))
    fb.join(rb,
        fb("_bucket") === rb("_bucket") &&
          fb(valueCol) >= rb(loCol) && fb(valueCol) < rb(hiCol))
      .drop("_bucket")
  }

  /** Buckets covered by the half-open interval [lo, hi); empty for
    * degenerate intervals (see the descent note above). */
  private def bucketSeq(lo: org.apache.spark.sql.Column,
                        hi: org.apache.spark.sql.Column,
                        width: Double): org.apache.spark.sql.Column =
    when(hi > lo,
      sequence(
        floor(lo / width).cast("long"),
        floor((hi - lit(width * 1e-9)) / width).cast("long")))
      .otherwise(array().cast("array<long>"))

  /** Interval OVERLAP join — `[aLo, aHi) ∩ [bLo, bHi) ≠ ∅`, the
    * temporal/genomic workhorse. Same bucketing idea as above with both
    * sides exploded, plus a dedup-FREE pair emission: a pair whose
    * intervals share several buckets would match once per shared
    * bucket, so the join keeps only the bucket containing
    * `max(aLo, bLo)` — the first bucket where both intervals are
    * present. That residual predicate replaces a corpus-sized
    * `distinct` shuffle with a per-row comparison.
    *
    * Caller supplies frames with disjoint column names; output is all
    * columns of `a` then `b`. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          aLo: String, aHi: String,
                          bLo: String, bHi: String,
                          width: Double): DataFrame = {
    require(width > 0)
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "interval frames must have disjoint column names")
    val ab = a.withColumn("_bucket_a",
      explode(bucketSeq(col(aLo), col(aHi), width)))
    val bb = b.withColumn("_bucket_b",
      explode(bucketSeq(col(bLo), col(bHi), width)))
    ab.join(bb,
        ab("_bucket_a") === bb("_bucket_b") &&
          ab(aLo) < bb(bHi) && bb(bLo) < ab(aHi) &&
          ab("_bucket_a") ===
            floor(greatest(ab(aLo), bb(bLo)) / width).cast("long"))
      .drop("_bucket_a", "_bucket_b")
  }
}
