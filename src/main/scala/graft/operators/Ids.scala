package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Caching.cached

/** Deterministic dense row ids — the "number every example" step a
  * training pipeline needs for sharding, example addressing, and
  * reproducible shuffles. Spark's `monotonically_increasing_id` is
  * neither dense nor stable across runs (it encodes the physical
  * partition), and the naive fix — `row_number()` over a global
  * ORDER BY — funnels the corpus through ONE task at 100 TB.
  *
  * [[contiguousIds]] is the classic two-pass shape instead:
  * range-partition by the (total) ordering, count rows per partition
  * (a |partitions|-row aggregate), prefix-sum those counts into
  * per-partition offsets (a window over the TINY counts frame),
  * broadcast the offsets back, and number within each partition with
  * a per-partition window. Every corpus-sized step is partition-local;
  * the only global object is the |partitions|-row offset table.
  *
  * The ordering column list MUST be a total order (include a unique
  * tiebreak — ids under a tie are otherwise partition-placement
  * noise). Output ids are 0-based, dense, and equal to
  * `row_number() OVER (ORDER BY cols) − 1` — the oracle-checkable
  * contract (q116).
  *
  * EAGER: the offsets pass (and its consecutiveness guard) runs at
  * call time, so calling this materializes the input once — callers
  * composing lazy plans should place it where that first pass is
  * acceptable. */
object Ids {

  def contiguousIds(df: DataFrame, idName: String,
                    orderCols: Column*): DataFrame = {
    require(orderCols.nonEmpty, "contiguousIds needs an ordering")
    // the local row index comes from monotonically_increasing_id over
    // the range-partitioned, partition-sorted frame — NOT from a
    // Window.partitionBy(_pid): RangePartitioning(orderCols) does not
    // satisfy the window's ClusteredDistribution(_pid), so the planner
    // would insert a second corpus-wide hash exchange + sort behind
    // the one this design exists to avoid. mid is per-partition
    // monotonic over the sorted rows; (mid − per-partition min) is
    // the dense local index without any further shuffle. The frame is
    // cached so both consumers see ONE mid assignment; eviction
    // recompute is safe because the sort makes re-evaluation
    // deterministic.
    val ranged = cached(df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mid", monotonically_increasing_id()))
    // |partitions|-row aggregate (map-side: one row per partition) +
    // a window over that tiny frame — the only global-order object.
    // The per-partition (max − min == n − 1) check pins the
    // within-partition-CONSECUTIVE property of mid that the dense ids
    // arithmetically depend on: Spark's API contract only promises
    // monotonic-and-unique, so a future counter change (striding,
    // reservation) must fail HERE, loudly, instead of silently
    // emitting sparse or colliding ids. The frame is partitions-sized,
    // so collecting it for the guard costs nothing.
    val perPart = ranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"), min(col("_mid")).as("_minmid"),
        max(col("_mid")).as("_maxmid"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect()
    perPart.foreach { r =>
      val n = r.getAs[Long]("_n")
      val span = r.getAs[Long]("_maxmid") - r.getAs[Long]("_minmid")
      require(span == n - 1,
        s"monotonically_increasing_id is no longer consecutive within " +
          s"a partition (span $span over $n rows in partition " +
          s"${r.getAs[Int]("_pid")}) — contiguousIds' arithmetic " +
          "depends on it; rework the local index derivation")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = perPart.toSeq
      .map(r => (r.getAs[Int]("_pid"), r.getAs[Long]("_offset"),
        r.getAs[Long]("_minmid")))
      .toDF("_pid", "_offset", "_minmid")
    ranged.join(broadcast(offsets), Seq("_pid"))
      .withColumn(idName,
        col("_offset") + (col("_mid") - col("_minmid")))
      .drop("_pid", "_offset", "_minmid", "_mid")
  }
}
