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
  * contract (q116). */
object Ids {

  def contiguousIds(df: DataFrame, idName: String,
                    orderCols: Column*): DataFrame = {
    require(orderCols.nonEmpty, "contiguousIds needs an ordering")
    // cached: the ranged frame feeds the per-partition counts AND the
    // final numbering join; left lazy the full range-shuffle runs twice
    val ranged = cached(df.repartitionByRange(orderCols: _*)
      .withColumn("_pid", spark_partition_id()))
    val offsets = ranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_offset"))
    val w = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
    ranged.join(broadcast(offsets), Seq("_pid"))
      .withColumn(idName,
        col("_offset") + row_number().over(w) - lit(1))
      .drop("_pid", "_offset")
  }
}
