package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark lacks natively, composed
  * from existing operators per the custom-operator preference order
  * (compose > custom expression > custom SparkPlan): for each left row,
  * attach the LATEST right row with `right.ts <= left.ts` on the same
  * key.
  *
  * Implementation: tag and union both sides, then one window per key
  * ordered by (ts, tag) carrying the last non-null right payload
  * forward (`last(..., ignoreNulls)`), keep left rows. Cost: a single
  * sort-within-key-partition — the same shuffle a sort-merge join would
  * pay, with NO range-explosion (a naive `ts_r <= ts_l` theta-join
  * produces O(|L|·|R|) per key before aggregation). This is the
  * standard scalable as-of shape; at 100 TB the window partitions by
  * key (users), which is high-cardinality and skew-safe.
  *
  * Right rows sort BEFORE left rows at equal ts (tag 0 < 1), making the
  * match inclusive (`>=`), same as DuckDB/kdb as-of semantics.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to carry (renamed as given)
    * @return left rows + carried right payload (NULL when no prior
    *         right row exists — left-join semantics) */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String,
               payloadCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // right side: key, ts, tag=0, payload under target names, left cols null
    val rightNorm = right.select(
      (Seq(col(keyCol), col(rightTs).as("_ts"), lit(0).as("_tag")) ++
        payloadCols.map { case (src, dst) => col(src).as(dst) } ++
        leftCols.filterNot(_ == keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // left side: key, ts, tag=1, payload nulls, own columns
    val leftNorm = left.select(
      (Seq(col(keyCol), col(leftTs).as("_ts"), lit(1).as("_tag")) ++
        payloadCols.map { case (src, dst) =>
          lit(null).cast(right.schema(src).dataType).as(dst) } ++
        leftCols.filterNot(_ == keyCol).map(col)): _*)

    val w = Window.partitionBy(keyCol).orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.values.toSeq.foldLeft(
        rightNorm.unionByName(leftNorm)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1)
      .select((leftCols.map(col) ++ payloadCols.values.toSeq.map(col)): _*)
  }
}
