package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join (backward and forward) — an operator Spark lacks
  * natively, composed from existing operators per the preference order
  * (compose > custom expression > custom SparkPlan): for each left row,
  * attach the LATEST right row with `right.ts <= left.ts` on the same
  * key.
  *
  * Implementation: tag and union both sides, then one window per key
  * ordered by (ts, tag, payload) carrying the last non-null right
  * payload forward (`last(..., ignoreNulls)`), keep left rows. Cost: a
  * single sort-within-key-partition — the same shuffle a sort-merge
  * join would pay, with NO range-explosion (a naive `ts_r <= ts_l`
  * theta-join produces O(|L|·|R|) per key before aggregation). This is
  * the standard scalable as-of shape; at 100 TB the window partitions
  * by key (users), which is high-cardinality and skew-safe.
  *
  * Row-atomicity: ALL payload columns travel in ONE struct through a
  * single `last(ignoreNulls)` — per-column carries would mix values
  * from *different* right rows whenever the latest match holds NULLs
  * in some payload columns.
  *
  * Tiebreaks: right rows sort BEFORE left rows at equal ts (tag 0 < 1),
  * making the match inclusive (`>=`, same as DuckDB/kdb as-of
  * semantics); among several right rows at the SAME (key, ts) the
  * greatest payload tuple wins — a total, data-determined order, so
  * the result is reproducible across runs and partitionings (a
  * monotonic row-id tiebreak would be stable within a run only).
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to carry (renamed as given)
    * @return left rows + carried right payload (NULL when no prior
    *         right row exists — left-join semantics) */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String,
               payloadCols: Map[String, String]): DataFrame =
    asof(left, right, keyCol, leftTs, rightTs, payloadCols,
      forward = false)

  /** Forward as-of: the EARLIEST right row at-or-after each left row's
    * timestamp (DuckDB `ASOF JOIN ... ON l.ts <= r.ts`). Same plan as
    * [[backward]] on a reversed time axis — the window sorts `_ts`
    * descending, so "last right row seen" is the nearest future one. */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
              leftTs: String, rightTs: String,
              payloadCols: Map[String, String]): DataFrame =
    asof(left, right, keyCol, leftTs, rightTs, payloadCols,
      forward = true)

  private def asof(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   payloadCols: Map[String, String],
                   forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = StructType(payloadCols.toSeq.map { case (src, dst) =>
      StructField(dst, right.schema(src).dataType, nullable = true) })
    // right side: key, ts, tag=0, payload packed in one struct, left cols null
    val rightNorm = right.select(
      (Seq(col(keyCol), col(rightTs).as("_ts"), lit(0).as("_tag"),
        struct(payloadCols.toSeq.map { case (src, dst) =>
          col(src).as(dst) }: _*).as("_payload")) ++
        leftCols.filterNot(_ == keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // left side: key, ts, tag=1, payload null, own columns
    val leftNorm = left.select(
      (Seq(col(keyCol), col(leftTs).as("_ts"), lit(1).as("_tag"),
        lit(null).cast(payloadType).as("_payload")) ++
        leftCols.filterNot(_ == keyCol).map(col)): _*)

    // _payload in the sort order only disambiguates equal-(ts, tag)
    // right rows; left rows all have a NULL payload there. Forward
    // direction = the same carry on a reversed time axis (_ts desc);
    // _tag stays ascending so rights still sort before lefts at equal
    // ts, keeping the match inclusive in both directions.
    val tsOrder = if (forward) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(keyCol)
      .orderBy(tsOrder, col("_tag"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightNorm.unionByName(leftNorm)
      .withColumn("_carry", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select((leftCols.map(col) ++
        payloadCols.values.toSeq.map(d => col(s"_carry.$d").as(d))): _*)
  }
}
