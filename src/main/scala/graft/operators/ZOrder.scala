package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write clustering — multi-key data skipping
  * for the lakehouse layout: a single-key sort makes file/row-group
  * min-max statistics selective on ONE column and useless on every
  * other; interleaving the bits of two keys and sorting on the result
  * clusters files into quad-tree cells, so range predicates on EITHER
  * key skip most files.
  *
  * The interleave is a chain of shiftright/and/shiftleft built-ins —
  * 2·bits codegen'd expressions, the same unrolled-literal style as
  * the SimHash fingerprint. Inputs must be bucketized to non-negative
  * ints < 2^bits first ([[bucketize]] for the linear case; use a rank
  * for skewed domains).
  */
object ZOrder {

  /** Scale a numeric column linearly onto [0, 2^bits). Callers supply
    * the domain (known or from a stats pass); values outside clamp. */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = 1 << bits
    least(lit(buckets - 1), greatest(lit(0),
      floor((c - lit(lo)) / lit(hi - lo) * buckets).cast("int")))
  }

  /** Morton code: interleave the low `bits` bits of two bucket ids
    * (x gets the even bit positions, y the odd). */
  def mortonCode(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i)
      val yb = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Write `df` parquet z-ordered on (xCol, yCol): range-partition by
    * the Morton code (one file per range), sort inside each partition,
    * drop the helper column. Downstream scans filtering on either
    * column skip files via their min-max footer statistics. */
  def writeZOrdered(df: DataFrame, path: String,
                    xBucket: Column, yBucket: Column,
                    bits: Int, nFiles: Int): Unit =
    df.withColumn("_z", mortonCode(xBucket, yBucket, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").format("parquet").save(path)
}
