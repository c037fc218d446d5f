package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Embedding quantization — the storage/IO op a 100 TB embedding
  * store actually runs: symmetric per-vector int8 (scale =
  * max|x|/127, q = round(x/scale)), shrinking an `array<float>`
  * column ~4× (and ~8× vs array<double>) so ANN scans read a quarter
  * of the bytes. Cosine is SCALE-INVARIANT, so similarity search runs
  * directly on the quantized integers — no dequantization pass — with
  * a small, bounded angular error (spec'd).
  *
  * Engine-replicable by construction: rounding is
  * `floor(x/scale + 0.5)` (identical semantics in Spark and DuckDB —
  * built-in `round` half-up/half-even conventions differ between
  * engines, so the query spells the rounding out), and the quantized
  * values are exact small integers, so the DuckDB oracle reproduces
  * the full quantize → cosine → top-k pipeline bit-for-bit (q89).
  *
  * All expressions are built-in HOFs/arithmetic — codegen-friendly,
  * no UDF, no shuffle added by quantization itself (one narrow map).
  */
object Quantize {

  /** Per-vector symmetric scale: max|xᵢ| / 127 (0.0 for an all-zero
    * vector — see [[int8]]). */
  def scaleOf(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / lit(127.0)

  /** Quantize an `array<double>` to int8 codes. An all-zero vector
    * (scale 0) quantizes to all-zero codes rather than dividing by
    * zero; every other component lands in [-127, 127] by the scale's
    * construction. */
  def int8(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0.toByte)))
      .otherwise(transform(v,
        x => floor(x / scale + lit(0.5)).cast("tinyint")))

  /** Reconstruct doubles from codes (for consumers that need
    * magnitudes, not just angles). */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Attach (`<out>_scale`, `<out>` int8 codes) for `vecCol`. */
  def quantized(df: DataFrame, vecCol: String, out: String): DataFrame = {
    val vd = VectorFns.toDouble(col(vecCol))
    df.withColumn(s"${out}_scale", scaleOf(vd))
      .withColumn(out, int8(vd, col(s"${out}_scale")))
  }

  /** Cosine directly on int8 codes (scale cancels): the quantized
    * similarity kernel — the scan reads a quarter of the bytes and
    * the arithmetic stays on exact small integers until the final
    * norm division. */
  def cosineCodes(a: Column, b: Column): Column =
    VectorFns.cosine(VectorFns.toDouble(a), VectorFns.toDouble(b))
}
