package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** X2 — vector math over `array<float>` embedding columns. The fold
  * kernels (dot, squared distance) are native codegen'd expressions
  * ([[VectorExprs]]) — a tight primitive loop inside the fused stage,
  * not Catalyst's interpreted HOF machinery; `transform` HOFs remain
  * only where the OUTPUT is an array (`toDouble`, unit-normalize).
  * No UDFs anywhere, so the scan's column pruning still sees exactly
  * one array column read.
  *
  * All math is done in double with a sequential left-to-right fold —
  * the same accumulation order DuckDB's list functions use, so oracle
  * comparisons agree to the last ulp (outputs are still rounded in
  * query surfaces for safety).
  */
object VectorFns {

  /** array<float> → array<double>; do this once per side before math. */
  def toDouble(c: Column): Column = transform(c, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (IVF assignment metric). */
  def sqDist(a: Column, b: Column): Column =
    Bridge.column(SqDistExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Unit-normalize given an ALREADY-MATERIALIZED norm column (alias
    * `norm(v)` into its own projection first — embedding it here would
    * re-evaluate the fold once per element, the HOF-duplication trap). */
  def unitNormalizeWith(a: Column, normCol: Column): Column =
    transform(a, x => x / normCol)
}
