package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X2 — vector math over `array<float>` embedding columns, built entirely
  * from codegen'd higher-order functions (`transform`/`zip_with`/
  * `aggregate`) — no UDFs, so the expressions stay inside whole-stage
  * codegen and the scan's column pruning still sees exactly one array
  * column read.
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
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (IVF assignment metric). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Unit-normalize given an ALREADY-MATERIALIZED norm column (alias
    * `norm(v)` into its own projection first — embedding it here would
    * re-evaluate the fold once per element, the HOF-duplication trap). */
  def unitNormalizeWith(a: Column, normCol: Column): Column =
    transform(a, x => x / normCol)
}
