package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector kernels (§2.10 custom-expression tier).
  *
  * The HOF form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * semantically right but evaluates through Catalyst's interpreted
  * higher-order-function machinery — one closure dispatch per element,
  * and the surrounding operator loses its whole-stage-codegen span.
  * These expressions generate a tight primitive loop instead, keeping
  * the dot product inside the fused stage. Semantics are EXACTLY the
  * HOF fold's (and DuckDB's list math, which the oracles compare
  * against): left-to-right double accumulation, a NULL element poisons
  * the result to NULL, and mismatched lengths yield NULL (zip_with
  * pads with NULL, which poisons the sum).
  */
abstract class VectorFoldExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // ALWAYS nullable: the fold returns NULL on length mismatch or a
  // NULL element even when both input columns are non-nullable. The
  // inherited child-OR nullability lied in that case, and the lie was
  // load-bearing: for non-nullable inputs Spark allocates no isNull
  // variable (FalseLiteral), so the generated `ev.isNull = true`
  // assigned to a non-variable, janino failed, and the whole fused
  // stage silently fell back to interpreted eval — on exactly the
  // similarity hot paths this kernel exists to keep in codegen.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got ($l, $r)")
    }

  /** Per-element contribution in generated code; `x`/`y` are double
    * terms already loaded from the arrays. */
  protected def combine(x: String, y: String): String
  protected def combineEval(x: Double, y: Double): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += combineEval(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${combine(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ — the similarity-search hot-path kernel (q13/q30/q31/q48). */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorFoldExpr {
  override protected def combine(x: String, y: String): String = s"$x * $y"
  override protected def combineEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Σ (xᵢ−yᵢ)² — the IVF centroid-assignment metric (q31). */
case class SqDistExpr(left: Expression, right: Expression)
    extends VectorFoldExpr {
  override protected def combine(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def combineEval(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_sqdist"
}
