package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-parity text canonicalization as a native Catalyst expression.
  *
  * Reference semantics (`normalizar`,
  * `/root/reference/src/scrapers/aracaju_barra_pirambu_scraper.py:37-43`
  * and `pacatuba_scraper.py:34-44`): NFKD-decompose, drop non-ASCII
  * (which strips the combining accents NFKD split off), remove everything
  * but `[a-zA-Z0-9\s]`, lowercase. Non-string input maps to `""` in the
  * reference; here the input is always a string column and NULL stays
  * NULL (nullIntolerant).
  *
  * Implemented as a codegen'd `UnaryExpression` rather than a Scala UDF
  * so it participates in whole-stage codegen: the generated code is a
  * static call into [[NormalizeText.normalize]], keeping the surrounding
  * operators fused. At 100 TB this sits inside the scan's filter stage;
  * a UDF here would break the codegen span around the central predicate.
  */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeText.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {
  private val nonAlnum = "[^a-zA-Z0-9\\s]".r

  /** Static so generated code can call it without capturing `this`. */
  def normalize(s: String): String = {
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val ch = decomposed.charAt(i)
      if (ch < 128) sb.append(ch) // drop accents + any other non-ASCII
      i += 1
    }
    nonAlnum.replaceAllIn(sb.toString, "").toLowerCase
  }

  def apply(c: Column): Column =
    Bridge.column(NormalizeTextExpr(Bridge.expression(c)))
}
