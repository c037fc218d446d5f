package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** P3 as a native codegen'd expression: one character pass instead of
  * the three regexp_replace passes of the built-in chain
  * (`TextFns.parseBRLBuiltin`) — each regex pass allocates an
  * intermediate string and re-scans the value; this does neither.
  *
  * Semantics are EXACTLY the chain's, in its order: trim spaces →
  * drop every `R$` + following whitespace → drop every `.` (thousands
  * separator) → `,`→`.` → parse as DECIMAL(18,2) with
  * coerce-to-NULL (the `pd.to_numeric(errors='coerce')` contract,
  * `data_science.ipynb` cell 2). The final parse delegates to Spark's
  * own `Decimal.fromString` + `changePrecision`, so the accepted
  * number grammar and the HALF_UP scale-2 rounding are bit-identical
  * to `try_cast(… AS DECIMAL(18,2))`. Cross-validated against the
  * chain property-style in ParseBRLSpec and against DuckDB via q03/q18.
  */
case class ParseBRLExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(18, 2)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ParseBRL.parse(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("brl")
      s"""
         |org.apache.spark.sql.types.Decimal $tmp =
         |  graft.functions.ParseBRL.parse($c.toString());
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ParseBRLExpr =
    copy(child = newChild)

  override def prettyName: String = "parse_brl"
}

object ParseBRL {
  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Static for codegen. Returns null on any parse failure (coerce). */
  def parse(raw: String): org.apache.spark.sql.types.Decimal = {
    // trim (the chain's trim() strips spaces)
    var start = 0
    var end = raw.length
    while (start < end && raw.charAt(start) == ' ') start += 1
    while (end > start && raw.charAt(end - 1) == ' ') end -= 1

    val sb = new java.lang.StringBuilder(end - start)
    var i = start
    while (i < end) {
      val ch = raw.charAt(i)
      if (ch == 'R' && i + 1 < end && raw.charAt(i + 1) == '$') {
        i += 2                                  // drop "R$"
        while (i < end && isAsciiSpace(raw.charAt(i))) i += 1 // + \s*
      } else {
        if (ch == ',') sb.append('.')
        else if (ch != '.') sb.append(ch)       // '.' dropped, rest kept
        i += 1
      }
    }
    val d = org.apache.spark.sql.types.Decimal.fromString(
      UTF8String.fromString(sb.toString))
    if (d == null) null
    else if (d.changePrecision(18, 2)) d
    else null
  }

  def apply(c: Column): Column =
    Bridge.column(ParseBRLExpr(Bridge.expression(c)))
}
