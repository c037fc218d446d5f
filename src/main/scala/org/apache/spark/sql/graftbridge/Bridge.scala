package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 wraps `Column` around `ColumnNode` rather than a Catalyst
  * `Expression`; the converter (`classic.ExpressionUtils`) is
  * `private[sql]`. This bridge lives under `org.apache.spark.sql` solely
  * to re-export the two converters to graft's custom-expression layer —
  * the standard pattern for Spark extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
