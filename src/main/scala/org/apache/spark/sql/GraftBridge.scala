package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions.
  *
  * Spark 4 wraps `Column` around a `ColumnNode` and hides the Catalyst
  * expression behind `org.apache.spark.sql.classic.ExpressionUtils`
  * (columnNodeSupport.scala). Custom native expressions (see
  * `graft.functions.VectorExpressions`) need both directions; this shim is
  * the single sanctioned crossing point.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
