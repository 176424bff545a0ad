package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversions —
  * the standard extension idiom for libraries that define custom Catalyst
  * expressions (Spark 4 wraps Column around ColumnNode; classic
  * ExpressionUtils does the conversion). */
object MallisparkBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
