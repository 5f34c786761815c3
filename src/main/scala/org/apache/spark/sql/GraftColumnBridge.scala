package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; classic.ExpressionUtils is the supported
  * internal shim). Lives in org.apache.spark.sql purely for access scope.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
