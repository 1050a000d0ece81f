package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column<->Expression conversions so graft's
  * native Catalyst expressions can be used through the public Column API
  * without registering a function first. Spark 4 wraps Column around
  * ColumnNode; `classic.ExpressionUtils` is the supported internal
  * converter.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
