package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the sanctioned pattern for extension libraries that define native
  * Catalyst expressions (Spark 4 removed the public
  * `new Column(Expression)` constructor in favor of ColumnNodes).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
