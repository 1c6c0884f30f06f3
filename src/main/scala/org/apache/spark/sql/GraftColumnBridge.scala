package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column↔Expression conversions
  * (classic.ExpressionUtils): Column wraps a ColumnNode since the
  * Spark Connect refactor, so third-party catalyst Expressions need
  * this one-hop adapter to surface as user-facing Columns. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
