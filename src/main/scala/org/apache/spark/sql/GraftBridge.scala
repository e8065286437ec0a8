package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the standard
  * pattern used by external Spark connectors/extensions to build `Column`s
  * from custom Catalyst `Expression`s on Spark 4 (where `Column` wraps a
  * ColumnNode rather than an Expression).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
