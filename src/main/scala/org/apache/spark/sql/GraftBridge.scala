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

  /** Rebind a DataFrame's (already-analyzed) plan to another session of the
    * same SparkContext — used to run an aggregation under session-conf
    * overrides (e.g. BloomJoin's cap raise) on a CHILD session so the
    * shared session's conf is never touched. The analyzed plan is fully
    * resolved, so re-analysis in the child is a no-op; the shared-state
    * cache manager still applies (cached frames stay cache-fed).
    */
  def withSession(df: DataFrame, session: SparkSession): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)
}
