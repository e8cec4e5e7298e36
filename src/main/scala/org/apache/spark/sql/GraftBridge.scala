package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversion.
  *
  * Spark 4 hides `Column(expr)` behind `classic.ExpressionUtils`; a
  * library shipping custom Catalyst expressions needs this one hop to
  * expose them through the public Column API *without* requiring every
  * session to carry `spark.sql.extensions` config (graft's entry points
  * must work on any caller-provided SparkSession). This is the same
  * technique established Spark libraries use for typed expression
  * construction. SQL-string access to the same expressions is provided
  * separately via [[graft.GraftExtensions]].
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Raise a plain-message AnalysisException (its String constructor is
    * `private[sql]` in Spark 4) — for argument validation in SQL
    * function builders, where an analysis-time error is the contract. */
  def analysisError(message: String): Nothing =
    throw new AnalysisException(
      message = message, line = None, startPosition = None, cause = None,
      errorClass = Some("INVALID_PARAMETER_VALUE"),
      messageParameters = Map.empty,
      context = Array.empty[org.apache.spark.QueryContext])
}
