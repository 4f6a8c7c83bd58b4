package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  * Spark 4 hides the classic converters behind private[sql]; this
  * one-file shim (the standard extension-library pattern) re-exports
  * exactly the two calls needed. */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Register a function builder into an EXISTING session's registry —
    * the runtime counterpart of SparkSessionExtensions.injectFunction
    * for sessions graft does not construct (Verify/Bench receive a
    * driver-owned session). Same shim rationale as above:
    * `sessionState` is private[sql] in Spark 4. */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState
      .functionRegistry.registerFunction(ident, info, builder)
}
