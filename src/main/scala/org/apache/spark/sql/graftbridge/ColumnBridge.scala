package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's `Column` is backed by `ColumnNode` (for Connect); the
  * classic Expression⇄Column bridge lives in `private[sql]`
  * `ExpressionUtils`. This shim (inside an `org.apache.spark.sql`
  * subpackage) re-exports it so graft's custom Catalyst expressions can
  * surface as `Column`s without a session-bound function registry.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
