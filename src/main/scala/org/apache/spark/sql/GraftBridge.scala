package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's native expressions.
  * Spark 4 moved these conversions behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so extension
  * libraries host a one-file shim in this package — the same pattern
  * used by Delta/Sedona-style Catalyst extensions.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
