package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark 4's private[sql] Column↔Expression converters,
  * needed to expose custom Catalyst Expressions as user-facing Columns
  * (the supported public path — registering per-session SQL functions —
  * would force every call site to thread a SparkSession). */
object GraftShim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
