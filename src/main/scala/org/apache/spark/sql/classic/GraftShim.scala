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

  /** Convert a Column to a REAL catalyst tree (UnresolvedFunction nodes
    * and all), not the lazy ColumnNodeExpression wrapper
    * [[toExpression]] returns. Required when the expression is handed
    * to the ANALYZER to resolve — e.g. a SQL function builder
    * (injectFunction) expanding to a Column-library tree: the wrapper
    * is Unevaluable and survives analysis untouched, failing only at
    * codegen. */
  def toExpressionTree(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)
}
