package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalized Levenshtein similarity in [0,1]:
  * 1 − dist(a,b) / max(len(a), len(b)), with 1.0 for two empty strings.
  *
  * A first-class Expression (rather than the composed
  * `1 - levenshtein/greatest(length)` tree) for two reasons: one pass in
  * codegen, and a stable node the [[SimilarityPrefilter]] optimizer rule
  * can pattern-match to inject its length-band pre-filter — the
  * "similarity(a,b) > t → cheap candidate pruning" rewrite sketched in
  * SURVEY.md §4. */
case class LevenshteinSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinSimilarity.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.LevenshteinSimilarity.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinSimilarity =
    copy(left = newLeft, right = newRight)
}

object LevenshteinSimilarity {
  def sim(a: UTF8String, b: UTF8String): Double = {
    val la = a.numChars()
    val lb = b.numChars()
    val maxLen = math.max(la, lb)
    if (maxLen == 0) 1.0
    else 1.0 - a.levenshteinDistance(b).toDouble / maxLen.toDouble
  }

  def levSimilarity(a: Column, b: Column): Column =
    GraftShim.toColumn(LevenshteinSimilarity(
      GraftShim.toExpression(a), GraftShim.toExpression(b)))
}
