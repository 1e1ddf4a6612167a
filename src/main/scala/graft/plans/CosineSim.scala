package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity of two Float embeddings in ONE pass.
  *
  * Bit-identical to the composed form it replaces —
  * `dot/(sqrt(dot(a,a))·sqrt(dot(b,b)))` where each dot is a sequential
  * left fold over `zip_with` products of per-element double casts — and
  * therefore to the DuckDB `list_reduce` oracle: the three sums
  * accumulate in the same element order with the same double ops (JVM
  * doubles are strict IEEE; no FMA contraction), sqrt/divide follow.
  * The composed form traversed each array five times and materialized
  * two cast copies per row; this is one loop with three accumulators.
  * Zero norms (or empty/mismatched/NULL arrays) → 0.0, as before: the
  * composed form's otherwise() branch yields 0.0 when either array is
  * NULL, so this expression is null-INTOLERANT-OUTPUT — never NULL —
  * and overrides eval/doGenCode directly (BinaryExpression's default
  * nullSafeEval wrapper would short-circuit a NULL input to NULL). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  private lazy val lf = isFloat(left)
  private lazy val rf = isFloat(right)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) 0.0
    else CosineSim.compute(a.asInstanceOf[ArrayData], lf,
      b.asInstanceOf[ArrayData], rf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = left.genCode(ctx)
    val b = right.genCode(ctx)
    val code =
      code"""
        ${a.code}
        ${b.code}
        double ${ev.value} = 0.0;
        if (!${a.isNull} && !${b.isNull}) {
          ${ev.value} = graft.plans.CosineSim.compute(${a.value}, $lf, ${b.value}, $rf);
        }"""
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object CosineSim {
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean): Double = {
    val n = a.numElements()
    // mismatched dimensions or a null element → 0.0, matching the
    // composed form (zip_with pads with null → null fold → otherwise 0.0)
    if (n != b.numElements()) return 0.0
    var dot = 0.0
    var na2 = 0.0
    var nb2 = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return 0.0
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na2 += x * x
      nb2 += y * y
      i += 1
    }
    val na = math.sqrt(na2)
    val nb = math.sqrt(nb2)
    if (na > 0 && nb > 0) dot / (na * nb) else 0.0
  }

  def cosineSim(a: Column, b: Column): Column =
    GraftShim.toColumn(CosineSim(
      GraftShim.toExpression(a), GraftShim.toExpression(b)))
}
