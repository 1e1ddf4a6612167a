package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k MinHash components in one pass over a pre-hashed shingle array.
  *
  * Semantically identical to k× `array_min(transform(hs, h → (aⱼ·h+bⱼ)
  * mod P))` — same aⱼ/bⱼ formulas (Dedup.minhashA/B), same modulus — but
  * one loop with zero intermediate arrays instead of k materialized
  * transforms per row. The DuckDB oracle keeps the per-component
  * list_min form; values are equal by construction. */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinhashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  private val P = graft.operators.Dedup.P

  // single source of truth for the permutation constants — the oracle
  // SQL builder reads the same functions
  private def a(j: Int): Long = graft.operators.Dedup.minhashA(j)
  private def b(j: Int): Long = graft.operators.Dedup.minhashB(j)

  def compute(hs: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hs.numElements()
    var j = 0
    while (j < k) {
      val aj = a(j); val bj = b(j)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (aj * hs.getLong(i) + bj) % P
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(c: Column, k: Int): Column =
    GraftShim.toColumn(MinhashSig(GraftShim.toExpression(c), k))
}
