package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit SimHash over a pre-hashed token array in ONE pass.
  *
  * Semantically identical to the 32-term expression tree it replaces
  * (per bit i: sum over hashes of ±1 by bit i, emit 1«i when positive —
  * Dedup.simhash32's original formulation, kept verbatim in the DuckDB
  * oracle), but a single loop over the array maintaining all 32 counters
  * instead of 32 independent `aggregate` traversals per row. */
case class SimhashBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimhashBits.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimhashBits.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object SimhashBits {
  def compute(hs: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhashBits(c: Column): Column =
    GraftShim.toColumn(SimhashBits(GraftShim.toExpression(c)))
}
