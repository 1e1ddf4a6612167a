package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D HILBERT curve index (Hilbert 1891; the xy→d walk is the classic
  * bit-level formulation popularized by Warren's Hacker's Delight and
  * the Wikipedia "Hilbert curve" reference code): maps a (x, y) cell of
  * a 2^bits × 2^bits grid to its position along the space-filling
  * curve. Versus the Morton interleave ([[graft.sources.Layout.zValue]])
  * the Hilbert walk never jumps: consecutive curve positions are always
  * grid-NEIGHBORS, so a contiguous curve range covers a tighter
  * hyper-rectangle — measurably fewer files kept per zone-map probe at
  * the same file count (the reason Databricks liquid clustering moved
  * from Z-order to Hilbert).
  *
  * The per-level quadrant rotation is an imperative loop carrying
  * (x, y) state — as a Column tree each level would re-reference both
  * prior operands and the expression would blow up ~2^levels; as a
  * native Expression it is 12 iterations of shift/xor on two longs,
  * codegen'd via a static call. Layout-only: no oracle ever computes
  * it (skipping correctness is pinned by hash-equality to the plain
  * filter, exactly like Morton's m23).
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex2.compute(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.plans.HilbertIndex2.compute($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2 {
  /** xy→d on a 2^bits grid. Inputs are clamped into domain (callers map
    * to bounded non-negative ints first, same contract as zValue). */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val side = 1L << bits
    var x = math.min(math.max(x0, 0L), side - 1)
    var y = math.min(math.max(y0, 0L), side - 1)
    var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly.
      // The reflection complements at FULL grid width (side-1 is all
      // ones, a pure bit-flip): x still carries bits ≥ s here, and a
      // narrower s-1-x would borrow across them and corrupt the walk.
      if (ry == 0L) {
        if (rx == 1L) {
          x = side - 1 - x
          y = side - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert2(x: Column, y: Column, bits: Int): Column =
    GraftShim.toColumn(HilbertIndex2(
      GraftShim.toExpression(x.cast("long")),
      GraftShim.toExpression(y.cast("long")), bits))
}
