package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 56-bit stable content hash: little-endian long of md5 bytes 8..14.
  *
  * Semantically identical to the composed-expression form
  * `conv(reversed-hex-substrings(md5(s)), 16, 10)` (see Dedup.hash56's
  * scaladoc for the DuckDB twin) but ~6 string expressions cheaper per
  * call — this sits in the innermost loop of MinHash/SimHash shingling,
  * where the hex round-trip dominated the profile.
  *
  * Codegen-enabled: the generated code calls [[StableHash56.eval56]]
  * directly, keeping the surrounding whole-stage pipeline intact.
  */
case class StableHash56(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    StableHash56.eval56(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.StableHash56.eval56($c)")

  override protected def withNewChildInternal(newChild: Expression): StableHash56 =
    copy(child = newChild)
}

object StableHash56 {
  /** Digest and fold — called from both eval and generated code. */
  def eval56(s: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes)
    var x = 0L
    var i = 0
    while (i < 7) {
      x |= (d(8 + i) & 0xffL) << (8 * i)
      i += 1
    }
    x
  }

  /** Column wrapper. */
  def hash56(c: Column): Column =
    GraftShim.toColumn(StableHash56(GraftShim.toExpression(c)))
}
