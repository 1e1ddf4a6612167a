package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed character n-gram shingles in one pass:
  * `array_distinct(transform(charShingles(text, n), hash31))` fused into
  * a single expression — no intermediate array of shingle strings, no
  * per-shingle UTF8String allocation beyond the md5 input, dedup via a
  * primitive-long hash set.
  *
  * Value parity: each shingle is the UTF-8 substring text[i, i+n); its
  * hash is StableHash56 % P — identical to the composed form and to the
  * DuckDB oracle (list_distinct(list_transform(shingles, h31))). Order
  * of first occurrence is preserved, matching array_distinct. */
case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleHash.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  private val P = 2147483647L

  def compute(text: UTF8String, n: Int): ArrayData = {
    // match charShingles: positions 1..max(len-(n-1),1), char-based
    val len = text.numChars()
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    var i = 0
    while (i < count) {
      // substringSQL is 1-based and clamps the tail like substr/substring
      val sh = text.substringSQL(i + 1, n)
      val h = StableHash56.eval56(sh) % P
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def shingleHash(c: Column, n: Int): Column =
    GraftShim.toColumn(ShingleHash(GraftShim.toExpression(c), n))

  def shingleExplode(c: Column, n: Int): Column =
    GraftShim.toColumn(ShingleExplode(GraftShim.toExpression(c), n))
}

/** Generator form of [[ShingleHash]]: emits one row per distinct hashed
  * shingle, straight from the text — no intermediate array column, and
  * (unlike `explode(shingleHash(...))`) no `InferFiltersFromGenerate`
  * filter that would re-evaluate the md5 pass two extra times per row
  * when Catalyst inlines the array expression into the inferred
  * `size(...) > 0` predicate. The hash values are identical to
  * ShingleHash's, so oracles written against the array form hold. */
case class ShingleExplode(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val arr = ShingleHash.compute(t.asInstanceOf[UTF8String], n)
      (0 until arr.numElements()).map(i =>
        org.apache.spark.sql.catalyst.InternalRow(arr.getLong(i)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)
}
