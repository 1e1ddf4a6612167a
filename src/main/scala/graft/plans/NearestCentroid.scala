package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types._

/** Nearest centroid of a fixed-point integer vector: returns
  * struct(d = min squared L2 distance, cid = id of the argmin centroid,
  * ties to the smallest id).
  *
  * The k-means / PQ / IVF family ships its (bounded, driver-collected)
  * codebooks back to executors as literals; scoring a row is then a
  * k×dims integer loop. Composed as
  * `array_min(transform(codebook, c -> struct(aggregate(zip_with(...)))))`
  * that loop runs through four nested interpreted higher-order lambdas
  * (none of which codegen — ArrayTransform/ZipWith/ArrayAggregate are
  * CodegenFallback) and allocates two arrays per centroid per row;
  * measured 8–17 s on 2 000×125×64 at sf0.1. This expression holds the
  * codebook in two flat primitive arrays (codegen: one `references`
  * lookup) and emits the whole argmin as one allocation-free nested
  * loop — same arithmetic, same tie rule, bit-identical result.
  *
  * Centroids are sorted by id at construction, so the strict `<`
  * comparison implements the (distance, id)-lexicographic argmin the
  * DuckDB oracle expresses as `row_number() ORDER BY dist, cid`. */
case class NearestCentroid(child: Expression, ids: IndexedSeq[Long],
    flat: IndexedSeq[Long], dims: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))

  @transient private lazy val idArr = ids.toArray
  @transient private lazy val flatArr = flat.toArray

  override protected def nullSafeEval(v: Any): Any = {
    val r = NearestCentroid.compute(v.asInstanceOf[ArrayData], idArr, flatArr, dims)
    new GenericInternalRow(Array[Any](r._1, r._2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncIds", idArr, "long[]")
    val flatRef = ctx.addReferenceObj("ncFlat", flatArr, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bid = ctx.freshName("bid")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      s"""
        long $best = Long.MAX_VALUE; long $bid = 0L;
        for (int $k = 0; $k < ${idArr.length}; $k++) {
          int $off = $k * $dims;
          long $s = 0L;
          for (int $i = 0; $i < $dims; $i++) {
            long $diff = $v.getLong($i) - $flatRef[$off + $i];
            $s += $diff * $diff;
          }
          if ($s < $best) { $best = $s; $bid = $idsRef[$k]; }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{$best, $bid});
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {

  def compute(v: ArrayData, ids: Array[Long], flat: Array[Long],
      dims: Int): (Long, Long) = {
    var best = Long.MaxValue
    var bid = 0L
    var k = 0
    while (k < ids.length) {
      val off = k * dims
      var s = 0L
      var i = 0
      while (i < dims) {
        val d = v.getLong(i) - flat(off + i)
        s += d * d
        i += 1
      }
      if (s < best) { best = s; bid = ids(k) }
      k += 1
    }
    (best, bid)
  }

  /** struct(d, cid) of the centroid nearest to `vec` (array<bigint>,
    * `dims` wide) among `cents` = (id, dims-wide quantized vector). */
  def nearest(vec: Column, cents: Seq[(Long, Seq[Long])]): Column = {
    val sorted = cents.sortBy(_._1)
    val dims = sorted.head._2.length
    require(sorted.forall(_._2.length == dims), "ragged codebook")
    GraftShim.toColumn(NearestCentroid(GraftShim.toExpression(vec),
      sorted.map(_._1).toIndexedSeq,
      sorted.flatMap(_._2).toIndexedSeq, dims))
  }
}
