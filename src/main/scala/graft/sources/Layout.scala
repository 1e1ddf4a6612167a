package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout: Z-order (Morton) clustering.
  *
  * Sorting a 100 TB table by one column gives parquet row-group min/max
  * stats that prune scans on THAT column only; every other predicate
  * reads everything. Interleaving the bits of several (bounded,
  * non-negative) key columns into one Morton value and range-writing on
  * it bounds every file to a small hyper-rectangle of the key space, so
  * min/max stats prune on ANY of the interleaved dimensions — the same
  * layout trick Delta/Iceberg expose as `OPTIMIZE ZORDER BY`, expressed
  * here with stock Spark: an integer bit-weave expression (codegen'd
  * builtins only), `repartitionByRange`, and a within-partition sort.
  *
  * Callers map raw values into a bounded non-negative domain first
  * (day ordinal, bucketed id, dense rank) — the curve needs fixed-width
  * inputs; 2^bits per dimension.
  */
object Layout {

  /** Morton value: bit b of column i lands at position b·n + i. Built
    * from shift/and/or builtins — stays inside whole-stage codegen. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least two dimensions")
    require(bits * n <= 62, "interleaved width must fit a long")
    val terms =
      for ((c, i) <- cols.zipWithIndex; b <- 0 until bits)
        yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` as `numFiles` parquet files, each covering one
    * contiguous Morton range (disjoint hyper-rectangles up to range
    * sampling): range-partition on the z-value, sort within partitions
    * so row groups nest inside the file's range, drop the helper. */
  def writeZOrdered(df: DataFrame, path: String, zcols: Seq[Column],
      bits: Int, numFiles: Int): Unit = {
    val cols = df.columns.toSeq
    df.withColumn("__z", zValue(zcols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}
