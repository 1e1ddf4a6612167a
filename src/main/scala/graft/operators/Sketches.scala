package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch — the deterministic
  * sibling of a18's HyperLogLog (reference dashboard "unique X" counters,
  * database.py terms aggregations, at sketch scale).
  *
  * Keep the k smallest DISTINCT md5-derived hash56 values of the keys;
  * with h_k the k-th smallest in the [0, 2^56) domain, the distinct
  * estimate is (k-1)·2^56 / h_k (exact count when fewer than k values
  * survive). Standard error ~1/√k.
  *
  * Why it exists next to approx_count_distinct: HLL register contents are
  * implementation-specific, so DuckDB can't replay Spark's HLL and a18
  * is forever a rows-only check. KMV's state is just "k smallest hashes"
  * of a hash both engines compute bit-identically — a REAL bounded-memory
  * mergeable sketch whose output is oracle-EXACT (integer arithmetic
  * only).
  *
  * Scale shape: an Aggregator with map-side combine — every map partition
  * holds at most k longs per group, shuffle volume is groups×k regardless
  * of cardinality; no full distinct shuffle ever happens (the exact twin
  * a6 pays that). The buffer insert is O(1) for hashes above the current
  * k-th value — the overwhelming majority once the buffer warms. */
object Sketches {

  /** Largest k for which (k-1)·2^56 fits a signed long (see [[estimate]]). */
  val MaxK = 128

  final class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2 && k <= MaxK,
      s"KMV k must be in [2, $MaxK] — (k-1)*2^56 overflows Long beyond that; got $k")
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.size == k && h >= buf.last) buf // covers duplicates of buf.last
      else if (buf.contains(h)) buf
      else ((buf :+ h).sorted).take(k)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** `kmv(64)(hashCol)` inside groupBy().agg — array of the group's k
    * smallest distinct hash values (feed [[estimate]]). */
  def kmv(k: Int): Column => Column = {
    val fn = udaf(new KmvAgg(k), Encoders.scalaLong)
    h => fn(h)
  }

  /** Distinct-count estimate from a k-min array column (by name): exact
    * size when the group never filled the sketch, else (k-1)·2^56 div
    * h_k. All-integer — bit-identical on any engine. */
  def estimate(kmvName: String, k: Int): Column = {
    require(k >= 2 && k <= MaxK,
      s"KMV k must be in [2, $MaxK] — (k-1)*2^56 overflows Long beyond that; got $k")
    val scale = (k - 1).toLong * Dedup.M56 // fits a long: k ≤ MaxK enforced
    org.apache.spark.sql.functions.expr(
      s"""CASE WHEN size($kmvName) < $k THEN CAST(size($kmvName) AS BIGINT)
          ELSE $scale div element_at($kmvName, $k) END""")
  }
}
