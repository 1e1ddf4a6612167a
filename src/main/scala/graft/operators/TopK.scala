package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a PARTIAL aggregate (SURVEY §2.12's optional
  * `topK` Aggregator) — the scale-safe alternative to window
  * `row_number <= k` on skewed keys.
  *
  * The window form shuffles EVERY row of a group to one reducer and
  * sorts there: a hot key (one company with millions of filings) owns a
  * task. This Aggregator keeps at most k candidates per group per map
  * partition, so map-side combine caps shuffle volume at groups×k
  * regardless of skew, and no task ever holds a whole group. Order:
  * score DESC, id ASC tiebreak — a total order, so results are
  * deterministic and oracle-checkable.
  *
  * The buffer insert is O(1) for rows below the current k-th score (the
  * overwhelming majority once the buffer warms) and O(k log k) for the
  * rare improvement. */
object TopK {

  final case class Scored(score: Double, id: Long)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final class TopKAgg(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.size < k) (buf :+ x).sortWith(better)
      else if (better(x, buf.last)) ((buf :+ x).sortWith(better)).take(k)
      else buf
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      (a ++ b).sortWith(better).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    // array<struct<score,id>> — a real SQL type, so the buffer shuffles
    // compactly and the output explodes without deserialization tricks
    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Untyped column form: `topK(3)(col("score"), col("id"))` inside a
    * groupBy().agg — returns array<struct<score,id>> of the group's
    * top k. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[Scored])
    (score, id) => fn(score, id)
  }

  /** Payload-carrying twin: each candidate rides with one extra double
    * (Sampling carries the item's weight so the sample needs NO
    * re-attach join — the weight that ranked the row is the weight
    * emitted, and a second corpus scan disappears). Ordering and the
    * partitions×k shuffle bound are identical to [[TopKAgg]]; the
    * payload never participates in comparisons. */
  final case class ScoredW(score: Double, id: Long, w: Double)

  private def betterW(a: ScoredW, b: ScoredW): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final class TopKWAgg(k: Int)
      extends Aggregator[ScoredW, Seq[ScoredW], Seq[ScoredW]] {
    require(k > 0)
    override def zero: Seq[ScoredW] = Vector.empty
    override def reduce(buf: Seq[ScoredW], x: ScoredW): Seq[ScoredW] =
      if (buf.size < k) (buf :+ x).sortWith(betterW)
      else if (betterW(x, buf.last)) ((buf :+ x).sortWith(betterW)).take(k)
      else buf
    override def merge(a: Seq[ScoredW], b: Seq[ScoredW]): Seq[ScoredW] =
      (a ++ b).sortWith(betterW).take(k)
    override def finish(r: Seq[ScoredW]): Seq[ScoredW] = r
    override def bufferEncoder: Encoder[Seq[ScoredW]] =
      ExpressionEncoder[Seq[ScoredW]]()
    override def outputEncoder: Encoder[Seq[ScoredW]] =
      ExpressionEncoder[Seq[ScoredW]]()
  }

  /** `topKW(3)(col("score"), col("id"), col("w"))` — returns
    * array<struct<score,id,w>> of the group's top k by (score, id). */
  def topKW(k: Int): (Column, Column, Column) => Column = {
    val fn = udaf(new TopKWAgg(k), Encoders.product[ScoredW])
    (score, id, w) => fn(score, id, w)
  }
}
