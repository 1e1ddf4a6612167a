package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** EXACT heavy hitters in two passes — the at-scale form of "GROUP BY
  * item HAVING count ≥ threshold" when the item domain is huge (corpus
  * tokens, URLs, user ids). A direct groupBy shuffles every distinct
  * item; at 100 TB the token domain is billions of keys, nearly all of
  * them below threshold and shuffled for nothing.
  *
  * Pass 1 runs a Misra-Gries summary (Misra & Gries 1982) as a partial
  * aggregate: each map task keeps at most k counters, the reducer
  * merges partial summaries with the mergeable-summaries rule (Agarwal
  * et al. 2012: sum counters, then subtract the (k+1)-th largest count
  * and drop non-positive) — the shuffle carries partitions × k entries,
  * never the domain. MG's guarantee makes the candidate set SOUND:
  * every item with true frequency > n/k survives the summary, so no
  * heavy item is lost.
  *
  * Pass 2 makes the answer EXACT: recount ONLY the ≤ k candidates
  * (broadcast semi-join — below-threshold items never reach the
  * shuffle; map-side combine caps it at partitions × k rows) and keep
  * items with cnt·k > n. The threshold is integer arithmetic — no
  * float epsilon, so the result is deterministic and the oracle is the
  * plain HAVING query. MG's approximate counts are used only to
  * nominate; they never appear in the output.
  */
object HeavyHitters {

  final case class MgEntry(item: String, n: Long)

  /** Misra-Gries k-counter summary over string items. The buffer is a
    * plain map (a real SQL MapType, so partial summaries shuffle as
    * compact map columns). Output order: count DESC, item ASC — total,
    * for stable explode. */
  final class MgAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[MgEntry]] {
    require(k > 0)
    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1L)
        case None if buf.size < k => buf.updated(item, 1L)
        case None =>
          // classic MG step: a (k+1)-th distinct item decrements every
          // counter; zeros vacate their slots. O(k), amortized O(1) per
          // decremented unit of count.
          buf.flatMap { case (i, c) => if (c > 1L) Some(i -> (c - 1L)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // mergeable-summaries rule: subtracting the (k+1)-th largest
        // count zeroes everything below it and keeps the error bound
        // additive (err ≤ n/ (k+1) overall)
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
      }
    }

    override def finish(r: Map[String, Long]): Seq[MgEntry] =
      r.toSeq.sortBy { case (i, c) => (-c, i) }.map((MgEntry.apply _).tupled)

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[MgEntry]] =
      ExpressionEncoder[Seq[MgEntry]]()
  }

  /** Untyped column form: `mg(100)(col("item"))` → array<struct<item,n>>
    * of (approximate) top candidates. */
  def mg(k: Int): Column => Column = {
    val fn = udaf(new MgAgg(k), Encoders.STRING)
    item => fn(item)
  }

  /** All items of `itemCol` with frequency STRICTLY above n/k, with
    * their exact counts. Output: (item, cnt), deterministic. The
    * pass-1 summary subtree is referenced exactly ONCE in the plan —
    * the corpus total n rides the broadcast candidate frame into the
    * recount, so pass 1 is not silently executed twice. */
  def exactHeavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val items = df.select(col(itemCol).cast("string").as("item"))
    // pass 1: one row — the MG candidate summary and the exact item total
    val cands = items.groupBy()
      .agg(mg(k)(col("item")).as("cands"), count(lit(1)).as("n"))
      .select(explode(col("cands")).as("c"), col("n"))
      .select(col("c.item").as("item"), col("n"))
    // pass 2: exact recount of candidates only (the inner join drops
    // non-candidates before the shuffle); integer threshold — n is
    // constant per item, so grouping by it costs nothing
    items.join(broadcast(cands), Seq("item"))
      .groupBy("item", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > col("n"))
      .select(col("item"), col("cnt"))
  }

  /** Per-GROUP heavy hitters: items above 1/k of each group's own mass
    * (heavy tokens per language, hot URLs per domain). One MG summary
    * per group — the partial-aggregate property is per (partition,
    * group), so the shuffle carries groups × k entries — then the same
    * broadcast recount, keyed by (group, item). The candidate frame is
    * groups × k rows; with a very large group domain drop the broadcast
    * hint and let the join shuffle. Output: (group, item, cnt). */
  def exactHeavyHittersPerGroup(df: DataFrame, groupCol: String,
      itemCol: String, k: Int): DataFrame = {
    val items = df.select(col(groupCol).as("__g"),
      col(itemCol).cast("string").as("item"))
    val cands = items.groupBy("__g")
      .agg(mg(k)(col("item")).as("cands"), count(lit(1)).as("n"))
      .select(col("__g"), explode(col("cands")).as("c"), col("n"))
      .select(col("__g"), col("c.item").as("item"), col("n"))
    items.join(broadcast(cands), Seq("__g", "item"))
      .groupBy("__g", "item", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > col("n"))
      .select(col("__g").as(groupCol), col("item"), col("cnt"))
  }
}
