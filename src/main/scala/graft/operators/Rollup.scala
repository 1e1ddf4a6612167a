package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: re-aggregable partial states
  * (counts, sums) merged without reprocessing history.
  *
  * The reference recomputes its daily automation rollup from the full
  * log on every dashboard view (automation_monitoring.py:237-292). At
  * 100 TB the history scan is the cost; the scale-correct pattern is to
  * keep the rollup as a table of partial aggregate states and fold each
  * new batch in with one `union + groupBy` over state ∪ delta — the
  * same partial/final split Spark's own hash aggregate performs inside
  * one query, lifted across job boundaries. Only counts and sums are
  * stored (they merge exactly); ratios/averages are derived columns
  * computed after the merge, never merged themselves.
  */
object Rollup {

  /** Merge two partial-aggregate states that share `keys`: every other
    * column must be a re-aggregable sum/count and is summed pairwise.
    * Columns are matched by name; both sides must have the same schema.
    */
  def mergePartials(state: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val counters = state.columns.filterNot(keys.contains)
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(counters.head -> "sum",
           counters.tail.map(c => c -> "sum"): _*)
      .select(keys.map(col) ++
        counters.map(c => col(s"sum($c)").as(c)): _*)
  }
}
