package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance — keep a groupBy
  * (count, sum) view current under INSERTS and RETRACTIONS without
  * recomputing from the base table (the delta-propagation rule for
  * distributive aggregates: ΔV = agg(ΔB), V' = V ⊎ ΔV). The reference
  * maintains dashboard rollups by full re-query on every sync
  * (DatabaseConverter/database.py stats queries re-run per refresh);
  * at 100 TB the only sane shape is this one: the refresh cost is
  * ∝ |delta| + |view|, never ∝ |base|.
  *
  * Retractions are sign rows (signCol = −1), the classic Z-set /
  * multiset-algebra encoding: deletes and late-arriving corrections go
  * through the same path as inserts. A group whose count reaches zero
  * leaves the view (multiset semantics — the view is exactly
  * `groupBy(base ⊎ deltas)`); a group first seen in a delta enters it.
  * count(*) maintained this way is trivially exact; sum goes through
  * the DECIMAL(18,2) contract so maintained and recomputed totals are
  * bit-equal, not merely close (double addition would drift by
  * aggregation order). avg/ratio views derive at read time as
  * sum/count — derived columns are NOT maintained state.
  *
  * Scale shape: [[deltaAgg]] is one map-side-combined aggregate over
  * the delta only; [[applyDelta]] merges it into the view with a keyed
  * full-outer join — both sides already one-row-per-group. No step
  * touches the base table, and nothing here is driver-side.
  */
object MatView {

  private val Dec = DecimalType(18, 2)

  /** Build the initial view: one row per key group, (cnt, total). */
  def build(base: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(Dec)).cast(Dec).as("total"))

  /** Collapse a delta batch to one signed row per group: d_cnt =
    * Σ sign, d_total = Σ sign·value. A batch may freely mix inserts
    * (+1) and retractions (−1) of the same group — they combine here,
    * map-side, before any shuffle. */
  def deltaAgg(delta: DataFrame, keys: Seq[String], valueCol: String,
      signCol: String): DataFrame =
    delta.groupBy(keys.map(col): _*)
      .agg(sum(col(signCol).cast("long")).as("d_cnt"),
        sum(col(valueCol).cast(Dec) * col(signCol).cast(Dec)).cast(Dec)
          .as("d_total"))

  /** Merge a delta batch into the view. Exact contract (pinned by a
    * unit test over random interleavings): applyDelta(build(B), Δ) ==
    * build(B ⊎ Δ) — including groups born in Δ and groups Δ retracts
    * to zero. Retracting a row that was never inserted is the caller's
    * bug (counts go negative and the group is dropped like any other
    * non-positive group; garbage in, garbage out — same as SQL MERGE). */
  def applyDelta(mv: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String, signCol: String): DataFrame = {
    val d = deltaAgg(delta, keys, valueCol, signCol)
    val zero = lit(0).cast(Dec)
    mv.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("total"), zero) + coalesce(col("d_total"), zero))
          .cast(Dec).as("total")): _*)
      .filter(col("cnt") > 0)
  }
}
