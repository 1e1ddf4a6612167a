package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiler (the engine's `SUMMARIZE`): per-column row
  * count, null count, exact distinct count, and type-appropriate
  * min/max, emitted in long format (one row per column).
  *
  * The reference surfaces per-table record counts and null-driven
  * quality scores in its stats views (database.py:458-471,
  * utils.py:223-272); this generalizes both into a single scan.
  *
  * All statistics are computed in ONE aggregate over the table — the
  * per-column structs are built inside one `agg(...)`, so the input is
  * read once, then the single result row explodes into long format
  * (driver-sized: one row per column). Exact `countDistinct` over k
  * columns plans as an Expand (k× the scan rows through the first
  * aggregate): acceptable for a profiler run; at 100 TB swap in
  * `approx_count_distinct` (the a18_sketches pattern) — the shape of
  * the operator is unchanged.
  *
  * Min/max never cross type families (a double formatted as a string
  * diverges between engines): numerics surface as DOUBLE in
  * `min_num`/`max_num`, strings as-is in `min_str`/`max_str`, and
  * date/timestamp columns as ISO `yyyy-MM-dd` day strings — each
  * family leaves the other columns NULL. */
object Profile {

  def summarize(df: DataFrame, numeric: Seq[String], strings: Seq[String],
      dates: Seq[String]): DataFrame = {
    val nullStr = lit(null).cast("string")
    val nullNum = lit(null).cast("double")
    def base(c: String) = Seq(
      lit(c).as("col_name"),
      count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(col(c)).as("n_distinct"))
    val entries: Seq[Column] =
      numeric.map(c => struct(base(c) ++ Seq(
        min(col(c)).cast("double").as("min_num"),
        max(col(c)).cast("double").as("max_num"),
        nullStr.as("min_str"), nullStr.as("max_str")): _*)) ++
      strings.map(c => struct(base(c) ++ Seq(
        nullNum.as("min_num"), nullNum.as("max_num"),
        min(col(c)).as("min_str"), max(col(c)).as("max_str")): _*)) ++
      dates.map(c => struct(base(c) ++ Seq(
        nullNum.as("min_num"), nullNum.as("max_num"),
        min(col(c)).cast("date").cast("string").as("min_str"),
        max(col(c)).cast("date").cast("string").as("max_str")): _*))
    val named = entries.zipWithIndex.map { case (e, i) => e.as(s"c$i") }
    df.agg(named.head, named.tail: _*)
      .select(explode(array(entries.indices.map(i => col(s"c$i")): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Distribution drift between two snapshot generations — the monitor
    * that catches a crawl whose language mix or value distribution
    * silently shifted before it trains a model. Inputs are pre-bucketed
    * observations, one row per record: `(dim, bucket)` — the caller
    * decides what a bucket is (a categorical value, a fixed-width
    * numeric bin). Output: per (dim, bucket) the old/new counts, each
    * side's share of its dim in integer permille, and the absolute
    * share delta — all-integer, so the whole report is oracle-exact
    * (sum delta_pm over a dim and halve for total-variation distance).
    *
    * A dim present in only ONE generation (a brand-new or vanished
    * dimension — the strongest drift there is) has a zero total on the
    * other side; its share there is 0 permille (of nothing, nothing is
    * this bucket), NOT null, so those rows surface with maximal
    * delta_pm instead of silently nulling out of the report.
    *
    * Scale: one map-side-combined count per side keyed (dim, bucket) —
    * cardinality = buckets, not rows; dim totals re-aggregate the
    * bucket counts (tiny) and broadcast back. */
  def driftReport(olderBuckets: DataFrame, newerBuckets: DataFrame): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.groupBy("dim", "bucket").agg(count(lit(1)).as(as))
    val j = counts(olderBuckets, "n_old")
      .join(counts(newerBuckets, "n_new"), Seq("dim", "bucket"), "full_outer")
      .select(col("dim"), col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = j.groupBy("dim")
      .agg(sum("n_old").as("tot_old"), sum("n_new").as("tot_new"))
    val shareOld =
      expr("CASE WHEN tot_old = 0 THEN 0 ELSE (1000 * n_old) div tot_old END")
    val shareNew =
      expr("CASE WHEN tot_new = 0 THEN 0 ELSE (1000 * n_new) div tot_new END")
    j.join(broadcast(totals), "dim")
      .select(col("dim"), col("bucket"), col("n_old"), col("n_new"),
        shareOld.as("share_old_pm"),
        shareNew.as("share_new_pm"),
        abs(shareOld - shareNew).as("delta_pm"))
  }
}
