package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Remaining window/ratio shapes (SURVEY.md §2.5 W2/W3, §2.4 A2). */
object Windows {

  /** W2: "primary charge" selection — first row per key by a status
    * preference then ordinal (reference app.py:604-619: outstanding/
    * part-satisfied first, else first listed). Here: per order, the
    * preferred lineitem is returnflag 'R' first, then linenumber. */
  val w2PrimaryPerKey = Q(
    "w2_primary_per_key",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pref = when(col("l_returnflag") === "R", 0).otherwise(1)
      // l_linenumber alone is not unique in the synthetic data — the
      // ordinal must be a total order or the pick is nondeterministic
      val w = Window.partitionBy("l_orderkey")
        .orderBy(pref, col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
      Tables.load(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM (
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
          row_number() OVER (PARTITION BY l_orderkey
            ORDER BY CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END,
                     l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
        FROM lineitem) WHERE rn = 1"""))

  /** W3: first-N per group as an array slice (reference app.py:588-594 —
    * first 3 officers for display), deterministic inner order. */
  val w3FirstNSlice = Q(
    "w3_first_n_slice",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(slice(array_sort(collect_list(col("l_partkey"))), 1, 3)
          .as("first_parts"), count(lit(1)).as("n_lines"))
        .select(col("l_orderkey"),
          concat_ws(",", col("first_parts").cast("array<string>")).as("first_parts"),
          col("n_lines")),
    Some("""SELECT l_orderkey,
        array_to_string(list_sort(list(l_partkey))[1:3], ',') AS first_parts,
        count(*) AS n_lines
      FROM lineitem GROUP BY 1"""))

  /** A2: filtered counts + derived success ratio (reference
    * database.py:473-499 — enrichment success rate). Ratio kept exact:
    * integer counts divided as doubles. */
  val a2SuccessRatio = Q(
    "a2_success_ratio",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") > 20, 1L).otherwise(0L)).as("n_big"))
        .withColumn("big_rate",
          col("n_big").cast("double") / col("n").cast("double") * 100.0),
    Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CASE WHEN value > 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        CAST(sum(CASE WHEN value > 20 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) * 100.0 AS big_rate
      FROM events GROUP BY 1"""))

  /** W6: top-3 orders per priority through the BOUNDED-BUFFER TopK
    * Aggregator (operators.TopK) instead of a window row_number — the
    * skew-proof form: map-side combine caps shuffle volume at groups×k,
    * no reducer ever sorts a whole group. The oracle is the window form,
    * which proves the two are result-identical. */
  val w6TopkAgg = Q(
    "w6_topk_agg",
    (s, dir) => {
      val top3 = graft.operators.TopK.topK(3)
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(top3(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("o_orderkey"),
          col("col.score").as("o_totalprice"))
    },
    Some("""SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders)
      WHERE rank <= 3"""))

  /** W7: ntile quartiles per group — equal-frequency bucketing of each
    * priority's orders by price (the reference's tier banding). NOT a
    * window: o_orderpriority has 5 values, so `ntile() OVER (PARTITION
    * BY priority …)` sorts the whole table inside 5 tasks (the
    * round-12 verdict's constant-cardinality trap). The tile is pure
    * arithmetic on (rank, group size): with q = n div k and rem =
    * n mod k, SQL ntile gives the first rem tiles q+1 rows — so
    * bucket(r) = (r−1) div (q+1) + 1 while r ≤ rem·(q+1), else
    * rem + (r − rem·(q+1) − 1) div q + 1. Rank comes distributed from
    * [[graft.operators.Align.groupedRowNumber]] (ties broken by the
    * unique key, so the bucketing is deterministic), group sizes from
    * a broadcast 5-row aggregate; the oracle keeps the textbook
    * window, proving the closed form IS ntile. */
  val w7Ntile = Q(
    "w7_ntile",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      val sizes = o.groupBy("o_orderpriority").agg(count(lit(1)).as("gn"))
      graft.operators.Align
        .groupedRowNumber(o, Seq("o_orderpriority"), "rk",
          col("o_totalprice").desc, col("o_orderkey"))
        .join(broadcast(sizes), "o_orderpriority")
        .withColumn("quartile", expr("""CASE
            WHEN rk <= (gn % 4) * (gn div 4 + 1)
              THEN (rk - 1) div (gn div 4 + 1) + 1
            ELSE (gn % 4) + (rk - (gn % 4) * (gn div 4 + 1) - 1)
              div greatest(gn div 4, 1) + 1 END""").cast("long"))
        .groupBy("o_orderpriority", "quartile")
        .agg(count(lit(1)).as("n"),
          Q.dsum(col("o_totalprice")).as("sum_price"))
    },
    Some("""SELECT o_orderpriority, quartile, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM (
        SELECT o_orderpriority, o_totalprice,
          ntile(4) OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        FROM orders)
      GROUP BY 1, 2"""))

  /** W10: GLOBAL running total — `sum() OVER (ORDER BY …)` with no
    * partition key, the one window shape this engine refused to
    * register until round 12 because Spark executes it on a single
    * task (the PlanAudit scale-killer). The Spark side is
    * [[graft.operators.Align.prefixSum]]: range-partition + in-
    * partition running sums + broadcast per-partition offsets — every
    * task holds only its slice, so the same query runs at 100 TB —
    * while the oracle keeps the textbook unpartitioned window. Money
    * rides as exact cents (DECIMAL→BIGINT); order is the total
    * (o_orderdate, o_orderkey), so ties can't wobble. */
  val w10GlobalCumsum = Q(
    "w10_global_cumsum",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          (dec("o_totalprice") * 100).cast("long").as("cents"))
      graft.operators.Align.prefixSum(o, "cents", "run_cents",
          col("o_orderdate"), col("o_orderkey"))
        .select(col("o_orderkey"), col("run_cents"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
          OVER (ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS BIGINT) AS run_cents
      FROM orders ORDER BY o_orderkey"""))

  val all: Seq[Q] = Seq(w2PrimaryPerKey, w3FirstNSlice, a2SuccessRatio,
    w6TopkAgg, w7Ntile, w10GlobalCumsum)
}
