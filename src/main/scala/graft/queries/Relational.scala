package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Core relational operator inventory (SURVEY.md §2.2–§2.7): filters,
  * joins, aggregates, windows, sorts, set ops — each restated over the
  * driver's TPC-H-ish tables with a DuckDB oracle.
  *
  * Scale notes are per-query; the general stance: declarative plans so
  * Catalyst pushes filters/projections into the parquet scan, broadcast
  * hints on dimension tables, decimal-exact aggregation for oracle parity.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** A2/A5-style grand rollup — TPC-H Q1 shape over lineitem.
    * Mirrors the reference's stats queries (database.py:473-499): filtered
    * counts, sums, derived ratios, grouped by low-cardinality keys.
    * Scale: map-side partial agg, 6-group output — no shuffle pressure. */
  val q1Agg = Q(
    "q1_agg",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""))

  /** Q3 (TPC-H shipping priority): the classic 3-way
    * customer⋈orders⋈lineitem with opposed date predicates and a
    * top-10 by revenue — the canonical "join then rank" OLAP shape.
    * Both date filters push into the parquet scans; the customer
    * segment filter prunes before its join; revenue goes through the
    * DECIMAL contract and the ORDER BY carries l_orderkey as the
    * deterministic tiebreak. Dates shifted to this corpus's 1995–2001
    * range. */
  val q3Shipping = Q(
    "q3_shipping_priority",
    (s, dir) => {
      val cut = lit("1997-03-15").cast("timestamp")
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          (dec("l_extendedprice") *
            (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "o_orderdate", "revenue")
    },
    Some("""SELECT l_orderkey, o_orderdate,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
          AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1997-03-15'
        AND l_shipdate > TIMESTAMP '1997-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** Q5 (TPC-H local supplier volume): the 6-way
    * customer⋈orders⋈lineitem⋈supplier⋈nation⋈region star join with
    * the c_nationkey = s_nationkey locality constraint — the widest
    * join shape in the registry. region and nation are broadcast
    * (5/25 rows at any scale); the three fact-side joins shuffle on
    * their keys once each; AQE is free to broadcast supplier when its
    * post-scan size permits. */
  val q5LocalSupplier = Q(
    "q5_local_supplier",
    (s, dir) => {
      val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (dec("l_extendedprice") *
            (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val r = t(s, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
          AS DOUBLE) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** Q17 (TPC-H small-quantity revenue): the correlated-scalar-subquery
    * classic — lineitems of one brand whose quantity falls below 20% of
    * that part's average quantity. Spark-first decorrelation: the
    * per-part average is a WINDOW over l_partkey on the brand-pruned
    * frame, so the fact table is scanned ONCE and shuffled ONCE (the
    * groupBy-then-join-back form plans two lineitem scans here —
    * column pruning makes the two exchange subtrees non-identical, so
    * ReuseExchange can't merge them; the naive correlated form re-scans
    * per row). The window is partitioned on a high-cardinality key —
    * no single-partition sort — and PlanSpec pins the one-scan/
    * one-exchange shape. l_quantity is integral at the source, so
    * double sums/avgs are order-independent and the avg×0.2 comparison
    * evaluates identical IEEE operands on both engines; revenue goes
    * through the DECIMAL contract. */
  val q17SmallQty = Q(
    "q17_small_qty_revenue",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val p = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#4").select("p_partkey")
      val w = Window.partitionBy("l_partkey")
      t(s, dir, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .withColumn("qty_cut", avg(col("l_quantity")).over(w) * 0.2)
        .filter(col("l_quantity") < col("qty_cut"))
        .agg((dsum("l_extendedprice") / 7.0).as("avg_yearly"))
    },
    Some("""WITH sel AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'),
      thresh AS (
        SELECT l_partkey, 0.2 * (sum(l_quantity) / count(l_quantity)) AS qty_cut
        FROM sel GROUP BY l_partkey)
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
          AS avg_yearly
      FROM sel JOIN thresh USING (l_partkey)
      WHERE l_quantity < qty_cut"""))

  /** Q18 (TPC-H large-volume customers): groupBy-HAVING on the fact
    * table feeding a join back to orders/customer, top-100 by order
    * value. The HAVING side aggregates lineitem FIRST (partial agg
    * map-side, one shuffle on l_orderkey), so the expensive join sees
    * only qualifying orders (~0.1% of keys); customer attaches last,
    * after AQE has seen how small the qualifying side is. TakeOrdered
    * caps the result without a global sort. Integral quantities keep
    * the double HAVING sum exact; o_orderkey breaks ties for a total
    * order. */
  val q18LargeOrders = Q(
    "q18_large_orders",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 200.0)
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = t(s, dir, "customer").select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        total_qty
      FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 200) big
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** Q21 (TPC-H waiting-supplier shape): the stacked EXISTS/NOT-EXISTS
    * classic — per returned line, "some OTHER supplier is also on this
    * order" (exists) and "NO other supplier's line was returned"
    * (not exists) — generalizing the reference's J7 existence checks to
    * multi-condition form. (The testdata carries no receipt/commit
    * dates, so "kept waiting" is re-expressed over l_returnflag with
    * the identical correlation structure.) Spark-first decorrelation:
    * BOTH subqueries collapse into ONE aggregate over lineitem —
    * per-order distinct-supplier count and distinct-RETURNED-supplier
    * count — joined back to the returned lines; exists ⟺ n_supp > 1,
    * not-exists ⟺ n_ret_supp = 1 (the line's own supplier). Two
    * passes over the fact table total (the correlated form re-scans
    * per row; a semi+anti chain scans three times), no BNLJ — PlanSpec
    * pins it. The oracle keeps the textbook EXISTS/NOT EXISTS form, so
    * equality proves the decorrelation.
    *
    * The per-order counts are a TWO-LEVEL aggregate — collapse to one
    * row per (order, supplier) with a returned-flag max, then count
    * per order — instead of conditional countDistinct: the distinct
    * form plans an Expand (2× rows into the shuffle, one copy per
    * distinct aggregate); the two-level form's first shuffle combines
    * map-side to ≤ |order×supplier| rows. Measured at sf0.1/local[32]:
    * 1.5 s → 1.0 s. */
  val q21WaitingSupplier = Q(
    "q21_waiting_supplier",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val per = l.groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
          .as("ret"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("ret").as("n_ret_supp"))
      val f = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val sup = t(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
      // an IN-list of nations rather than the classic single nation:
      // the fixture has ≤10 suppliers per nation, so one nation keeps
      // only ~3 output rows — a hash over 3 rows barely exercises the
      // exists/not-exists logic (round-10 verdict: vacuous signal)
      val nat = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_6", "NATION_9",
          "NATION_11")).select("n_nationkey")
      l.filter(col("l_returnflag") === "R")
        .join(f, col("l_orderkey") === col("o_orderkey"))
        .join(per.filter(col("n_supp") > 1 && col("n_ret_supp") === 1),
          Seq("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM supplier, lineitem l1, orders, nation
      WHERE s_suppkey = l1.l_suppkey
        AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
        AND s_nationkey = n_nationkey
        AND n_name IN ('NATION_3', 'NATION_6', 'NATION_9', 'NATION_11')
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""))

  /** Q22 (TPC-H prospective-customer shape): the OTHER classic
    * correlated pattern — a GLOBAL scalar-subquery threshold
    * (balance above the average positive balance) combined with
    * NOT EXISTS (customer has no orders), rolled up per segment.
    * Spark-first: the scalar is a 1-row aggregate cross-joined as a
    * broadcast (never a driver round-trip), the not-exists is a
    * left-anti join on the order keys, and both run before the rollup
    * so the anti-join sees only above-threshold customers. The
    * not-exists is "no RECENT order" (none since 2000-01-01) rather
    * than the classic "no order at all": the fixture gives every
    * customer at least one order, so the unrestricted anti-join kept
    * ZERO rows at the correctness scale — a hash over an empty frame
    * proves nothing about the threshold + anti-join logic (round-10
    * verdict); the recency cut keeps ~55 customers across all 5
    * segments at sf0.01. The threshold compares identical IEEE
    * operands on both engines (decimal-exact sum, one double
    * division), so the filter can never drift by a row. */
  val q22ProspectCustomers = Q(
    "q22_prospect_customers",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((dsum("c_acctbal") / count(col("c_acctbal")).cast("double"))
          .as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), dsum("c_acctbal").as("total_bal"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
              / count(c_acctbal)
          FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Q8 (TPC-H market-share shape): one nation's share of ECONOMY-part
    * revenue into ASIA customers, per order year — the
    * ratio-of-conditional-sums report every BI tier runs. Exactness
    * across engines: revenue is the DECIMAL(18,2)×DECIMAL(18,2)
    * product summed at scale 4 (order-independent), both numerator and
    * denominator convert to exact BIGINT ten-thousandths, and the
    * share is integer permille by truncating division — no
    * floating-point ratio ever crosses the engine boundary. Plan: one
    * pass over the join tree, the share a conditional sum (no second
    * scan for the numerator), dims broadcast. */
  val q8MarketShare = Q(
    "q8_market_share",
    (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = t(s, dir, "nation").select("n_nationkey", "n_regionkey")
      val r = t(s, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")
      val sup = t(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      val supNat = t(s, dir, "nation")
        .filter(col("n_name") === "NATION_3")
        .select(col("n_nationkey").as("target_natkey"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (dec("l_extendedprice") *
            (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(supNat),
          col("s_nationkey") === col("target_natkey"), "left_outer")
        .groupBy("o_year")
        .agg(
          expr("CAST(sum(CASE WHEN target_natkey IS NOT NULL THEN rev END) * 10000 AS BIGINT)")
            .as("nat_rev_e4"),
          expr("CAST(sum(rev) * 10000 AS BIGINT)").as("tot_rev_e4"))
        .select(col("o_year"),
          coalesce(col("nat_rev_e4"), lit(0L)).as("nat_rev_e4"),
          col("tot_rev_e4"),
          expr("(1000 * coalesce(nat_rev_e4, 0)) div tot_rev_e4")
            .as("share_pm"))
        .orderBy("o_year")
    },
    Some("""WITH f AS (
        SELECT year(o_orderdate) AS o_year,
          CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS rev,
          s_nationkey IN (SELECT n_nationkey FROM nation
            WHERE n_name = 'NATION_3') AS is_target
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
        JOIN supplier ON s_suppkey = l_suppkey)
      SELECT o_year,
        CAST(coalesce(CAST(sum(CASE WHEN is_target THEN rev END) * 10000
          AS BIGINT), 0) AS BIGINT) AS nat_rev_e4,
        CAST(sum(rev) * 10000 AS BIGINT) AS tot_rev_e4,
        (1000 * coalesce(CAST(sum(CASE WHEN is_target THEN rev END) * 10000
          AS BIGINT), 0)) // CAST(sum(rev) * 10000 AS BIGINT) AS share_pm
      FROM f GROUP BY o_year ORDER BY o_year"""))

  /** Q13 (TPC-H customer-distribution shape): the histogram-of-counts
    * classic — how many customers placed exactly k orders, INCLUDING
    * k = 0 (the reason it's a LEFT outer join from customer, not a
    * plain groupBy over orders: zero-order customers vanish from any
    * inner form). Two aggregates: orders-per-customer, then
    * customers-per-count — both map-side combined, the second over one
    * row per customer. */
  val q13CustDist = Q(
    "q13_cust_dist",
    (s, dir) => {
      val c = t(s, dir, "customer").select("c_custkey")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** Q14 (TPC-H promo-revenue shape): one month's share of PROMO-part
    * revenue — the conditional-sum ratio again (q8's pattern) but with
    * the numerator condition on a JOINED dimension attribute, so the
    * dim join must complete before the split. Exact BIGINT
    * ten-thousandths; share in integer permille. */
  val q14PromoShare = Q(
    "q14_promo_share",
    (s, dir) => {
      val p = t(s, dir, "part").select("p_partkey", "p_type")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          (dec("l_extendedprice") *
            (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          expr("CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) * 10000 AS BIGINT)")
            .as("promo_rev_e4"),
          expr("CAST(sum(rev) * 10000 AS BIGINT)").as("tot_rev_e4"))
        .select(
          coalesce(col("promo_rev_e4"), lit(0L)).as("promo_rev_e4"),
          col("tot_rev_e4"),
          expr("(1000 * coalesce(promo_rev_e4, 0)) div tot_rev_e4")
            .as("promo_pm"))
    },
    Some("""SELECT
        CAST(coalesce(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) * 10000
          AS BIGINT), 0) AS BIGINT) AS promo_rev_e4,
        CAST(sum(rev) * 10000 AS BIGINT) AS tot_rev_e4,
        (1000 * coalesce(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) * 10000
          AS BIGINT), 0)) // CAST(sum(rev) * 10000 AS BIGINT) AS promo_pm
      FROM (SELECT l_partkey,
              CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-04-01') l
      JOIN part ON p_partkey = l_partkey"""))

  /** Q10 (TPC-H returned-item report): customers ranked by revenue
    * they returned in a quarter — fact filtered FIRST (returnflag +
    * date window pushed to the scans), aggregated per customer, then
    * the customer/nation dims attach to only the aggregated rows,
    * TakeOrdered top 20. */
  val q10ReturnedItem = Q(
    "q10_returned_item",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (dec("l_extendedprice") *
            (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
      val rev = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("rev")).cast("double").as("revenue"))
      val c = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val n = t(s, dir, "nation").select("n_nationkey", "n_name")
      rev.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
          AS DOUBLE) AS revenue,
        c_acctbal, n_name
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** Q2 (TPC-H min-cost-supplier shape): for each qualifying part, the
    * EUROPE supplier(s) whose cost equals the minimum cost any EUROPE
    * supplier quotes for that part — the classic correlated scalar
    * subquery (`cost = (SELECT min(cost) ... WHERE partkey = outer)`)
    * decorrelated Spark-first into a per-part min aggregate joined back
    * on (partkey, cost). The fixture has no partsupp table, so the
    * part-supplier cost relation derives from lineitem: a pair's cost
    * is the minimum extended price it ever shipped at — DECIMAL(18,2)
    * end to end, so the `cost = min` equality can never drift by an
    * ulp between engines (the reason the classic ps_supplycost double
    * division is NOT used). Plan shape: the part filter broadcast-semi
    * prunes the pair relation BEFORE any aggregate (min over the
    * pruned set equals min over all pairs of a surviving part — the
    * filter is independent of supplier), the per-part min is a window
    * PARTITIONED on the part key over the pair relation (one lineitem
    * scan total — a groupBy-then-self-join re-computes the pair subtree
    * and scans the fact twice), dims broadcast, no BNLJ. ~84 rows at
    * sf0.01. */
  val q2MinCostSupplier = Q(
    "q2_min_cost_supplier",
    (s, dir) => {
      val pf = t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY" && col("p_size") < 15)
        .select("p_partkey", "p_name")
      val eur = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val byPart = org.apache.spark.sql.expressions.Window
        .partitionBy("l_partkey")
      t(s, dir, "lineitem")
        .join(broadcast(pf.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(dec("l_extendedprice")).as("cost"))
        .join(eur, col("l_suppkey") === col("s_suppkey"))
        .withColumn("min_cost", min("cost").over(byPart))
        .filter(col("cost") === col("min_cost"))
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"),
          col("cost").cast("double").as("min_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    Some("""WITH pairs AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem GROUP BY 1, 2)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             CAST(cost AS DOUBLE) AS min_cost
      FROM pairs, supplier, nation, region, part
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        AND p_partkey = l_partkey AND p_type = 'ECONOMY' AND p_size < 15
        AND cost = (
          SELECT min(p2.cost) FROM pairs p2, supplier s2, nation n2, region r2
          WHERE p2.l_suppkey = s2.s_suppkey AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
            AND p2.l_partkey = pairs.l_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""))

  /** Q20 (TPC-H potential-promotion shape): suppliers in one region
    * holding at least one matching part whose 1997 shipments exceed
    * half the pair's all-time shipped quantity — the doubly-nested
    * semi-join (`s_suppkey IN (... partkey IN (...) AND qty >
    * correlated sum)`). The fixture has no partsupp availqty, so the
    * threshold re-shapes onto lineitem alone: a pair qualifies when
    * 2·q97 > qtot, both sums DECIMAL(18,2) (the ×2 stays exact — no
    * float ratio crosses the engine boundary). Spark-first: the part
    * name filter broadcast-semi prunes lineitem before the one
    * grouped pass; both IN-lists become left-semi joins (qualifying
    * pairs ≪ lineitem, nation list broadcast). ~20 rows at sf0.01. */
  val q20PotentialPromotion = Q(
    "q20_potential_promotion",
    (s, dir) => {
      val widget = t(s, dir, "part")
        .filter(col("p_name").like("%widget%")).select("p_partkey")
      val in97 = col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp")
      val qualSupp = t(s, dir, "lineitem")
        .join(broadcast(widget), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
          sum(when(in97, dec("l_quantity"))
            .otherwise(lit(0).cast("decimal(18,2)"))).as("q97"),
          sum(dec("l_quantity")).as("qtot"))
        .filter(col("q97") * 2 > col("qtot"))
        .select("l_suppkey")
      val asia = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")
      t(s, dir, "supplier")
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"),
          "left_semi")
        .join(qualSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_partkey, l_suppkey,
            sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
                THEN CAST(l_quantity AS DECIMAL(18,2))
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS q97,
            sum(CAST(l_quantity AS DECIMAL(18,2))) AS qtot
          FROM lineitem GROUP BY 1, 2) ps
        WHERE q97 * 2 > qtot
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%widget%'))
        AND s_nationkey IN (SELECT n_nationkey FROM nation, region
                            WHERE n_regionkey = r_regionkey
                              AND r_name = 'ASIA')
      ORDER BY s_suppkey"""))

  /** P1: multi-column case-insensitive contains OR-filter
    * (reference database.py:298-307 — ILIKE on name/number/address). */
  val p1IlikeOr = Q(
    "p1_ilike_or",
    (s, dir) =>
      t(s, dir, "customer")
        .filter(lower(col("c_name")).contains("00001") ||
          lower(col("c_mktsegment")).contains("auto"))
        .select("c_custkey", "c_name", "c_mktsegment"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE lower(c_name) LIKE '%00001%' OR lower(c_mktsegment) LIKE '%auto%'"""))

  /** P4: date-range predicate (reference applicant_pipeline.py:446-451),
    * pushed into the parquet scan by Catalyst. */
  val p4DateRange = Q(
    "p4_daterange",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum("l_quantity").as("sum_qty")),
    Some("""SELECT l_returnflag, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag"""))

  /** J1: left-outer join + per-key aggregate (reference database.py:344-378,
    * companies ⟕ enrichment grouped per company).
    * Scale: both sides shuffle-partition on the key; count(col) keeps
    * no-match rows at 0, sum stays NULL — matching SQL semantics. */
  val j1LeftJoinAgg = Q(
    "j1_left_join_agg",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey").as("c_custkey"), c("c_name").as("c_name"))
        .agg(count(o("o_orderkey")).as("n_orders"),
          dsum(o("o_totalprice")).as("total_spent"))
    },
    Some("""SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
        CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey, c.c_name"""))

  /** J4: self-join shared-key edge build (reference database.py:945-959 —
    * companies sharing officers; here parts co-occurring in orders).
    * The one shuffle-heavy operator: equi-join on the grouping key
    * (l_orderkey) so Spark hash-partitions both aliases identically —
    * a single shuffle, no cartesian. `<` keeps each undirected edge once.
    * At 100 TB: salt hot orderkeys or pre-aggregate lines per order. */
  val j4SharedEdges = Q(
    "j4_shared_edges",
    (s, dir) => {
      // Instead of a self-join, collect each order's distinct parts once
      // (collect_set dedups repeated lines) and emit the pairs from the
      // sorted array in-row: one shuffle to group by order, one to count
      // pairs — the join and its second full shuffle of lineitem
      // disappear. count(*) equals the semantic countDistinct(order)
      // because each order contributes each pair at most once.
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .filter(size(col("parts")) >= 2) // singletons emit no pairs
        .select(explode(expr(
          """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)),
                       y -> struct(x AS part_a, y AS part_b))))""")).as("p"))
        .select(col("p.part_a"), col("p.part_b"))
        .groupBy("part_a", "part_b")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
    },
    Some("""SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        count(DISTINCT a.l_orderkey) AS n_orders
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2"""))

  /** W1: top-k per group via row_number window (reference
    * applicant_processor.py:262-266 — top-5 matches per applicant).
    * Deterministic total order: score desc then unique key. */
  val w1TopkPerGroup = Q(
    "w1_topk_per_group",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3"""))

  /** A9: GROUP_CONCAT per group (reference
    * database_sqlite_backup.py:202-206). Sorted inside the array so the
    * concatenation is deterministic under parallel collection. */
  val a9GroupConcat = Q(
    "a9_group_concat",
    (s, dir) =>
      t(s, dir, "nation")
        .groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n")),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        count(*) AS n
      FROM nation GROUP BY n_regionkey"""))

  /** T7/A10: event-time tumbling daily rollup (reference
    * automation_monitoring.py:237-292) — Structured-Streaming-shaped
    * window() over event time, run as a batch here. */
  val t7DailyWindow = Q(
    "t7_daily_window",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_errors"))
        .select(col("window.start").cast("date").as("day"),
          col("n"), col("sum_value"), col("n_errors")),
    Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
      FROM events GROUP BY 1"""))

  val all: Seq[Q] = Seq(q1Agg, q3Shipping, q5LocalSupplier, q17SmallQty,
    q18LargeOrders, q21WaitingSupplier, q22ProspectCustomers, q8MarketShare,
    q13CustDist, q14PromoShare, q10ReturnedItem,
    q2MinCostSupplier, q20PotentialPromotion,
    p1IlikeOr, p4DateRange, j1LeftJoinAgg,
    j4SharedEdges, w1TopkPerGroup, a9GroupConcat, t7DailyWindow)
}
