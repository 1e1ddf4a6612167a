package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** The remaining TPC-H shapes (Q4/6/7/9/11/12/15/16/19) — with the
  * suite-completing queries this registry already carries
  * (Q1/2/3/5/8/10/13/14/17/18/20/21/22 in [[Relational]]), every one of
  * the 22 classic decision-support patterns now has a Spark-first,
  * DuckDB-oracled restatement over the driver's tables.
  *
  * Reshapes where the fixture lacks a column are noted per query (no
  * partsupp table, no commit/receipt dates, no ship modes); the PLAN
  * SHAPE under test — the exists semi-join, the disjunctive predicate
  * push, the scalar-threshold broadcast — is preserved, which is what
  * the suite exists to exercise. All money arithmetic goes through the
  * DECIMAL(18,2) contract ([[Q.dec]]) so no float sum ever crosses the
  * engine boundary.
  */
object TpchSuite {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Q4 (order priority checking): quarter-windowed order counts by
    * priority, kept only when EXISTS a problematic line (reshape: the
    * fixture has no commit/receipt dates, so "late" becomes "returned"
    * — l_returnflag = 'R'; the correlated-exists plan shape is
    * identical). Spark-first: the exists is a LEFT SEMI join on the
    * order key — the lineitem side carries only (l_orderkey) after its
    * pushed flag filter, and the date window prunes orders before the
    * join. */
  val q4PriorityCount = Q(
    "q4_priority_count",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority")
      val problem = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R").select("l_orderkey")
      o.join(problem, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Q6 (forecast revenue change): the purest scan-shape in the suite —
    * one pass, three range predicates ALL pushed to the parquet scan,
    * one 2-term aggregate. At 100 TB this query is entirely I/O-bound
    * and min/max row-group pruning on l_shipdate does most of the
    * work; anything beyond a single scan is wrong. */
  val q6ForecastRevenue = Q(
    "q6_forecast_revenue",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24)
        .agg(sum(dec("l_extendedprice") * dec("l_discount")).cast("double")
          .as("revenue"), count(lit(1)).as("n_lines")),
    Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24"""))

  /** Q7 (volume shipping): bilateral trade — revenue between two fixed
    * nations per shipment year, both directions. The nation pair
    * disjunction evaluates AFTER both dim joins (supplier→n1,
    * customer→n2, both broadcast), so the big join tree is built once
    * and the pair filter is a cheap post-condition on two broadcast
    * columns — never a join-per-direction. */
  val q7VolumeShipping = Q(
    "q7_volume_shipping",
    (s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("k1"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("k2"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (dec("l_extendedprice") *
            (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("rev"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("k1"))
        .join(broadcast(n2), col("c_nationkey") === col("k2"))
        .filter((col("supp_nation") === "NATION_9" &&
          col("cust_nation") === "NATION_6") ||
          (col("supp_nation") === "NATION_6" &&
            col("cust_nation") === "NATION_9"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        year(l_shipdate) AS l_year,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
          AS DOUBLE) AS revenue
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
          OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** Q9 (product type profit): nation × order-year profit for one part
    * family. Reshape: no partsupp, so unit cost is the part's retail
    * price (amount = disc price − retailprice·qty, all DECIMAL — exact
    * on both engines). One lineitem pass; part filter broadcast-semi
    * prunes it before the orders join; supplier/nation/part dims all
    * broadcast. */
  val q9ProductProfit = Q(
    "q9_product_profit",
    (s, dir) => {
      val pf = t(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
      t(s, dir, "lineitem")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (dec("l_extendedprice") *
            (lit(1).cast("decimal(18,2)") - dec("l_discount")) -
            dec("p_retailprice") * dec("l_quantity")).as("amount"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("amount")).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation, year(o_orderdate) AS o_year,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) -
            CAST(p_retailprice AS DECIMAL(18,2)) *
            CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
      FROM lineitem, part, supplier, orders, nation
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC"""))

  /** Q11 (important stock): per-part shipped value over a nation set,
    * kept when above a global-share threshold — the scalar-subquery-
    * over-the-same-aggregate pattern. Reshape: no partsupp availqty, so
    * value is shipped extended price. The threshold comparison is
    * v·1000 > total in DECIMAL (integer multiply — exact; the classic
    * `> sum·0.0001` float product cannot drift a boundary row here).
    * The global total is a 1-row broadcast; the value aggregate's
    * exchange is built once and reused for both sides at runtime. */
  val q11ImportantStock = Q(
    "q11_important_stock",
    (s, dir) => {
      val supp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name").isin("NATION_9", "NATION_11"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val value = t(s, dir, "lineitem")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"),
          "left_semi")
        .groupBy("l_partkey")
        .agg(sum(dec("l_extendedprice")).as("v"))
      val total = value.agg(sum("v").as("tot"))
      value.crossJoin(broadcast(total))
        .filter(col("v") * 1000 > col("tot"))
        .select(col("l_partkey"),
          col("v").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("""WITH val AS (
        SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name IN ('NATION_9', 'NATION_11')
        GROUP BY 1)
      SELECT l_partkey, CAST(v AS DOUBLE) AS value FROM val
      WHERE v * 1000 > (SELECT sum(v) FROM val)
      ORDER BY value DESC, l_partkey"""))

  /** Q12 (shipping priority classes): two-way conditional counts per
    * line status in a shipment-year window (reshape: no ship modes in
    * the fixture, so the grouping is l_linestatus; the
    * high/low-priority CASE pair is verbatim). One orders⋈lineitem
    * join, both sums from the same pass. */
  val q12PriorityClasses = Q(
    "q12_priority_classes",
    (s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linestatus")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Q15 (top supplier): each nation's highest-revenue supplier for a
    * quarter — the revenue-view + scalar-max pattern, grouped per
    * nation so the oracle frame carries ~25 rows instead of the
    * classic single winner. The per-nation max is a window PARTITIONED
    * on the nation (same one-scan rationale as q2: a groupBy-then-join
    * re-evaluates the revenue subtree). Revenue DECIMAL end to end so
    * the `= max` equality cannot drift. */
  val q15TopSupplier = Q(
    "q15_top_supplier",
    (s, dir) => {
      val byNation = org.apache.spark.sql.expressions.Window
        .partitionBy("s_nationkey")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("tr"))
        .join(broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .withColumn("mx", max("tr").over(byNation))
        .filter(col("tr") === col("mx"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("s_suppkey"), col("s_name"),
          col("tr").cast("double").as("total_rev"))
        .orderBy("n_name", "s_suppkey")
    },
    Some("""WITH rev AS (
        SELECT l_suppkey,
          sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS tr
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY 1)
      SELECT n_name, s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_rev
      FROM supplier JOIN rev ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE tr = (SELECT max(r2.tr) FROM rev r2, supplier s2
        WHERE r2.l_suppkey = s2.s_suppkey
          AND s2.s_nationkey = supplier.s_nationkey)
      ORDER BY n_name, s_suppkey"""))

  /** Q16 (parts/supplier relationship): distinct-supplier counts per
    * (brand, type, size) bucket, with brand/type exclusions and a
    * supplier blacklist (reshape: no comment column, so "complaints"
    * becomes negative account balance). The blacklist is a broadcast
    * anti-join (6 rows); the distinct count shuffles only the four
    * carried columns. */
  val q16PartsSupplier = Q(
    "q16_parts_supplier",
    (s, dir) => {
      val pf = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#2" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
        AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** Q19 (discounted revenue): the disjunction-of-conjunctions
    * predicate — three (brand, size-range, quantity-range) bundles
    * OR'd together over the part join. The part side of each bundle
    * prunes the broadcast dim; the quantity legs evaluate post-join.
    * One fact scan, one 2-term aggregate. */
  val q19DiscountedRevenue = Q(
    "q19_discounted_revenue",
    (s, dir) => {
      val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val bundle =
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#17" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(bundle)
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("revenue"), count(lit(1)).as("n_lines"))
    },
    Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
          AS DOUBLE) AS revenue,
        count(*) AS n_lines
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND (
        (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
          AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 10
          AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 20 AND 30))"""))

  val all: Seq[Q] = Seq(q4PriorityCount, q6ForecastRevenue,
    q7VolumeShipping, q9ProductProfit, q11ImportantStock,
    q12PriorityClasses, q15TopSupplier, q16PartsSupplier,
    q19DiscountedRevenue)
}
