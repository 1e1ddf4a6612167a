package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.DateFunctions
import Q._

/** Aggregation inventory (SURVEY.md §2.4) + date-window behaviors (§2.5,
  * §2.8 D4–D7). */
object Aggregates {

  /** A3: GROUP BY count (reference database.py:708-716). */
  val a3CountByType = Q(
    "a3_count_by_type",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n")),
    Some("SELECT event_type, count(*) AS n FROM events GROUP BY 1"))

  /** A5: multi-metric single-row aggregate (reference database.py:1269-1275
    * — SUM×4 + AVG over completed runs). */
  val a5MultiAgg = Q(
    "a5_multi_agg",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .agg(count(lit(1)).as("n"),
          dsum("value").as("sum_value"),
          davg(col("value")).as("avg_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          countDistinct("user_id").as("n_users")),
    Some("""SELECT count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE) AS avg_value,
        min(value) AS min_value, max(value) AS max_value,
        count(DISTINCT user_id) AS n_users
      FROM events"""))

  /** A6: COUNT(DISTINCT) per group (reference database.py:978-980). */
  val a6DistinctPerGroup = Q(
    "a6_distinct_per_group",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type").agg(countDistinct("user_id").as("n_users")),
    Some("SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1"))

  /** A8: GROUP BY + HAVING (reference database.py:685-687). */
  val a8Having = Q(
    "a8_having",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 50),
    Some("""SELECT c_nationkey, count(*) AS n FROM customer
      GROUP BY 1 HAVING count(*) >= 50"""))

  /** A11: categorize then top-5 frequency (reference
    * automation_monitoring.py:294-354 error categorization). */
  val a11CategorizeTop = Q(
    "a11_categorize_top",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("category",
          when(col("event_type") === "error" && col("value") > 25, "error_big")
            .when(col("event_type") === "error", "error_small")
            .when(col("value") > 25, "ok_big")
            .otherwise("ok_small"))
        .groupBy("category").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("category")).limit(5),
    Some("""SELECT category, n FROM (
        SELECT CASE WHEN event_type = 'error' AND value > 25 THEN 'error_big'
                    WHEN event_type = 'error' THEN 'error_small'
                    WHEN value > 25 THEN 'ok_big' ELSE 'ok_small' END AS category,
               count(*) AS n
        FROM events GROUP BY 1) ORDER BY n DESC, category LIMIT 5"""))

  /** A12: recent-vs-older trend buckets (reference
    * automation_monitoring.py:356-398 — avg of last-N vs prior-N). */
  val a12Trend = Q(
    "a12_trend",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Global top-2000 via orderBy+limit (TakeOrderedAndProject — per-
      // partition top-k then a 2000-row merge on the driver side), THEN a
      // row_number over only those 2000 rows. The r1 version ranked the
      // ENTIRE table through one partition-less WindowExec.
      val top = Tables.load(s, dir, "events")
        .select("ts", "event_id", "value")
        .orderBy(col("ts").desc, col("event_id").desc).limit(2000)
      val w = Window.orderBy(col("ts").desc, col("event_id").desc)
      top.withColumn("rn", row_number().over(w))
        .withColumn("bucket", when(col("rn") <= 1000, "recent").otherwise("older"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
    },
    Some("""SELECT bucket, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE) AS avg_value
      FROM (
        SELECT value, CASE WHEN rn <= 1000 THEN 'recent' ELSE 'older' END AS bucket
        FROM (SELECT value, row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn <= 2000)
      GROUP BY 1"""))

  /** A15: data-quality score — fraction of non-null key fields ×100
    * (reference utils.py:223-272). Nulls synthesized via nullif since the
    * generated data is fully populated. */
  val a15QualityScore = Q(
    "a15_quality_score",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val score = (when(nullif(col("lang"), lit("fr")).isNotNull, 1).otherwise(0) +
        when(nullif(col("source"), lit("src3")).isNotNull, 1).otherwise(0) +
        when(col("n_chars") > 100, 1).otherwise(0) +
        when(length(col("text")) > 0, 1).otherwise(0)) * lit(25)
      d.withColumn("quality", score)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), davg(col("quality")).as("avg_quality"))
    },
    Some("""SELECT source, count(*) AS n,
        CAST(sum(CAST(quality AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(quality) AS DOUBLE) AS avg_quality
      FROM (
        SELECT source,
          (CASE WHEN nullif(lang,'fr') IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN nullif(source,'src3') IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN n_chars > 100 THEN 1 ELSE 0 END
           + CASE WHEN length(text) > 0 THEN 1 ELSE 0 END) * 25 AS quality
        FROM documents)
      GROUP BY 1"""))

  /** D4/T7: Monday-aligned weekly rollup (reference
    * weekly_scheduler.py:459-463). */
  val d4WeeklyRollup = Q(
    "d4_weekly_rollup",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(DateFunctions.weekStart(col("ts")).cast("date").as("week"))
        .agg(count(lit(1)).as("n"), dsum("value").as("sum_value")),
    Some("""SELECT CAST(date_trunc('week', ts) AS DATE) AS week, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1"""))

  /** D7: exact duration per key in microseconds (reference
    * database.py:1236-1238; micros, not unix_timestamp's seconds). */
  val d7Duration = Q(
    "d7_duration",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("span_us"), count(lit(1)).as("n")),
    Some("""SELECT user_id, epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us,
        count(*) AS n
      FROM events GROUP BY 1"""))

  /** A7: scalar MAX as its own one-row query (reference database.py
    * max(created_at) freshness probe) — previously subsumed in a5. */
  val a7MaxScalar = Q(
    "a7_max_scalar",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .agg(max(col("o_totalprice")).as("max_price"),
          max(col("o_orderdate")).as("latest_order")),
    Some("""SELECT max(o_totalprice) AS max_price,
        max(o_orderdate) AS latest_order FROM orders"""))

  /** A13: multi-facet terms aggregation in one result (the ES facets
    * panel: independent value-count breakdowns per field, long format
    * facet/value/n). Distinct from a3 (single field) and a4 (CUBE — the
    * cross product); facets are the marginals only. */
  val a13Facets = Q(
    "a13_facets",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      def facet(f: String) =
        o.groupBy(col(f).cast("string").as("facet_value"))
          .agg(count(lit(1)).as("n"))
          .select(lit(f).as("facet"), col("facet_value"), col("n"))
      facet("o_orderstatus").unionAll(facet("o_orderpriority"))
    },
    Some("""SELECT 'o_orderstatus' AS facet,
        CAST(o_orderstatus AS VARCHAR) AS facet_value, count(*) AS n
      FROM orders GROUP BY 2
      UNION ALL
      SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR), count(*)
      FROM orders GROUP BY 2"""))

  /** A19: pivot — one column per event type, counts per user (the
    * wide-format facet view; the reference renders these as Streamlit
    * metric rows, app.py dashboards). The pivot value list is PINNED:
    * a dynamic list would be a driver-side distinct scan and a
    * nondeterministic column order. Map-side partial aggregation still
    * applies — a pivot is just a conditional aggregate per value. */
  val a19Pivot = Q(
    "a19_pivot",
    (s, dir) => Tables.load(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").as("n_click"),
        col("view").as("n_view"), col("purchase").as("n_purchase"),
        col("error").as("n_error")),
    Some("""SELECT user_id,
        count(*) FILTER (WHERE event_type = 'click') AS n_click,
        count(*) FILTER (WHERE event_type = 'view') AS n_view,
        count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        count(*) FILTER (WHERE event_type = 'error') AS n_error
      FROM events GROUP BY 1"""))

  /** A20: unpivot/melt — the wide metric row back to long format (the
    * shape every per-stage stats sink in this repo emits). Spark's
    * native unpivot; the oracle is the equivalent UNION ALL. */
  val a20Unpivot = Q(
    "a20_unpivot",
    (s, dir) => Tables.load(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(Q.dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).cast("double").as("n_orders"))
      .unpivot(Array(col("o_orderstatus")),
        Array(col("sum_price"), col("n_orders")), "metric", "value"),
    Some("""WITH a AS (
        SELECT o_orderstatus,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
          CAST(count(*) AS DOUBLE) AS n_orders
        FROM orders GROUP BY 1)
      SELECT o_orderstatus, 'sum_price' AS metric, sum_price AS value FROM a
      UNION ALL
      SELECT o_orderstatus, 'n_orders', n_orders FROM a"""))

  /** A43: market-basket ASSOCIATION RULES (Agrawal & Srikant 1994's
    * support/confidence/lift over order baskets) in integer fixed
    * point: support6 = n_ab·10⁶ DIV N, conf6(a→b) = n_ab·10⁶ DIV n_a,
    * lift6 = n_ab·N·10⁶ DIV (n_a·n_b) — the retail-analytics classic,
    * exactly replayable (txt_collocations is its textual sibling; the
    * basket pair counts reuse the j4 collect-and-explode rewrite via
    * Graph.sharedKeyEdges — one shuffle to group, no self-join). Rules
    * emit BOTH directions of each pair (confidence is asymmetric);
    * min co-occurrence 3, top-40 by (lift, a, b).
    *
    * HOT-BASKET CAP: pair emission is quadratic in basket size, so the
    * query passes sharedKeyEdges an explicit maxGroupSize — the
    * ingest-side cap the operator's own doc prescribes — instead of
    * disabling it (round-11 "what's wrong" #1). Baskets over the cap
    * contribute NO pairs (item/basket totals still count them: the
    * population is real, the pathological pair explosion isn't), and
    * the dropped count rides every row as `dropped_baskets`, oracle-
    * replayed, so a capped run is visibly capped. 10 000 is generous —
    * a 10k-item basket still emits 5·10⁷ pairs — while a retail feed's
    * million-item degenerate basket (a default account id, a null key)
    * no longer owns the stage; TPC-H baskets are ≤7 lines, so the cap
    * drops zero here and the oracle proves that too. */
  val a43BasketRules = Q(
    "a43_basket_rules",
    (s, dir) => {
      val cap = 10000
      val li = Tables.load(s, dir, "lineitem")
      val pairs = graft.operators.Graph.sharedKeyEdges(li,
        "l_orderkey", "l_partkey", minShared = 3, maxGroupSize = cap)
      val itemN = li.select(col("l_orderkey"), col("l_partkey")).distinct()
        .groupBy(col("l_partkey").as("item")).agg(count(lit(1)).as("n_i"))
      val totalN = li.agg(countDistinct(col("l_orderkey")).as("n_baskets"))
      val dropped = li.select(col("l_orderkey"), col("l_partkey")).distinct()
        .groupBy("l_orderkey").agg(count(lit(1)).as("sz"))
        .agg(coalesce(sum(when(col("sz") > cap, lit(1L))), lit(0L))
          .as("dropped_baskets"))
      val directed = pairs
        .select(col("item_a").as("a"), col("item_b").as("b"),
          col("weight").as("n_ab"))
        .unionByName(pairs.select(col("item_b").as("a"),
          col("item_a").as("b"), col("weight").as("n_ab")))
      directed
        .join(itemN.withColumnRenamed("item", "a")
          .withColumnRenamed("n_i", "n_a"), "a")
        .join(itemN.withColumnRenamed("item", "b")
          .withColumnRenamed("n_i", "n_b"), "b")
        .crossJoin(broadcast(totalN))
        .crossJoin(broadcast(dropped))
        .select(col("a"), col("b"), col("n_ab"),
          expr("(n_ab * 1000000) DIV n_baskets").as("support6"),
          expr("(n_ab * 1000000) DIV n_a").as("conf6"),
          expr("(n_ab * n_baskets * 1000000) DIV (n_a * n_b)").as("lift6"),
          col("dropped_baskets"))
        .orderBy(col("lift6").desc, col("a"), col("b"))
        .limit(40)
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      sz AS (SELECT l_orderkey, count(*) AS sz FROM li GROUP BY 1),
      dropped AS (
        SELECT CAST(coalesce(sum(CASE WHEN sz > 10000 THEN 1 END), 0)
          AS BIGINT) AS dropped_baskets FROM sz),
      pairs AS (
        SELECT x.l_partkey AS item_a, y.l_partkey AS item_b,
          count(*) AS n_ab
        FROM li x JOIN li y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        JOIN sz ON sz.l_orderkey = x.l_orderkey AND sz.sz <= 10000
        GROUP BY 1, 2 HAVING count(*) >= 3),
      directed AS (
        SELECT item_a AS a, item_b AS b, n_ab FROM pairs
        UNION ALL SELECT item_b, item_a, n_ab FROM pairs),
      items AS (SELECT l_partkey AS item, count(*) AS n_i FROM li GROUP BY 1),
      total AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM lineitem)
      SELECT a, b, n_ab,
        (n_ab * 1000000) // n_baskets AS support6,
        (n_ab * 1000000) // ia.n_i AS conf6,
        (n_ab * n_baskets * 1000000) // (ia.n_i * ib.n_i) AS lift6,
        dropped_baskets
      FROM directed
      JOIN items ia ON ia.item = a
      JOIN items ib ON ib.item = b
      CROSS JOIN total
      CROSS JOIN dropped
      ORDER BY lift6 DESC, a, b LIMIT 40"""))

  /** A44: RFM SEGMENTATION — the marketing-analytics classic: per user
    * Recency (latest purchase), Frequency (purchase count), Monetary
    * (decimal-exact spend), each cut into quintiles over a TOTAL order
    * (metric, user_id — ties can't wobble between engines), composed
    * into a 3-digit segment code, segment population counts out.
    *
    * The quintile is NOT a global ntile window (that moves every user
    * through one task — the j9/PlanAudit scale-killer): each metric's
    * exact global rank comes from Align.zipWithGlobalIndex
    * (range-partition + per-partition offsets), and the rank folds into
    * ntile's exact bucket formula (first n%5 buckets one row bigger)
    * against the 1-row user-count broadcast — so the Spark plan is
    * distributed end to end while the oracle keeps the textbook
    * ntile() OVER windows. */
  val a44Rfm = Q(
    "a44_rfm",
    (s, dir) => {
      val rfm = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(unix_micros(max(col("ts"))).as("recency_us"),
          count(lit(1)).as("freq"),
          sum(Q.dec("value")).as("monetary"))
      def rankBy(metric: String, out: String) =
        graft.operators.Align.zipWithGlobalIndex(
            rfm.select(col("user_id"), col(metric)), out,
            col(metric), col("user_id"))
          .select(col("user_id"), col(out))
      // ntile(5)'s exact bucket from (rank, n): q = n DIV 5 rows per
      // bucket, the first n % 5 buckets carry one extra
      def tile(rk: String) = expr(
        s"""CASE WHEN $rk <= (n_u % 5) * (n_u DIV 5 + 1)
            THEN ($rk - 1) DIV (n_u DIV 5 + 1) + 1
            ELSE (n_u % 5) +
              ($rk - (n_u % 5) * (n_u DIV 5 + 1) - 1) DIV (n_u DIV 5) + 1
            END""")
      val seg = rfm
        .join(rankBy("recency_us", "rk_r"), "user_id")
        .join(rankBy("freq", "rk_f"), "user_id")
        .join(rankBy("monetary", "rk_m"), "user_id")
        .crossJoin(broadcast(rfm.agg(count(lit(1)).as("n_u"))))
        .withColumn("r", tile("rk_r"))
        .withColumn("f", tile("rk_f"))
        .withColumn("m", tile("rk_m"))
      seg.groupBy(concat(col("r"), col("f"), col("m")).as("segment"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("monetary")).cast("double").as("segment_value"))
        .orderBy("segment")
    },
    Some("""WITH rfm AS (
        SELECT user_id, epoch_us(max(ts)) AS recency_us,
          count(*) AS freq,
          sum(CAST(value AS DECIMAL(18,2))) AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      seg AS (
        SELECT monetary,
          ntile(5) OVER (ORDER BY recency_us, user_id) AS r,
          ntile(5) OVER (ORDER BY freq, user_id) AS f,
          ntile(5) OVER (ORDER BY monetary, user_id) AS m
        FROM rfm)
      SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
          AS segment,
        count(*) AS n_users,
        CAST(sum(monetary) AS DOUBLE) AS segment_value
      FROM seg GROUP BY 1 ORDER BY 1"""))

  /** A45: CHI-SQUARE independence test (Pearson 1900 — the A/B-testing
    * staple): is event_type independent of the user cohort? One
    * contingency aggregate (cells ∝ types × cohorts, map-side
    * combined), marginals derived FROM the cells (never a second
    * scan), each cell's (O−E)²/E evaluated in doubles from exact
    * integer counts — deterministic IEEE both engines — then floored to
    * 1e-9 fixed point and BIGINT-summed so partition order can't wiggle
    * the statistic (the mixDivergence discipline). Emits the statistic
    * and the degrees of freedom; the p-value lookup is a client-side
    * table, not an engine op. */
  val a45ChiSquare = Q(
    "a45_chi_square",
    (s, dir) => {
      val cells = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), (col("user_id") % 5).as("cohort"))
        .agg(count(lit(1)).as("o"))
      val rowT = cells.groupBy("event_type").agg(sum("o").as("rt"))
      val colT = cells.groupBy("cohort").agg(sum("o").as("ct"))
      val n = cells.agg(sum("o").as("n"),
        countDistinct("event_type").as("n_rows"),
        countDistinct("cohort").as("n_cols"))
      cells.join(rowT, "event_type").join(colT, "cohort")
        .crossJoin(broadcast(n))
        .withColumn("e",
          (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
        .withColumn("cell9", floor(
          ((col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e")) *
            lit(1.0e9)).cast("long"))
        .groupBy()
        .agg((sum("cell9").cast("double") / lit(1.0e9)).as("chi2"),
          ((max("n_rows") - 1) * (max("n_cols") - 1)).as("dof"))
    },
    Some("""WITH cells AS (
        SELECT event_type, user_id % 5 AS cohort, count(*) AS o
        FROM events GROUP BY 1, 2),
      rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
        FROM cells GROUP BY 1),
      ct AS (SELECT cohort, CAST(sum(o) AS BIGINT) AS ct
        FROM cells GROUP BY 1),
      n AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        count(DISTINCT event_type) AS n_rows,
        count(DISTINCT cohort) AS n_cols FROM cells),
      terms AS (
        SELECT CAST(floor(
            ((CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))) * 1.0e9)
            AS BIGINT) AS cell9,
          n_rows, n_cols
        FROM cells JOIN rt USING (event_type) JOIN ct USING (cohort)
        CROSS JOIN n)
      SELECT CAST(sum(cell9) AS DOUBLE) / 1.0e9 AS chi2,
        CAST((max(n_rows) - 1) * (max(n_cols) - 1) AS BIGINT) AS dof
      FROM terms"""))

  val all: Seq[Q] = Seq(a3CountByType, a5MultiAgg, a6DistinctPerGroup,
    a8Having, a11CategorizeTop, a12Trend, a15QualityScore, d4WeeklyRollup,
    d7Duration, a7MaxScalar, a13Facets, a19Pivot, a20Unpivot, a43BasketRules,
    a44Rfm, a45ChiSquare)
}
