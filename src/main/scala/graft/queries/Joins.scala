package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Join inventory beyond Relational.scala (SURVEY.md §2.3). */
object Joins {

  /** J2: inner join + filter + COUNT(DISTINCT) (reference
    * database.py:481-483 — enriched-company count). Dimension side
    * broadcast; countDistinct shuffles once on the counted key. */
  val j2DistinctCount = Q(
    "j2_join_distinct_count",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_totalprice") > 200000)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .agg(countDistinct("c_custkey").as("n_customers"),
          count(lit(1)).as("n_orders"))
    },
    Some("""SELECT count(DISTINCT c.c_custkey) AS n_customers, count(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_totalprice > 200000"""))

  /** J3: join + filter + narrow projection (reference app.py:2018-2028 —
    * csv-tier query, 7-col projection). part is broadcast. */
  val j3JoinFilterProject = Q(
    "j3_join_filter_project",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(col("p_type") === "ECONOMY" && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_partkey", "p_name",
          "p_brand", "l_quantity", "l_extendedprice")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, p_name, p_brand,
        l_quantity, l_extendedprice
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'ECONOMY' AND l.l_quantity > 45"""))

  /** J5: 1-hop graph neighborhood of the hottest node (reference
    * database.py:985-1011). The "id" is resolved declaratively (most
    * frequent part, tiebreak lowest key) so the query is deterministic at
    * every scale factor.
    *
    * Scale-safe shape: the hot anchor restricts lineitem to the orders
    * containing it BEFORE any pair logic — a neighbor of the hot part is
    * simply another part in one of those orders, so no edge expansion or
    * full co-occurrence graph is ever built (the r1 version aggregated
    * ALL pairs and then filtered — the whole graph for a 1-node answer).
    * Both joins are equi-joins; the 1-row anchor and the part dimension
    * broadcast; the orderkey join shuffles only the hot orders' slice. */
  val j5Neighborhood = Q(
    "j5_neighborhood",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val hot = l.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey")).limit(1)
        .select(col("l_partkey").as("hot_key"))
      val ld = l.distinct()
      val hotOrders = ld.join(broadcast(hot), col("l_partkey") === col("hot_key"))
        .select("l_orderkey", "hot_key")
      val p = Tables.load(s, dir, "part")
      ld.join(hotOrders, Seq("l_orderkey"))
        .filter(col("l_partkey") =!= col("hot_key"))
        .groupBy(col("hot_key"), col("l_partkey").as("neighbor"))
        .agg(count(lit(1)).as("n_orders"))
        .join(broadcast(p), col("neighbor") === col("p_partkey"))
        .select(col("hot_key"), col("neighbor"), col("p_name"), col("n_orders"))
    },
    Some("""WITH hot AS (
        SELECT l_partkey AS hot_key FROM lineitem GROUP BY 1
        ORDER BY count(*) DESC, l_partkey LIMIT 1),
      edges AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
          count(DISTINCT a.l_orderkey) AS n_orders
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
      SELECT h.hot_key,
        CASE WHEN e.part_a = h.hot_key THEN e.part_b ELSE e.part_a END AS neighbor,
        p.p_name, e.n_orders
      FROM edges e JOIN hot h ON e.part_a = h.hot_key OR e.part_b = h.hot_key
      JOIN part p ON p.p_partkey =
        CASE WHEN e.part_a = h.hot_key THEN e.part_b ELSE e.part_a END"""))

  /** J7: anti-join existence check (reference weekly_scheduler.py:593-607 —
    * "only ingest records we don't have"). */
  val j7Anti = Q(
    "j7_anti_join",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti").select("c_custkey", "c_name")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"""))

  /** J8: semi-join of a selection set (reference app.py:1344-1348). */
  val j8Semi = Q(
    "j8_semi_join",
    (s, dir) => {
      val sup = Tables.load(s, dir, "supplier")
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49).select(col("l_suppkey").as("s_suppkey"))
      sup.join(l, Seq("s_suppkey"), "left_semi").select("s_suppkey", "s_name")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier s
      WHERE EXISTS (SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)"""))

  /** J9: positional zip-join — align two sequences by rank (reference
    * api_clients.py:78-86 batch results matched to inputs by index).
    * Deterministic ranks via unique sort keys; the global index comes
    * from Align.zipWithGlobalIndex (range-partition + per-partition
    * offsets), never a single-partition row_number window. */
  val j9ZipIndex = Q(
    "j9_zip_index",
    (s, dir) => {
      val n = graft.operators.Align.zipWithGlobalIndex(
        Tables.load(s, dir, "nation"), "idx", col("n_nationkey"))
      val r = graft.operators.Align.zipWithGlobalIndex(
        Tables.load(s, dir, "region"), "idx", col("r_regionkey"))
      n.join(r, Seq("idx")).select("idx", "n_name", "r_name")
    },
    Some("""SELECT n.idx, n.n_name, r.r_name
      FROM (SELECT row_number() OVER (ORDER BY n_nationkey) AS idx, n_name FROM nation) n
      JOIN (SELECT row_number() OVER (ORDER BY r_regionkey) AS idx, r_name FROM region) r
      USING (idx)"""))

  /** J16: Bloom-filter join pruning — the shuffle-reduction move for a
    * join whose dim side is too large to broadcast as ROWS but whose key
    * SET fits a few KiB of bits (reference database.py joins filtered by
    * an id set; at 100 TB the fact side must be thinned BEFORE the
    * shuffle, not after). Build an m-bit filter over the dim keys
    * (Sketches.bloomBuild — md5-derived positions, so the whole bitmap
    * is oracle-replayable), broadcast it as a literal, and test fact
    * rows map-side: only rows whose k positions are all set ever travel.
    * False negatives are impossible; false positives surface here as
    * hit = 0 rows and are exactly what the downstream real join
    * eliminates — the oracle replays them bit-for-bit. */
  val j16BloomJoin = Q(
    "j16_bloom_join",
    (s, dir) => {
      val m = 1024; val k = 3
      val dim = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")
          .filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val words = graft.operators.Sketches.bloomBuild(dim, "s_suppkey", m, k)
      val surv = Tables.load(s, dir, "lineitem")
        .filter(graft.operators.Sketches.bloomMightContain(
          col("l_suppkey"), words, k))
        .groupBy("l_suppkey").agg(count(lit(1)).as("n_rows"))
      surv.join(broadcast(dim.withColumn("hit", lit(1L))),
          col("l_suppkey") === col("s_suppkey"), "left_outer")
        .select(col("l_suppkey"), col("n_rows"),
          coalesce(col("hit"), lit(0L)).as("hit"))
        .orderBy("l_suppkey")
    },
    Some {
      val m56 = graft.operators.Dedup.M56
      def pos(key: String, j: String) =
        s"(((md5_number_lower(CONCAT('b', $j, ':', CAST($key AS VARCHAR))) % $m56)::BIGINT) % 1024)"
      s"""WITH dim AS (
          SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_7'),
        js AS (SELECT unnest(generate_series(0, 2)) AS j),
        bits AS (SELECT DISTINCT ${pos("s_suppkey", "j")} AS pos
          FROM dim CROSS JOIN js),
        probe AS (SELECT l_suppkey, count(*) AS n_rows
          FROM lineitem GROUP BY 1),
        surv AS (SELECT p.* FROM probe p WHERE NOT EXISTS (
          SELECT 1 FROM js WHERE ${pos("p.l_suppkey", "js.j")}
            NOT IN (SELECT pos FROM bits)))
        SELECT s.l_suppkey, s.n_rows,
          CASE WHEN EXISTS (SELECT 1 FROM dim d WHERE d.s_suppkey = s.l_suppkey)
            THEN 1 ELSE 0 END AS hit
        FROM surv s ORDER BY l_suppkey"""
    })

  /** J17: join-size guard — estimate the events×events self-join on
    * user_id from two count-min sketches BEFORE paying its shuffle
    * (Sketches.cmsJoinSize: min over hash rows of the cell-table inner
    * product). This is the pre-flight check for the skew blow-up that
    * j12_salted_join then survives: at 100 TB the exact Σf(k)² needs the
    * full key shuffle this query deliberately avoids — here the exact
    * twin rides along as the labeled truth (est ≥ exact always; the
    * over_pct column is the collision inflation at this d·w geometry).
    * All-integer, so the whole comparison is oracle-exact. */
  val j17JoinGuard = Q(
    "j17_join_guard",
    (s, dir) => {
      val d = 4; val w = 1024
      val ev = Tables.load(s, dir, "events")
      val cells = graft.operators.Sketches.cmsCells(ev, "user_id", d, w)
      // self-join: both sides share ONE sketch build
      val est = graft.operators.Sketches.cmsJoinSize(cells, cells)
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("f"))
        .agg(sum(col("f") * col("f")).as("exact_rows"))
      est.crossJoin(broadcast(exact))
        .select(col("est_rows"), col("exact_rows"),
          expr("(100 * est_rows) div exact_rows").as("over_pct"))
    },
    Some {
      val m56 = graft.operators.Dedup.M56
      def b(key: String, j: String) =
        s"(((md5_number_lower(CONCAT($j, ':', CAST($key AS VARCHAR))) % $m56)::BIGINT) % 1024)"
      s"""WITH js AS (SELECT unnest(generate_series(0, 3)) AS j),
        cells AS (
          SELECT j, ${b("user_id", "j")} AS b, count(*) AS n
          FROM events CROSS JOIN js GROUP BY 1, 2),
        dots AS (
          SELECT a.j, CAST(sum(a.n * b.n) AS BIGINT) AS dot
          FROM cells a JOIN cells b USING (j, b) GROUP BY 1),
        est AS (
          SELECT CAST(coalesce(min(coalesce(dot, 0)), 0) AS BIGINT)
            AS est_rows
          FROM js LEFT JOIN dots USING (j)),
        ex AS (
          SELECT CAST(sum(f * f) AS BIGINT) AS exact_rows FROM (
            SELECT count(*) AS f FROM events GROUP BY user_id))
        SELECT est_rows, exact_rows,
          CAST((100 * est_rows) // exact_rows AS BIGINT) AS over_pct
        FROM est, ex"""
    })

  val all: Seq[Q] = Seq(j2DistinctCount, j3JoinFilterProject, j5Neighborhood,
    j7Anti, j8Semi, j9ZipIndex, j16BloomJoin, j17JoinGuard)
}
