package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Graph

/** Round-2 coverage queries: functions that previously had only unit
  * tests (F3, F9, F11, F13) and the graph degree stats (A6/A7 network
  * shape), each oracle-checked end to end. */
object Coverage {

  /** F3: individual-vs-company classification over synthesized applicant
    * names (reference applicant_processor.py:104-125). Four name shapes
    * per customer exercise every branch: title prefix, corporate suffix,
    * single token, and bare two-word name. */
  val f3Classify = Q(
    "f3_classify",
    (s, dir) => {
      val name = when(col("c_custkey") % 4 === 0, concat(lit("Mr "), col("c_name")))
        .when(col("c_custkey") % 4 === 1, concat(col("c_name"), lit(" Ltd")))
        .when(col("c_custkey") % 4 === 2, col("c_name"))
        .otherwise(concat(lit("John "), col("c_name")))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), name.as("name"))
        .withColumn("applicant_type",
          when(TextFunctions.isLikelyIndividual(col("name")), "individual")
            .otherwise("company"))
    },
    Some(s"""WITH n AS (
        SELECT c_custkey,
          CASE WHEN c_custkey % 4 = 0 THEN 'Mr ' || c_name
               WHEN c_custkey % 4 = 1 THEN c_name || ' Ltd'
               WHEN c_custkey % 4 = 2 THEN c_name
               ELSE 'John ' || c_name END AS name
        FROM customer)
      SELECT c_custkey, name,
        CASE WHEN regexp_matches(name, '(?i)^(mr|mrs|ms|miss|dr|prof)\\.?\\s')
               OR (len(regexp_split_to_array(trim(name), '\\s+')) BETWEEN 2 AND 3
                   AND NOT regexp_matches(name, '${Fuzzy.SuffixReSql}'))
             THEN 'individual' ELSE 'company' END AS applicant_type
      FROM n"""))

  /** F9: officer full name → (first, last) with titles stripped and
    * middle names dropped (reference contact_enrichment.py:270-287).
    * Shapes: plain two-part, titled three-part, single token (→ empty). */
  val f9OfficerSplit = Q(
    "f9_officer_split",
    (s, dir) => {
      val name = when(col("c_custkey") % 3 === 0,
          concat(lit("MR "), col("c_name"), lit(" Smith")))
        .when(col("c_custkey") % 3 === 1,
          concat(lit("Dr. "), col("c_name"), lit(" van Jones")))
        .otherwise(col("c_name"))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), name.as("full_name"))
        .withColumn("s", TextFunctions.splitOfficerName(col("full_name")))
        .select(col("c_custkey"), col("full_name"),
          col("s.first_name"), col("s.last_name"))
    },
    Some("""WITH n AS (
        SELECT c_custkey,
          CASE WHEN c_custkey % 3 = 0 THEN 'MR ' || c_name || ' Smith'
               WHEN c_custkey % 3 = 1 THEN 'Dr. ' || c_name || ' van Jones'
               ELSE c_name END AS full_name
        FROM customer),
      c AS (
        SELECT c_custkey, full_name,
          regexp_split_to_array(trim(regexp_replace(regexp_replace(
            upper(full_name), '\b(MR|MRS|MS|MISS|DR|PROF)\b\.?\s*', '', 'g'),
            '\s+', ' ', 'g')), ' ') AS parts
        FROM n)
      SELECT c_custkey, full_name,
        CASE WHEN len(parts) >= 2
             THEN upper(substring(lower(parts[1]), 1, 1)) || substring(lower(parts[1]), 2)
             ELSE '' END AS first_name,
        CASE WHEN len(parts) >= 2
             THEN upper(substring(lower(parts[-1]), 1, 1)) || substring(lower(parts[-1]), 2)
             ELSE '' END AS last_name
      FROM c"""))

  /** F11: borough normalization — &→and, whitespace collapse, title case,
    * special renames (reference utils.py:323-365). Planted fixtures cover
    * every rename branch plus the generic "And"→"and" rule. */
  val f11Borough = Q(
    "f11_borough",
    (s, dir) => {
      import s.implicits._
      Seq("city of london", "CITY OF WESTMINSTER", "kingston  upon THAMES",
        "richmond upon thames", "Kensington & Chelsea", "barking & dagenham",
        "TOWER  HAMLETS", "hammersmith and fulham")
        .toDF("borough")
        .withColumn("norm", TextFunctions.normalizeBorough(col("borough")))
    },
    Some("""WITH b AS (
        SELECT * FROM (VALUES ('city of london'), ('CITY OF WESTMINSTER'),
          ('kingston  upon THAMES'), ('richmond upon thames'),
          ('Kensington & Chelsea'), ('barking & dagenham'),
          ('TOWER  HAMLETS'), ('hammersmith and fulham')) v(borough)),
      n AS (
        SELECT borough, array_to_string(list_transform(
          string_split(trim(regexp_replace(regexp_replace(lower(borough),
            '\s*&\s*', ' and ', 'g'), '\s+', ' ', 'g')), ' '),
          w -> upper(substring(w, 1, 1)) || substring(w, 2)), ' ') AS cleaned
        FROM b)
      SELECT borough,
        CASE cleaned
          WHEN 'City Of London' THEN 'City of London'
          WHEN 'City Of Westminster' THEN 'Westminster'
          WHEN 'Kingston Upon Thames' THEN 'Kingston upon Thames'
          WHEN 'Richmond Upon Thames' THEN 'Richmond upon Thames'
          WHEN 'Kensington And Chelsea' THEN 'Kensington and Chelsea'
          ELSE regexp_replace(cleaned, ' And ', ' and ', 'g') END AS norm
      FROM n"""))

  /** F13: guess a web domain from a company name — first three
    * informative tokens joined + ".com" (reference utils.py:202-221). */
  val f13Domain = Q(
    "f13_domain",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" Holdings Ltd")).as("name"))
        .withColumn("domain", TextFunctions.guessDomain(col("name"))),
    Some(s"""WITH n AS (
        SELECT c_custkey, c_name || ' Holdings Ltd' AS name FROM customer),
      t AS (
        SELECT c_custkey, name,
          list_filter(string_split(${Fuzzy.normSql(Fuzzy.stripSql("name"))}, ' '),
            t -> length(t) > 0 AND t NOT IN ('the', 'and', 'of', 'a')) AS toks
        FROM n)
      SELECT c_custkey, name, array_to_string(toks[1:3], '') || '.com' AS domain
      FROM t"""))

  /** F8: clean an officer name — flip "LAST, First", strip honorifics,
    * keep first+last token, title-case (reference app.py:805-842). The
    * comma-flip and honorific branches are both exercised. */
  val f8CleanOfficer = Q(
    "f8_clean_officer",
    (s, dir) => {
      val name = when(col("c_custkey") % 3 === 0,
          concat(lit("SMITH, "), col("c_name")))
        .when(col("c_custkey") % 3 === 1,
          concat(lit("Sir "), col("c_name"), lit(" JONES")))
        .otherwise(concat(col("c_name"), lit(" de Vries")))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), name.as("raw"))
        .withColumn("cleaned", TextFunctions.cleanOfficerName(col("raw")))
    },
    Some("""WITH n AS (
        SELECT c_custkey,
          CASE WHEN c_custkey % 3 = 0 THEN 'SMITH, ' || c_name
               WHEN c_custkey % 3 = 1 THEN 'Sir ' || c_name || ' JONES'
               ELSE c_name || ' de Vries' END AS raw
        FROM customer),
      flipped AS (
        SELECT c_custkey, raw,
          CASE WHEN contains(raw, ',')
               THEN trim(split_part(raw, ',', 2)) || ' ' || trim(split_part(raw, ',', 1))
               ELSE raw END AS f
        FROM n),
      toks AS (
        SELECT c_custkey, raw,
          string_split(trim(regexp_replace(
            regexp_replace(f, '(?i)\b(mr|mrs|ms|miss|dr|prof|sir|dame)\.?\s+', '', 'g'),
            '\s+', ' ', 'g')), ' ') AS t
        FROM flipped)
      SELECT c_custkey, raw, array_to_string(list_transform(
          string_split(lower(CASE WHEN len(t) >= 2
            THEN t[1] || ' ' || t[-1]
            ELSE array_to_string(t, ' ') END), ' '),
          w -> upper(substring(w, 1, 1)) || substring(w, 2)), ' ') AS cleaned
      FROM toks"""))

  /** F21+F22: HTML-entity fix and filename sanitize chained (reference
    * api_clients.py:916, utils.py:310-321). */
  val f21Entities = Q(
    "f21_entities_filename",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          concat(lit("A&amp;B&nbsp;"), col("c_name"), lit(" /x:y?.csv")).as("raw"))
        .withColumn("fixed", TextFunctions.fixHtmlEntities(col("raw")))
        .withColumn("fname", TextFunctions.sanitizeFilename(col("fixed"))),
    Some("""WITH n AS (
        SELECT c_custkey, 'A&amp;B&nbsp;' || c_name || ' /x:y?.csv' AS raw
        FROM customer),
      f AS (
        SELECT c_custkey, raw,
          replace(replace(raw, '&amp;', '&'), '&nbsp;', ' ') AS fixed
        FROM n)
      SELECT c_custkey, raw, fixed,
        substring(regexp_replace(fixed, '[^A-Za-z0-9._-]', '_', 'g'), 1, 100) AS fname
      FROM f"""))

  /** A17: exact percentiles per group — the monitoring dashboard's
    * latency-quantile shape (reference automation_monitoring.py rollups).
    * Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    * interpolating branch bit-for-bit (verified on every lo≠hi case at
    * three SFs), but they differ on RANK NEIGHBORS WITH EQUAL VALUES:
    * Spark short-circuits to that value exactly, while quantile_cont
    * still evaluates lo·(1−f)+hi·f, which need not round back to lo
    * (caught by the sf1 oracle slice at 10× data: p99 landed between
    * two equal 230.53s and DuckDB said 230.53000000000003). The oracle
    * therefore selects each percentile's two rank-neighbor values and
    * replays Spark's short-circuit: equal → the value itself, else
    * quantile_cont's (identical) interpolation. At 100 TB swap in
    * percentile_approx (t-digest) — approximate results are engine-
    * specific, which is exactly why the EXACT variant is the oracle. */
  val a17Percentiles = Q(
    "a17_percentiles",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(expr("percentile(value, 0.5D)").as("p50"),
          expr("percentile(value, 0.9D)").as("p90"),
          expr("percentile(value, 0.99D)").as("p99")),
    Some("""WITH c AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      r AS (
        SELECT event_type, value,
          row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn
        FROM events),
      b AS (
        SELECT c.event_type, p.pq,
          max(CASE WHEN r.rn = CAST(floor(p.pq * (c.n - 1)) AS BIGINT)
              THEN r.value END) AS lo,
          max(CASE WHEN r.rn = CAST(ceil(p.pq * (c.n - 1)) AS BIGINT)
              THEN r.value END) AS hi
        FROM c
        CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS pq) p
        JOIN r ON r.event_type = c.event_type
        GROUP BY 1, 2),
      w AS (
        SELECT event_type,
          max(CASE WHEN pq = 0.5 THEN lo END) AS lo50,
          max(CASE WHEN pq = 0.5 THEN hi END) AS hi50,
          max(CASE WHEN pq = 0.9 THEN lo END) AS lo90,
          max(CASE WHEN pq = 0.9 THEN hi END) AS hi90,
          max(CASE WHEN pq = 0.99 THEN lo END) AS lo99,
          max(CASE WHEN pq = 0.99 THEN hi END) AS hi99
        FROM b GROUP BY 1),
      q AS (
        SELECT event_type,
          quantile_cont(value, 0.5) AS q50,
          quantile_cont(value, 0.9) AS q90,
          quantile_cont(value, 0.99) AS q99
        FROM events GROUP BY 1)
      SELECT q.event_type,
        CASE WHEN w.lo50 = w.hi50 THEN w.lo50 ELSE q.q50 END AS p50,
        CASE WHEN w.lo90 = w.hi90 THEN w.lo90 ELSE q.q90 END AS p90,
        CASE WHEN w.lo99 = w.hi99 THEN w.lo99 ELSE q.q99 END AS p99
      FROM q JOIN w ON q.event_type = w.event_type"""))

  /** J12: the skew-salted join — result-identical to the plain join
    * (which is the oracle), with the left side's hot keys spread over
    * salt buckets. Exercises Skew.saltedJoin in the verified set. */
  val j12Salted = Q(
    "j12_salted_join",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      val dim = Tables.load(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.operators.Skew.saltedJoin(l, dim, "l_partkey", salts = 8)
        .groupBy("p_brand").agg(
          count(lit(1)).as("n"),
          graft.queries.Q.dsum(col("l_quantity")).as("sum_qty"))
    },
    Some("""SELECT p.p_brand, count(*) AS n,
        CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1"""))

  /** A6/A7 network stats: degree distribution over the shared-key edge
    * table (reference database.py:964-983). Edges come from the same
    * join-free build as j4 (Graph.sharedKeyEdges). */
  val gDegrees = Q(
    "g_degrees",
    (s, dir) =>
      // The oracle has no group-size cap, so the served view is built
      // capless too (sharedEdgesView) — semantically identical to the
      // edge CTE; weight >= 2 is a pushed parquet filter on the view.
      Graph.degrees(Graph.sharedEdgesView(s, dir)),
    Some("""WITH ld AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
        FROM ld a JOIN ld b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT item, count(*) AS degree FROM (
        SELECT item_a AS item FROM edges
        UNION ALL SELECT item_b FROM edges)
      GROUP BY 1"""))

  /** G14: HYPERBALL — the neighborhood function N(t) of the
    * co-purchase graph via per-node HLL counters max-merged along
    * edges ([[graft.operators.Graph.hyperBall]]; Boldi & Vigna 2013,
    * the "four degrees of separation" algorithm). Exact per-node balls
    * need a BFS per node; the sketch costs |E|·registers per round at
    * ANY ball size — the canonical sketch-for-scale trade, and every
    * register is the oracle-exact hash56 HLL geometry, so the whole
    * iteration replays in SQL: same registers, same max-merges, same
    * 64-literal linear-counting estimates, per-node values summed in
    * 1e-3 fixed point (BIGINT — order-independent cross-engine). At
    * t-small the balls sit squarely in the linear-counting range, so
    * this is also the round-12 small-range branch exercised at
    * thousands-of-groups scale. */
  val gHyperball = Q(
    "g_hyperball",
    (s, dir) =>
      Graph.hyperBall(Graph.sharedEdgesView(s, dir), rounds = 3)
        .orderBy("hop"),
    Some(hyperballOracleSql(3)))

  /** G17: SAMPLED BETWEENNESS CENTRALITY — Brandes' two-pass dependency
    * accumulation from a deterministic 8-source sample, depth-bounded
    * at 4 hops, δ in 1e-6 fixed point with per-edge floors
    * ([[graft.operators.Graph.betweennessSampled]]) — "which items
    * broker the co-purchase graph", the path-centrality complement of
    * PageRank (flow through you, not mass arriving at you). Every
    * quantity the engines exchange is an integer: σ path counts by
    * construction, δ6 because the division floors per edge — so the
    * top-20 ranking has no float anywhere. The oracle unrolls both
    * passes as CTE chains (the hyperball replay discipline). */
  val gBetweenness = Q(
    "g_betweenness",
    (s, dir) =>
      Graph.betweennessSampled(Graph.sharedEdgesView(s, dir),
        nSources = 8, depth = 4, topK = 20),
    Some(betweennessOracleSql(nSources = 8, depth = 4, topK = 20)))

  /** DuckDB replay of [[graft.operators.Graph.betweennessSampled]]:
    * unrolled forward σ levels + backward fixed-point δ levels. Every
    * unrolled CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    * level here is referenced by every later level's settled-set check
    * — inlined, the chain re-evaluates exponentially (measured: the
    * sf0.1 replay spilled >60 GB before being killed; materialized it
    * answers in seconds). */
  private def betweennessOracleSql(nSources: Int, depth: Int,
      topK: Int): String = {
    val fwd = (1 to depth).map { t =>
      s"""f$t AS MATERIALIZED (
        SELECT c.s, c.node, CAST(sum(c.sigma) AS BIGINT) AS sigma
        FROM (
          SELECT f.s, e.dst AS node, f.sigma
          FROM f${t - 1} f JOIN und e ON f.node = e.src) c
        WHERE NOT EXISTS (
          SELECT 1 FROM (${(0 until t).map(i => s"SELECT s, node FROM f$i")
            .mkString(" UNION ALL ")}) p
          WHERE p.s = c.s AND p.node = c.node)
        GROUP BY 1, 2)"""
    }.mkString(",\n      ")
    val bwd = (depth - 1 to 1 by -1).map { t =>
      val dwJoin = if (t == depth - 1)
        s"LEFT JOIN (SELECT s, node, CAST(0 AS BIGINT) AS d6 FROM f$depth) dw"
      else
        s"LEFT JOIN d${t + 1} dw"
      s"""d$t AS MATERIALIZED (
        SELECT cur.s, cur.node,
          CAST(sum(CAST(cur.sigma AS HUGEINT) * (1000000 + coalesce(dw.d6, 0))
            // succ.sigma) AS BIGINT) AS d6
        FROM f$t cur
        JOIN und e ON cur.node = e.src
        JOIN f${t + 1} succ ON succ.s = cur.s AND succ.node = e.dst
        $dwJoin ON dw.s = cur.s AND dw.node = e.dst
        GROUP BY 1, 2)"""
    }.mkString(",\n      ")
    val bUnion = (1 to depth - 1).map(t => s"SELECT node, d6 FROM d$t")
      .mkString(" UNION ALL ")
    s"""WITH ld AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS MATERIALIZED (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
        FROM ld a JOIN ld b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      und AS MATERIALIZED (
        SELECT item_a AS src, item_b AS dst FROM edges
        UNION ALL SELECT item_b, item_a FROM edges),
      f0 AS MATERIALIZED (
        SELECT node AS s, node, CAST(1 AS BIGINT) AS sigma
        FROM (SELECT src AS node FROM und GROUP BY 1
              ORDER BY count(*) DESC, node LIMIT $nSources)),
      $fwd,
      $bwd
      SELECT node, CAST(sum(d6) AS BIGINT) AS b6
      FROM ($bUnion)
      GROUP BY 1 ORDER BY b6 DESC, node LIMIT $topK"""
  }

  /** DuckDB replay of [[graft.operators.Graph.hyperBall]]: unrolled
    * register init + `rounds` max-merge rounds + per-round estimates. */
  private def hyperballOracleSql(rounds: Int): String = {
    val m56 = graft.operators.Dedup.M56
    val w = graft.operators.Sketches.HllW
    val zs = graft.operators.Sketches.HllZScale
    val lc = graft.operators.Sketches.hllLinearCaseSql
    val mergeRounds = (1 to rounds).map { t =>
      s"""r$t AS (
        SELECT node, bucket, max(reg) AS reg FROM (
          SELECT node, bucket, reg FROM r${t - 1}
          UNION ALL
          SELECT u.src AS node, r.bucket, r.reg
          FROM und u JOIN r${t - 1} r ON r.node = u.dst)
        GROUP BY 1, 2)"""
    }.mkString(",\n      ")
    val ests = (0 to rounds).map { t =>
      s"""e$t AS (
        SELECT CAST($t AS BIGINT) AS hop, count(*) AS n_nodes,
          CAST(sum(CAST(floor(est * 1000) AS BIGINT)) AS BIGINT)
            AS ball_milli
        FROM (
          SELECT CASE WHEN raw_e <= CAST(160 AS DOUBLE) AND nb < 64
                 THEN $lc ELSE raw_e END AS est
          FROM (
            SELECT node, nb,
              CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) *
                CAST($zs AS DOUBLE) /
                CAST(zp + (64 - nb) * $zs AS DOUBLE) AS raw_e
            FROM (
              SELECT node,
                CAST(sum(CAST(1 AS BIGINT) << CAST(51 - reg AS INT))
                  AS BIGINT) AS zp,
                count(*) AS nb
              FROM r$t GROUP BY 1))))"""
    }.mkString(",\n      ")
    val unionAll = (0 to rounds).map(t => s"SELECT * FROM e$t")
      .mkString(" UNION ALL ")
    s"""WITH ld AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
        FROM ld a JOIN ld b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      und AS (
        SELECT item_a AS src, item_b AS dst FROM edges
        UNION ALL SELECT item_b, item_a FROM edges),
      nodes AS (SELECT DISTINCT src AS node FROM und),
      r0 AS (
        SELECT node, h // $w AS bucket,
          max(CASE WHEN h % $w = 0 THEN 51
              ELSE 51 - length(bin(h % $w)) END) AS reg
        FROM (
          SELECT node,
            ((md5_number_lower(CAST(node AS VARCHAR)) % $m56)::BIGINT) AS h
          FROM nodes)
        GROUP BY 1, 2),
      $mergeRounds,
      $ests
      $unionAll ORDER BY hop"""
  }

  /** G15: DETERMINISTIC RANDOM WALKS ([[graft.operators.Graph
    * .randomWalks]]) — the DeepWalk/node2vec corpus generator run as a
    * query: one 4-step walk per mod-97 seed over the co-purchase
    * graph, step t picking neighbor hash56(walk ':' t) mod degree
    * under sorted neighbor order. Because the "randomness" is the
    * engine-portable hash, DuckDB replays every walk EXACTLY — the
    * same property that makes a production walk corpus resumable
    * after a failure without re-dealing different walks. */
  val gRandomWalks = Q(
    "g_random_walks",
    (s, dir) => {
      val edges = Graph.sharedEdgesView(s, dir)
      val nodes = edges.select(col("item_a").as("node"))
        .unionByName(edges.select(col("item_b").as("node"))).distinct()
      Graph.randomWalks(edges, nodes.filter(col("node") % 97 === 0),
          steps = 4)
        .orderBy("walk", "step")
    },
    Some {
      val m56 = graft.operators.Dedup.M56
      def stepCte(t: Int) =
        s"""w$t AS (
          SELECT w.walk, a.dst AS node
          FROM w${t - 1} w
          JOIN deg d ON d.src = w.node
          JOIN adj a ON a.src = w.node AND a.pos =
            ((md5_number_lower(CAST(w.walk AS VARCHAR) || ':$t') % $m56)::BIGINT)
              % d.deg)"""
      val steps = (1 to 4).map(stepCte).mkString(",\n      ")
      val unions = (0 to 4)
        .map(t => s"SELECT walk, CAST($t AS BIGINT) AS step, node FROM w$t")
        .mkString(" UNION ALL ")
      s"""WITH ld AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
          SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
          FROM ld a JOIN ld b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        und AS (
          SELECT item_a AS src, item_b AS dst FROM edges
          UNION ALL SELECT item_b, item_a FROM edges),
        adj AS (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS pos
          FROM und),
        deg AS (SELECT src, count(*) AS deg FROM und GROUP BY 1),
        w0 AS (
          SELECT node AS walk, node FROM (SELECT DISTINCT src AS node FROM und)
          WHERE node % 97 = 0),
        $steps
        $unions ORDER BY walk, step"""
    })

  /** G16: WALK-CONTEXT AFFINITY — the skip-gram statistic over the
    * g_random_walks corpus: every (center, context) node pair within
    * window 2 along a walk, scored by the integer PMI ratio
    * c_ab·T·10⁶ div (c_a·c_b) (ln is monotone, so the ratio IS the PMI
    * order — the txt_collocations trick; no transcendental needed).
    * This is what a node-embedding trainer consumes: pairs + marginals
    * are exactly word2vec's positive examples and unigram table, so
    * the query is the "did the corpus generator produce trainable
    * structure" check run as ONE plan. Shape: walks re-derived (bounded
    * iterative joins), then ONE groupBy(walk) collects each ≤5-step
    * walk to an array and in-row `transform`/`slice` explodes the ≤7
    * window pairs — no self-join of the walk table, no window function;
    * marginal counts are two more map-side-combined groupBys over the
    * pair frame and a 1-row total broadcast. */
  val gWalkPairs = Q(
    "g_walk_pairs",
    (s, dir) => {
      val edges = Graph.sharedEdgesView(s, dir)
      val nodes = edges.select(col("item_a").as("node"))
        .unionByName(edges.select(col("item_b").as("node"))).distinct()
      val w = Graph.randomWalks(edges, nodes.filter(col("node") % 97 === 0),
        steps = 4)
      val pairs = w.groupBy("walk")
        .agg(array_sort(collect_list(struct(col("step"), col("node"))))
          .as("st"))
        .select(explode(expr(
          """flatten(transform(st, (x, i) ->
               transform(slice(st, i + 2, 2),
                         y -> struct(x.node AS a, y.node AS b))))"""))
          .as("p"))
        .select(col("p.a"), col("p.b"))
        // four aggregates read the pair frame; checkpoint truncates the
        // walk's iterative-join lineage so the walk computes ONCE, not
        // once per marginal (the txt_dsir discipline; frame ∝ walks)
        .localCheckpoint()
      val cnt = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val ca = pairs.groupBy("a").agg(count(lit(1)).as("c_a"))
      val cb = pairs.groupBy("b").agg(count(lit(1)).as("c_b"))
      val t = pairs.agg(count(lit(1)).as("t_pairs"))
      cnt.join(ca, "a").join(cb, "b").crossJoin(broadcast(t))
        .select(col("a"), col("b"), col("c_ab"),
          expr("(c_ab * t_pairs * 1000000) div (c_a * c_b)").as("aff6"))
        .orderBy(desc("aff6"), col("a"), col("b"))
        .limit(25)
    },
    Some {
      val m56 = graft.operators.Dedup.M56
      def stepCte(t: Int) =
        s"""w$t AS (
          SELECT w.walk, a.dst AS node
          FROM w${t - 1} w
          JOIN deg d ON d.src = w.node
          JOIN adj a ON a.src = w.node AND a.pos =
            ((md5_number_lower(CAST(w.walk AS VARCHAR) || ':$t') % $m56)::BIGINT)
              % d.deg)"""
      val steps = (1 to 4).map(stepCte).mkString(",\n      ")
      val unions = (0 to 4)
        .map(t => s"SELECT walk, CAST($t AS BIGINT) AS step, node FROM w$t")
        .mkString(" UNION ALL ")
      s"""WITH ld AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
          SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
          FROM ld a JOIN ld b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        und AS (
          SELECT item_a AS src, item_b AS dst FROM edges
          UNION ALL SELECT item_b, item_a FROM edges),
        adj AS (
          SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS pos
          FROM und),
        deg AS (SELECT src, count(*) AS deg FROM und GROUP BY 1),
        w0 AS (
          SELECT node AS walk, node FROM (SELECT DISTINCT src AS node FROM und)
          WHERE node % 97 = 0),
        $steps,
        walks AS ($unions),
        pairs AS (
          SELECT p1.node AS a, p2.node AS b
          FROM walks p1 JOIN walks p2 ON p1.walk = p2.walk
            AND p2.step > p1.step AND p2.step <= p1.step + 2),
        cnt AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
        ca AS (SELECT a, count(*) AS c_a FROM pairs GROUP BY 1),
        cb AS (SELECT b, count(*) AS c_b FROM pairs GROUP BY 1),
        t AS (SELECT count(*) AS t_pairs FROM pairs)
        SELECT a, b, c_ab,
          (c_ab * t_pairs * 1000000) // (c_a * c_b) AS aff6
        FROM cnt JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN t
        ORDER BY aff6 DESC, a, b LIMIT 25"""
    })

  /** G4: multi-source BFS hop distance (Graph.bfsHops) over the same
    * co-purchase graph as g_degrees — seeds are partkeys ≡ 0 mod 97,
    * output is every node within 3 hops with its first-discovery (=
    * minimum) hop. The oracle is a recursive CTE whose UNION-dedup
    * bounds each level at |nodes| rows, closed with min(hop) — the
    * declarative restatement of the frontier invariant. */
  val gBfs = Q(
    "g_bfs",
    (s, dir) => {
      val edges = Graph.sharedEdgesView(s, dir)
      val nodes = edges.select(col("item_a").as("node"))
        .unionByName(edges.select(col("item_b").as("node"))).distinct()
      val seeds = nodes.filter(col("node") % 97 === 0)
      Graph.bfsHops(edges, seeds, maxHops = 3).orderBy("node")
    },
    Some("""WITH RECURSIVE ld AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
        FROM ld a JOIN ld b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      und AS (
        SELECT item_a AS src, item_b AS dst FROM edges
        UNION ALL SELECT item_b, item_a FROM edges),
      nodes AS (SELECT DISTINCT src AS node FROM und),
      bfs(node, hop) AS (
        SELECT node, 0 FROM nodes WHERE node % 97 = 0
        UNION
        SELECT u.dst, b.hop + 1 FROM bfs b JOIN und u ON u.src = b.node
        WHERE b.hop < 3)
      SELECT node, CAST(min(hop) AS BIGINT) AS hop
      FROM bfs GROUP BY node ORDER BY node"""))

  /** G6: bounded-horizon WEIGHTED shortest paths (Graph.ssspFixed) over
    * the co-purchase graph, edge cost = tie WEAKNESS
    * (9 − min(n_shared, 8) ∈ [1,7]): a 2-hop route through strong ties
    * can beat a direct weak tie, which is what separates this from
    * g_bfs's hop count. Seeds are the mod-97 partkeys; 3 relaxation
    * rounds = exact cheapest cost over paths of ≤3 edges. All-integer,
    * and the oracle unrolls the same three rounds as chained
    * min-combine CTEs. */
  val gSssp = Q(
    "g_sssp",
    (s, dir) => {
      val ld = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val edges = ld.as("a")
        .join(ld.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("item_a"),
          col("b.l_partkey").as("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .select(col("item_a"), col("item_b"),
          (lit(9L) - least(col("n_shared"), lit(8L))).as("w"))
      val nodes = edges.select(col("item_a").as("node"))
        .unionByName(edges.select(col("item_b").as("node"))).distinct()
      Graph.ssspFixed(edges, nodes.filter(col("node") % 97 === 0),
        iters = 3).orderBy("node")
    },
    Some {
      def relax(prev: String) =
        s"""SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
          SELECT node, dist FROM $prev
          UNION ALL
          SELECT u.dst AS node, r.dist + u.w AS dist
          FROM $prev r JOIN und u ON u.src = r.node) GROUP BY node"""
      s"""WITH ld AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
          9 - least(count(*), 8) AS w
        FROM ld a JOIN ld b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      und AS (
        SELECT item_a AS src, item_b AS dst, w FROM edges
        UNION ALL SELECT item_b, item_a, w FROM edges),
      nodes AS (SELECT DISTINCT src AS node FROM und),
      d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
        WHERE node % 97 = 0),
      d1 AS (${relax("d0")}),
      d2 AS (${relax("d1")}),
      d3 AS (${relax("d2")})
      SELECT node, dist FROM d3 ORDER BY node"""
    })

  /** G5: personalized PageRank from the mod-97 seed set over the
    * co-purchase graph (Graph.personalizedPagerankFixed) — "parts that
    * matter to THIS portfolio", vs g_pagerank's global importance.
    * Integer 10⁻¹² units; the oracle unrolls the 3 iterations as
    * chained CTEs with the same LEFT-join-keeps-seeds shape. */
  val gPpr = Q(
    "g_ppr",
    (s, dir) => {
      val edges = Graph.sharedEdgesView(s, dir)
      val nodes = edges.select(col("item_a").as("node"))
        .unionByName(edges.select(col("item_b").as("node"))).distinct()
      Graph.personalizedPagerankFixed(edges,
          nodes.filter(col("node") % 97 === 0), iters = 3)
        .orderBy("node")
    },
    Some {
      def step(prev: String) =
        s"""SELECT n.node,
          n.is_seed * 150000000000
            + CAST((85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
        FROM nodes n LEFT JOIN (
          SELECT d.dst, CAST(sum(r.pr // g.deg) AS BIGINT) AS s
          FROM d JOIN deg g USING (src) JOIN $prev r ON r.node = d.src
          GROUP BY 1) c ON c.dst = n.node"""
      s"""WITH ld AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
          SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
          FROM ld a JOIN ld b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        d AS (
          SELECT item_a AS src, item_b AS dst FROM e
          UNION ALL SELECT item_b, item_a FROM e),
        deg AS (SELECT src, count(*) AS deg FROM d GROUP BY 1),
        nodes AS (
          SELECT src AS node,
            CASE WHEN src % 97 = 0 THEN 1 ELSE 0 END AS is_seed
          FROM deg),
        r0 AS (SELECT node, is_seed * 1000000000000 AS pr FROM nodes),
        r1 AS (${step("r0")}),
        r2 AS (${step("r1")}),
        r3 AS (${step("r2")})
      SELECT node, CAST(pr AS BIGINT) AS pr FROM r3 ORDER BY node"""
    })

  /** A18: sketch aggregates — HyperLogLog++ distinct counts and t-digest
    * quantiles per group. These are THE at-scale forms of A6/A17 (exact
    * distinct shuffles every key; exact percentile sorts every value;
    * the sketches are fixed-size mergeable state). The sketch VALUES
    * are engine-private (DuckDB's approx_count_distinct would
    * legitimately differ), so the oracle verifies the sketches'
    * CONTRACT instead: per group, the HLL estimate must land within 10%
    * of the exact distinct count (rsd=0.02 → 5σ headroom) and the
    * approximate median inside the exact [p40, p60] band (accuracy
    * 10000 → near-exact). The EXACT sides (xu, p40, p60) are emitted
    * alongside the ok flags and the oracle recomputes them in DuckDB —
    * so the tolerance comparison's inputs are cross-engine-verified
    * (percentile vs quantile_cont bit-exactness is a17's proven pair),
    * and a Spark bug that compared approx-to-approx would hash-mismatch
    * on the exact columns rather than silently asserting TRUE. A sketch
    * drifting out of tolerance is a driver-visible hash mismatch on the
    * flags. The instrument pays the exact-twin cost to verify;
    * production uses only the sketch line (a6/a17 remain the exact
    * forms, a26 the oracle-EXACT mergeable sketch). */
  val a18Sketches = Q(
    "a18_sketches",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("ap"),
          countDistinct(col("user_id")).as("xu"),
          expr("percentile(value, 0.4D)").as("p40"),
          expr("percentile(value, 0.6D)").as("p60"))
        .select(col("event_type"), col("xu"), col("p40"), col("p60"),
          (abs(col("au") - col("xu")) <= col("xu") * 0.1).as("hll_ok"),
          col("ap").between(col("p40"), col("p60")).as("p50_ok"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
        count(DISTINCT user_id) AS xu,
        quantile_cont(value, 0.4) AS p40,
        quantile_cont(value, 0.6) AS p60,
        TRUE AS hll_ok, TRUE AS p50_ok
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** A26: KMV distinct-count sketch — a18's ORACLE-EXACT sibling. HLL
    * register state is engine-private (a18 stays rows-only by design);
    * KMV's state is "the k smallest hash56 values", which both engines
    * compute bit-identically, so a genuine bounded-memory mergeable
    * sketch gets full value verification. k=64 → ~12.5% standard error,
    * pinned against exact counts in OperatorsSpec. Shuffle volume is
    * groups×64 longs — no full distinct shuffle (a6 is the exact twin
    * that pays it). */
  val a26KmvSketch = Q(
    "a26_kmv_sketch",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          graft.operators.Dedup.hash56(col("user_id").cast("string")).as("h"))
        .groupBy("event_type")
        .agg(graft.operators.Sketches.kmv(64)(col("h")).as("kmv"))
        .select(col("event_type"),
          graft.operators.Sketches.estimate("kmv", 64).as("kmv_users"))
        .orderBy("event_type"),
    Some(s"""WITH h AS (
        SELECT DISTINCT event_type,
          ((md5_number_lower(CAST(user_id AS VARCHAR)) % ${graft.operators.Dedup.M56})::BIGINT) AS hv
        FROM events),
      r AS (
        SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h)
      SELECT event_type,
        CASE WHEN count(*) < 64 THEN count(*)
             ELSE ${63L * graft.operators.Dedup.M56} // max(hv) END AS kmv_users
      FROM r WHERE rn <= 64
      GROUP BY event_type ORDER BY event_type"""))

  /** A42: HyperLogLog with EXPLICIT registers — the industry-standard
    * distinct sketch made oracle-EXACT by keeping the registers as
    * plain (group, bucket, reg) rows over hash56 (Spark's own
    * approx_count_distinct is engine-private — a18's limit). Built as
    * the m18 maintenance recipe: a stored sketch (events %10 < 8) and a
    * batch sketch (%10 ≥ 8) MERGE by register max, and the oracle
    * rebuilds registers over ALL events — equal because max-merge is
    * the sketch's union. The harmonic sum is exact 2^51 fixed point;
    * the only float ops are one multiply chain and one division of
    * exact integers, bit-identical cross-engine. */
  val a42Hll = Q(
    "a42_hll",
    (s, dir) => {
      import graft.operators.Sketches
      val e = Tables.load(s, dir, "events")
      val stored = Sketches.hllRegisters(
        e.filter(col("event_id") % 10 < 8), "event_type", "user_id")
      val batch = Sketches.hllRegisters(
        e.filter(col("event_id") % 10 >= 8), "event_type", "user_id")
      Sketches.hllEstimate(Sketches.hllMerge(stored, batch))
        .select(col("grp").as("event_type"), col("hll_est"))
        .orderBy("event_type")
    },
    Some(hllOracleSql("")))

  /** DuckDB replay of the full register→estimate chain of
    * [[graft.operators.Sketches.hllRegisters]]/[[Sketches.hllEstimate]]
    * over `events`, optionally row-filtered — shared by a42 (mid-range)
    * and a46 (small-range/linear-counting branch). */
  private def hllOracleSql(where: String): String =
    s"""WITH h AS (
        SELECT event_type,
          ((md5_number_lower(CAST(user_id AS VARCHAR)) % ${graft.operators.Dedup.M56})::BIGINT) AS h
        FROM events $where),
      b AS (
        SELECT event_type, h // ${graft.operators.Sketches.HllW} AS bucket,
          h % ${graft.operators.Sketches.HllW} AS w
        FROM h),
      regs AS (
        SELECT event_type, bucket,
          max(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END) AS reg
        FROM b GROUP BY 1, 2),
      z AS (
        SELECT event_type,
          CAST(sum(CAST(1 AS BIGINT) << CAST(51 - reg AS INT)) AS BIGINT) AS zp,
          count(*) AS nb
        FROM regs GROUP BY 1),
      raw AS (
        SELECT event_type, nb,
          CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) *
            CAST(${graft.operators.Sketches.HllZScale} AS DOUBLE) /
            CAST(zp + (64 - nb) * ${graft.operators.Sketches.HllZScale} AS DOUBLE)
            AS raw_e
        FROM z)
      SELECT event_type,
        CASE WHEN raw_e <= CAST(160 AS DOUBLE) AND nb < 64
             THEN ${graft.operators.Sketches.hllLinearCaseSql}
             ELSE raw_e END AS hll_est
      FROM raw ORDER BY event_type"""

  /** A46: the HLL SMALL-RANGE branch, oracle-proven — per-group
    * distinct users capped at a dozen, so the raw α·m²/Z estimator
    * reads well under 2.5·m and the Flajolet §4 linear-counting
    * correction m·ln(m/V) fires for every group. The ln lands in a
    * 64-literal CASE ([[graft.operators.Sketches.hllLinearCaseSql]]),
    * so the correction — a transcendental in the textbook — is
    * hash-exact cross-engine here, not approximately tested. Without
    * the round-12 correction this query's estimates would sit ~8-20%
    * low; with it the registry proves the branch point AND both sides
    * of it. */
  val a46HllSmall = Q(
    "a46_hll_small",
    (s, dir) => {
      import graft.operators.Sketches
      val e = Tables.load(s, dir, "events").filter(col("user_id") < 12)
      Sketches.hllEstimate(
          Sketches.hllRegisters(e, "event_type", "user_id"))
        .select(col("grp").as("event_type"), col("hll_est"))
        .orderBy("event_type")
    },
    Some(hllOracleSql("WHERE user_id < 12")))

  /** A29: KMV sketch SET ALGEBRA — the property that makes sketches a
    * warehouse primitive: two independently-built user sketches (click
    * users, purchase users) answer union AND intersection cardinality
    * ("users who did both") with no re-scan and no distinct shuffle —
    * union = k smallest of the combined arrays, intersection via the
    * Beyer et al. 2007 Jaccard-over-union-sketch estimator, exact while
    * the union sketch hasn't filled. Everything is integer arithmetic
    * over hashes both engines compute identically, so the whole algebra
    * is oracle-EXACT (contrast intersect-of-HLL, which is engine-private
    * AND estimator-unstable). The two segments are modular user slices
    * (every user fires every event type in the synthetic stream, so
    * type-only sets would coincide): A = click users with even id
    * (|A| = N/2), B = purchase users with id ≡ 0 mod 3 (|B| = N/3),
    * true overlap = N/6 — partial by construction, invisible to the
    * hashes. At sf0.001 the sketches never fill and the exact branch
    * runs; at sf0.1 the estimator branch does — both verified (and the
    * estimator's accuracy vs ground truth is pinned in OperatorsSpec).
    * Measured honestly at sf0.1 (truth 750/500/1000/250): estimates
    * 765/433/950/118 — cardinalities inside the ~12.5% k=64 envelope;
    * the intersection's ρ draw (8/64 vs E=16/64) is ~2σ low on this
    * fixed hash draw, which is WHY production set-intersection sketches
    * run k in the thousands (error ∝ 1/√k; the operator takes k as a
    * parameter — this query pins the small-k geometry the oracle can
    * replay cheaply). */
  private def mkKmvSetops(name: String, k: Int): Q = Q(
    name,
    (s, dir) => {
      import graft.operators.{Sketches => K}
      val sk = Tables.load(s, dir, "events")
        .filter((col("event_type") === "click" && col("user_id") % 2 === 0) ||
          (col("event_type") === "purchase" && col("user_id") % 3 === 0))
        .select(when(col("event_type") === "click", "a").otherwise("b").as("seg"),
          graft.operators.Dedup.hash56(col("user_id").cast("string")).as("h"))
        .groupBy("seg").agg(K.kmv(k)(col("h")).as("kmv"))
      sk.agg(
          first(when(col("seg") === "a", col("kmv")),
            ignoreNulls = true).as("kmv_a"),
          first(when(col("seg") === "b", col("kmv")),
            ignoreNulls = true).as("kmv_b"))
        .withColumn("kmv_u", K.kmvUnion(col("kmv_a"), col("kmv_b"), k))
        .select(
          lit("click_even").as("set_a"), lit("purchase_mod3").as("set_b"),
          K.estimate("kmv_a", k).as("a_users"),
          K.estimate("kmv_b", k).as("b_users"),
          K.estimate("kmv_u", k).as("union_users"),
          K.kmvIntersectEstimate("kmv_u", "kmv_a", "kmv_b", k)
            .as("inter_users"))
    },
    Some {
      val m56 = graft.operators.Dedup.M56
      // BigInt: beyond k=128 the scale literal exceeds Long; DuckDB
      // parses the wide literal as HUGEINT and `//` stays exact
      val scale = BigInt(k - 1) * m56
      def kminCte(name: String, where: String) =
        s"""$name AS (
          SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM (
            SELECT DISTINCT
              ((md5_number_lower(CAST(user_id AS VARCHAR)) % $m56)::BIGINT) AS hv
            FROM events WHERE $where))"""
      s"""WITH ${kminCte("ra", "event_type = 'click' AND user_id % 2 = 0")},
        ${kminCte("rb", "event_type = 'purchase' AND user_id % 3 = 0")},
        ta AS (SELECT hv FROM ra WHERE rn <= $k),
        tb AS (SELECT hv FROM rb WHERE rn <= $k),
        tm AS (
          SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM (
            SELECT DISTINCT hv FROM (
              SELECT hv FROM ta UNION ALL SELECT hv FROM tb))),
        m AS (SELECT hv FROM tm WHERE rn <= $k),
        est AS (
          SELECT
            (SELECT CASE WHEN count(*) < $k THEN count(*)
                    ELSE $scale // max(hv) END FROM ta) AS a_users,
            (SELECT CASE WHEN count(*) < $k THEN count(*)
                    ELSE $scale // max(hv) END FROM tb) AS b_users,
            (SELECT CASE WHEN count(*) < $k THEN count(*)
                    ELSE $scale // max(hv) END FROM m) AS union_users,
            (SELECT count(*) FROM m
             WHERE hv IN (SELECT hv FROM ta)
               AND hv IN (SELECT hv FROM tb)) AS n_common,
            (SELECT count(*) FROM m) AS m_size)
        SELECT 'click_even' AS set_a, 'purchase_mod3' AS set_b,
          CAST(a_users AS BIGINT) AS a_users,
          CAST(b_users AS BIGINT) AS b_users,
          CAST(union_users AS BIGINT) AS union_users,
          CAST(CASE WHEN m_size < $k THEN n_common
               ELSE (n_common * union_users) // $k END AS BIGINT)
            AS inter_users
        FROM est"""
    })

  val a29KmvSetops = mkKmvSetops("a29_kmv_setops", 64)

  /** A41: the a29 set algebra at k=256 — the "run k in the thousands"
    * remedy a29's doc prescribes, MEASURED instead of argued (round-11
    * verdict #8). Error ∝ 1/√k: the k=64 sketch's ~2σ-low intersection
    * draw (118 vs truth 250 at sf0.1) tightens into the ~6% envelope
    * at k=256. k=1024 would be vacuous at every test scale — the union
    * sketch never fills (≤1000 distinct users at sf0.1), so the exact
    * branch runs and there is no estimator error to measure; 256 is
    * the largest power-of-two k whose estimator branch actually fires
    * at sf0.1. Measured at sf0.1 (truth a=750, b=500, union=1000,
    * inter=250): k=64 → 765/433/950/118; k=256 → 719/471/958/209 —
    * the intersection error collapses 53% → 16% (≈ the 4× sample
    * growth's √-law prediction: the ρ term's σ shrinks 2×, and the
    * k=64 draw sat ~2σ low) and every cardinality stays inside its
    * envelope. Beyond [[graft.operators.Sketches.MaxLongK]] the
    * (k−1)·2^56 scale no longer fits a signed long; the estimate
    * arithmetic routes through DECIMAL(38,0)/HUGEINT — same integers,
    * still hash-exact, which is what this query pins. */
  val a41KmvSetops256 = mkKmvSetops("a41_kmv_setops_k256", 256)

  /** A54: SPEARMAN RANK CORRELATION per return flag — the monotone
    * association a30's Pearson misses (a convex price curve correlates
    * perfectly in ranks while Pearson under-reads it). Ranks are
    * textbook TIE-AVERAGED, kept integer by doubling: 2·avg_rank =
    * 2·rank() + tiecount − 1 (rank() = the tie group's minimum rank).
    * That identity matters for exactness: the synthetic lineitem has
    * duplicate rows, and any row-level tiebreak pairs rx with ry
    * arbitrarily WITHIN a tie group — engines would disagree in the
    * last decimals (observed before this form). Tie-averaging is
    * order-independent by construction, so both engines deal identical
    * doubled ranks, and the constant ×2 cancels in the correlation.
    * The five moment sums then run a30's exact-integer machinery —
    * only the final division is float.
    *
    * Scale shape (round-12 verdict #1): l_returnflag has 3 values, so
    * rank windows partitioned by it sort the whole relation in 3
    * tasks — the constant-cardinality window trap. Tie-averaged ranks
    * depend only on the DISTINCT (flag, value) spine, so
    * [[graft.operators.Align.groupedDoubledRank]] aggregates tie
    * counts there, grouped-prefix-sums them in value order (every
    * task holds a range slice, never a flag), and joins the spine
    * back: the quantity spine (3×50 rows) broadcasts, the
    * high-cardinality price spine shuffle-joins on its own
    * well-distributed key. */
  val a54Spearman = Q(
    "a54_spearman",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      def d(c: Column) = c.cast(DecimalType(38, 0))
      val b = Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
      val flag = Seq("l_returnflag")
      val withRx = graft.operators.Align.groupedDoubledRank(
        b, flag, "l_quantity", "rx", broadcastBack = true)
      val r = graft.operators.Align.groupedDoubledRank(
        withRx, flag, "l_extendedprice", "ry")
      val m = r.groupBy("l_returnflag").agg(count(lit(1)).as("n"),
        sum("rx").as("sx"), sum("ry").as("sy"),
        sum(d(col("rx")) * d(col("ry"))).as("sxy"),
        sum(d(col("rx")) * d(col("rx"))).as("sxx"),
        sum(d(col("ry")) * d(col("ry"))).as("syy"))
      m.select(col("l_returnflag"), col("n"),
          (d(col("n")) * col("sxy") - d(col("sx")) * d(col("sy"))).as("num"),
          (d(col("n")) * col("sxx") - d(col("sx")) * d(col("sx"))).as("d1"),
          (d(col("n")) * col("syy") - d(col("sy")) * d(col("sy"))).as("d2"))
        .select(col("l_returnflag"), col("n"),
          when(col("d1") > 0 && col("d2") > 0,
            col("num").cast("double") /
              (sqrt(col("d1").cast("double")) * sqrt(col("d2").cast("double"))))
            .as("spearman_rho"))
        .orderBy("l_returnflag")
    },
    Some("""WITH r AS (
        SELECT l_returnflag,
          rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) * 2
            + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1
            AS rx,
          rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) * 2
            + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1
            AS ry
        FROM lineitem),
      m AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
          sum(CAST(rx AS HUGEINT) * ry) AS sxy,
          sum(CAST(rx AS HUGEINT) * rx) AS sxx,
          sum(CAST(ry AS HUGEINT) * ry) AS syy
        FROM r GROUP BY 1),
      f AS (
        SELECT l_returnflag, n,
          (n*sxy - sx*sy) AS num, (n*sxx - sx*sx) AS d1,
          (n*syy - sy*sy) AS d2
        FROM m)
      SELECT l_returnflag, n,
        CASE WHEN d1 > 0 AND d2 > 0
          THEN CAST(num AS DOUBLE)
            / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE)))
        END AS spearman_rho
      FROM f ORDER BY l_returnflag"""))

  /** A55: MANN–WHITNEY U — the nonparametric two-sample test ("did
    * the value distribution shift between cohorts?") that works where
    * a t-test's normality assumption doesn't. Cohorts split on user
    * parity; per event type, pooled values get a54's doubled
    * tie-averaged ranks (exact integers under duplicate values), so
    * U = (R₁_doubled − n₁(n₁+1))/2 is exact to the half. The normal
    * approximation uses the TIE-CORRECTED variance, whose Σ(t³−t)
    * term folds to the per-row identity Σ_rows(t²−1) — one extra
    * integer per row, no second pass over distinct values. The z
    * expression is one shared text over exact integer operands, so
    * the doubles agree bit-for-bit. Ranks and tie counts come from
    * [[graft.operators.Align.groupedDoubledRank]] over the distinct
    * (type, value) spine — event_type has 5 values, so the former
    * rank window partitioned by it was the round-12 verdict's
    * constant-cardinality scale trap; the spine join key (type, v)
    * is high-cardinality and distributes. */
  val a55MannWhitney = Q(
    "a55_mannwhitney",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      def d(c: Column) = c.cast(DecimalType(38, 0))
      val e = Tables.load(s, dir, "events").select(col("event_type"),
        (Q.dec("value") * 100).cast("long").as("v"),
        (col("user_id") % 2).as("cohort"))
      val r = graft.operators.Align.groupedDoubledRank(
        e, Seq("event_type"), "v", "r2", tieName = Some("t"))
      val a = r.groupBy("event_type").agg(
        sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("cohort") =!= 0, 1L).otherwise(0L)).as("n2"),
        sum(when(col("cohort") === 0, d(col("r2")))).as("r1_2"),
        sum(d(col("t")) * d(col("t")) - 1).as("tsum"))
        .withColumn("u2", col("r1_2") - d(col("n1")) * (d(col("n1")) + 1))
        .withColumn("nn", col("n1") + col("n2"))
      a.select(col("event_type"), col("n1"), col("n2"),
          (col("u2").cast("double") / lit(2.0)).as("u"),
          expr("""((CAST(u2 AS DOUBLE) / 2.0e0)
              - (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0e0))
            / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 1.2e1)
              * ((CAST(nn AS DOUBLE) + 1.0e0)
                - CAST(tsum AS DOUBLE)
                  / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0e0))))""")
            .as("z"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
        SELECT event_type,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
          user_id % 2 AS cohort
        FROM events),
      r AS (
        SELECT event_type, cohort,
          count(*) OVER (PARTITION BY event_type, v) AS t,
          rank() OVER (PARTITION BY event_type ORDER BY v) * 2
            + count(*) OVER (PARTITION BY event_type, v) - 1 AS r2
        FROM e),
      a AS (
        SELECT event_type,
          CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(sum(CASE WHEN cohort <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
          sum(CASE WHEN cohort = 0 THEN CAST(r2 AS HUGEINT) END) AS r1_2,
          sum(CAST(t AS HUGEINT) * t - 1) AS tsum
        FROM r GROUP BY 1),
      b AS (
        SELECT event_type, n1, n2, n1 + n2 AS nn,
          r1_2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u2, tsum
        FROM a)
      SELECT event_type, n1, n2,
        CAST(u2 AS DOUBLE) / 2.0 AS u,
        ((CAST(u2 AS DOUBLE) / 2.0e0)
            - (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0e0))
          / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 1.2e1)
            * ((CAST(nn AS DOUBLE) + 1.0e0)
              - CAST(tsum AS DOUBLE)
                / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0e0))))
          AS z
      FROM b ORDER BY event_type"""))

  /** A56: KOLMOGOROV–SMIRNOV two-sample statistic — the SHAPE
    * complement of a55's location test (a variance change with equal
    * medians slips past Mann–Whitney; KS catches any ECDF divergence).
    * Exactness: D = max|F₁−F₂| evaluates only at distinct pooled
    * values, and the comparison cross-multiplies to the integer
    * |c₁·n₂ − c₂·n₁| (cumulative cohort counts over the value-ordered
    * spine), so the max — and the value where it is attained, ties to
    * the smaller value — is decided wholly in BIGINTs; ONE division
    * produces the reported D. Shape: one (type, value) groupBy, one
    * DISTRIBUTED grouped cumsum over the distinct-value spine
    * ([[graft.operators.Align.groupedPrefixSums]] — the spine is
    * bounded by the value DOMAIN, not the calendar, so the round-12
    * verdict called the former 5-way-partitioned window borderline;
    * now no task holds more than a range slice even if the domain
    * grows), and a max-of-struct aggregate to pick the attained
    * maximum — (dnum, −v) lexicographic max IS "dnum desc, v asc"
    * without any rank window. */
  val a56Ks = Q(
    "a56_ks_test",
    (s, dir) => {
      val e = Tables.load(s, dir, "events").select(col("event_type"),
        (Q.dec("value") * 100).cast("long").as("v"),
        (col("user_id") % 2).as("cohort"))
      val g = e.groupBy("event_type", "v").agg(
        sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("a1"),
        sum(when(col("cohort") =!= 0, 1L).otherwise(0L)).as("a2"))
      val tot = g.groupBy("event_type")
        .agg(sum("a1").as("n1"), sum("a2").as("n2"))
      val c = graft.operators.Align.groupedPrefixSums(
          g, Seq("event_type"), Seq("a1", "a2"), Seq("c1", "c2"), col("v"))
        .join(broadcast(tot), "event_type")
        .withColumn("dnum", abs(col("c1") * col("n2") - col("c2") * col("n1")))
      c.groupBy("event_type", "n1", "n2")
        .agg(max(struct(col("dnum"), (-col("v")).as("nv"))).as("m"))
        .select(col("event_type"), col("n1"), col("n2"),
          (col("m.dnum").cast("double") /
            (col("n1").cast("double") * col("n2").cast("double"))).as("ks_d"),
          ((-col("m.nv")).cast("double") / lit(100.0)).as("at_value"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
        SELECT event_type,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
          user_id % 2 AS cohort
        FROM events),
      g AS (
        SELECT event_type, v,
          CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
          CAST(sum(CASE WHEN cohort <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS a2
        FROM e GROUP BY 1, 2),
      tot AS (
        SELECT event_type, CAST(sum(a1) AS BIGINT) AS n1,
          CAST(sum(a2) AS BIGINT) AS n2
        FROM g GROUP BY 1),
      c AS (
        SELECT g.event_type, v, n1, n2,
          CAST(sum(a1) OVER (PARTITION BY g.event_type ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
          CAST(sum(a2) OVER (PARTITION BY g.event_type ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2
        FROM g JOIN tot USING (event_type)),
      d AS (
        SELECT event_type, v, n1, n2, abs(c1*n2 - c2*n1) AS dnum,
          row_number() OVER (PARTITION BY event_type
            ORDER BY abs(c1*n2 - c2*n1) DESC, v) AS rk
        FROM c)
      SELECT event_type, n1, n2,
        CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
          AS ks_d,
        CAST(v AS DOUBLE) / 100.0 AS at_value
      FROM d WHERE rk = 1 ORDER BY event_type"""))

  /** Kruskal–Wallis H numerics, shared verbatim by both engines (the
    * a55 discipline: one expression text over exact integer operands ⇒
    * bit-identical doubles). With doubled ranks R2g = 2·Rg:
    * H = 12/(N(N+1))·ΣRg²/ng − 3(N+1) = 3·S/(N(N+1)) − 3(N+1) where
    * S = Σ⌊R2g²/ng⌋ — per-group FLOOR division then integer sum:
    * order-independent, no float accumulation, error ≤ k absolute on
    * a ~N³-sized S. The floor stays in DECIMAL all the way (Spark's
    * `div` yields BIGINT and R2g²/ng passes 2⁶³ already at sf1;
    * (a − a mod b)/b of divisible decimals is the exact floor), so
    * the identical integer reaches both engines. Tie correction
    * divides by 1 − Σ(t³−t)/(N³−N), with Σ(t³−t) = Σ_rows(t²−1)
    * exact. */
  private val kwH =
    """((3.0e0 * CAST(s AS DOUBLE)
       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0e0)))
       - (3.0e0 * (CAST(n AS DOUBLE) + 1.0e0)))"""
  private val kwC =
    """(1.0e0 - CAST(ts AS DOUBLE)
       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
          - CAST(n AS DOUBLE)))"""

  /** A57: KRUSKAL–WALLIS H — the k-SAMPLE extension of a55's
    * Mann–Whitney ("did the value distribution shift?" across ALL
    * five event types at once, not one cohort pair): rank everything
    * pooled, compare each group's mean rank against the grand mean.
    * Ranks are a54's doubled tie-averaged integers — but GLOBAL, the
    * shape Spark's window engine executes on one task. This is the
    * grouped-rank machinery's degenerate-group showcase:
    * [[graft.operators.Align.groupedDoubledRank]] over a single
    * constant group stays range-partitioned across every task (the
    * same reason w10's global cumsum scales), so the pooled rank of a
    * trillion rows never funnels. The statistic then needs only
    * per-type integer aggregates; see [[kwH]] for the exactness
    * scheme. */
  val a57Kruskal = Q(
    "a57_kruskal",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      def d(c: Column) = c.cast(DecimalType(38, 0))
      val e = Tables.load(s, dir, "events").select(col("event_type"),
        (Q.dec("value") * 100).cast("long").as("v"))
        .withColumn("__all", lit("all"))
      val r = graft.operators.Align.groupedDoubledRank(
        e, Seq("__all"), "v", "r2", tieName = Some("t"))
      val g = r.groupBy("event_type").agg(
        count(lit(1)).as("n_g"),
        sum(d(col("r2"))).as("r2g"),
        sum(d(col("t")) * d(col("t")) - 1).as("tsg"))
      g.agg(count(lit(1)).as("k"),
          sum("n_g").as("n"),
          sum(expr("""CAST((r2g * r2g - pmod(r2g * r2g,
            CAST(n_g AS DECIMAL(10,0)))) / CAST(n_g AS DECIMAL(10,0))
            AS DECIMAL(38,0))""")).as("s"),
          sum("tsg").as("ts"))
        .select(col("k"), col("n").cast("long").as("n"),
          expr(kwH).as("h"),
          expr(s"($kwH) / $kwC").as("h_tied"))
    },
    Some(s"""WITH e AS (
        SELECT event_type,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events),
      r AS (
        SELECT event_type,
          count(*) OVER (PARTITION BY v) AS t,
          rank() OVER (ORDER BY v) * 2
            + count(*) OVER (PARTITION BY v) - 1 AS r2
        FROM e),
      g AS (
        SELECT event_type, count(*) AS n_g,
          sum(CAST(r2 AS HUGEINT)) AS r2g,
          sum(CAST(t AS HUGEINT) * t - 1) AS tsg
        FROM r GROUP BY 1),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
          CAST(sum(n_g) AS BIGINT) AS n,
          sum(r2g * r2g // n_g) AS s,
          sum(tsg) AS ts
        FROM g)
      SELECT k, n, $kwH AS h, ($kwH) / $kwC AS h_tied FROM a"""))

  /** A58: ONE-WAY ANOVA F — the parametric k-sample complement of
    * a57's Kruskal–Wallis (mean shifts in the values themselves, where
    * KW sees only ranks): F = (SSB/(k−1)) / (SSW/(N−k)) with
    * SSB = Σ s1g²/ng − S1²/N and SSW = S2 − Σ s1g²/ng, all from ONE
    * map-side-combined pass of integer-cents moments (n, Σv, Σv² per
    * group). Exactness: both sums of squares are held in ×10⁶ fixed
    * point, the per-group s1g²·10⁶/ng through a57's decimal floor
    * division (never Spark's BIGINT `div`), so SSB6/SSW6 reach both
    * engines as identical integers; F and η² are then one shared
    * expression text each. η² = SSB/(SSB+SSW) is the practical
    * effect-size companion ("how much variance the grouping
    * explains"). */
  val a58Anova = Q(
    "a58_anova",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      def d(c: Column) = c.cast(DecimalType(38, 0))
      val e = Tables.load(s, dir, "events").select(col("event_type"),
        (Q.dec("value") * 100).cast("long").as("v"))
      val g = e.groupBy("event_type").agg(
        count(lit(1)).as("n_g"),
        sum(d(col("v"))).as("s1g"),
        sum(d(col("v")) * d(col("v"))).as("s2g"))
      g.agg(count(lit(1)).as("k"),
          sum("n_g").as("nn"), sum("s1g").as("s1"), sum("s2g").as("s2"),
          sum(expr("""CAST((s1g * s1g * 1000000 - pmod(s1g * s1g * 1000000,
            CAST(n_g AS DECIMAL(10,0)))) / CAST(n_g AS DECIMAL(10,0))
            AS DECIMAL(38,0))""")).as("t6"))
        .select(col("k"), col("nn").cast("long").as("n"),
          expr("""t6 - CAST((s1 * s1 * 1000000 - pmod(s1 * s1 * 1000000,
            CAST(nn AS DECIMAL(12,0)))) / CAST(nn AS DECIMAL(12,0))
            AS DECIMAL(38,0))""").as("ssb6"),
          (col("s2") * 1000000 - col("t6")).as("ssw6"))
        .select(col("k"), col("n"),
          (col("ssb6").cast("double") / lit(1.0e6) / lit(100.0) / lit(100.0))
            .as("ssb"),
          expr("""(CAST(ssb6 AS DOUBLE) * (CAST(n AS DOUBLE)
              - CAST(k AS DOUBLE)))
            / (CAST(ssw6 AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0e0))""")
            .as("f"),
          expr("""CAST(ssb6 AS DOUBLE)
            / (CAST(ssb6 AS DOUBLE) + CAST(ssw6 AS DOUBLE))""")
            .as("eta_sq"))
    },
    Some("""WITH e AS (
        SELECT event_type,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events),
      g AS (
        SELECT event_type, count(*) AS n_g,
          sum(CAST(v AS HUGEINT)) AS s1g,
          sum(CAST(v AS HUGEINT) * v) AS s2g
        FROM e GROUP BY 1),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
          CAST(sum(n_g) AS BIGINT) AS n,
          CAST(sum(s1g) AS HUGEINT) AS s1,
          CAST(sum(s2g) AS HUGEINT) AS s2,
          sum(s1g * s1g * 1000000 // n_g) AS t6
        FROM g),
      b AS (
        SELECT k, n,
          t6 - (s1 * s1 * 1000000 // n) AS ssb6,
          s2 * 1000000 - t6 AS ssw6
        FROM a)
      SELECT k, n,
        CAST(ssb6 AS DOUBLE) / 1.0e6 / 100.0 / 100.0 AS ssb,
        (CAST(ssb6 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
          / (CAST(ssw6 AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0e0)) AS f,
        CAST(ssb6 AS DOUBLE)
          / (CAST(ssb6 AS DOUBLE) + CAST(ssw6 AS DOUBLE)) AS eta_sq
      FROM b"""))

  /** A59: WELCH'S T-TEST (Welch 1947, Biometrika — the unequal-variance
    * two-sample location test; the parametric A/B-decision staple,
    * complementing a58's k-sample ANOVA and a55's rank-based
    * Mann–Whitney): does mean purchase value differ between the two
    * user arms? Exactness: one conditional moment aggregate per arm
    * (n, Σv, Σv² in integer cents / DECIMAL(38,0)); each arm's centered
    * sum of squares is the exact integer ssᵢ6 = 10⁶·Σv² − ⌊10⁶·(Σv)²/n⌋
    * (a58's floor-division form — HUGEINT-safe where (Σv)² passes 2⁶³);
    * the t statistic and the Welch–Satterthwaite df are IEEE doubles
    * derived from those exact integers through expression text
    * INTERPOLATED FROM THE SAME SCALA STRING into both the Spark plan
    * and the oracle SQL — the two engines evaluate literally identical
    * correctly-rounded operations on identical bits. Shape: one scan,
    * one 2-group combine, one 1-row fold — nothing data-proportional
    * past the map-side partial. */
  val a59WelchTtest: Q = {
    // v1/n1 and v2/n2 (variance-over-n terms) in shared expression text.
    val v1n = "(CAST(ss16 AS DOUBLE) / 1.0e6" +
      " / (CAST(n1 AS DOUBLE) - 1.0e0) / CAST(n1 AS DOUBLE))"
    val v2n = "(CAST(ss26 AS DOUBLE) / 1.0e6" +
      " / (CAST(n2 AS DOUBLE) - 1.0e0) / CAST(n2 AS DOUBLE))"
    val tExpr = "(CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
      s" - CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt($v1n + $v2n)"
    val dfExpr = s"($v1n + $v2n) * ($v1n + $v2n) / (" +
      s"$v1n * $v1n / (CAST(n1 AS DOUBLE) - 1.0e0)" +
      s" + $v2n * $v2n / (CAST(n2 AS DOUBLE) - 1.0e0))"
    val m1 = "CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE) / 1.0e2"
    val m2 = "CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE) / 1.0e2"
    Q(
      "a59_welch_ttest",
      (s, dir) => {
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.types.DecimalType
        def d(c: Column) = c.cast(DecimalType(38, 0))
        val e = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2).as("arm"),
            (Q.dec("value") * 100).cast("long").as("v"))
        val g = e.groupBy("arm").agg(
          count(lit(1)).as("n_g"),
          sum(d(col("v"))).as("s1g"),
          sum(d(col("v")) * d(col("v"))).as("s2g"))
          .withColumn("ss6", expr("""s2g * 1000000
            - CAST((s1g * s1g * 1000000 - pmod(s1g * s1g * 1000000,
                CAST(n_g AS DECIMAL(10,0)))) / CAST(n_g AS DECIMAL(10,0))
              AS DECIMAL(38,0))"""))
        g.agg(
            sum(when(col("arm") === 0, col("n_g"))).as("n1"),
            sum(when(col("arm") =!= 0, col("n_g"))).as("n2"),
            sum(when(col("arm") === 0, col("s1g"))).as("s11"),
            sum(when(col("arm") =!= 0, col("s1g"))).as("s12"),
            sum(when(col("arm") === 0, col("ss6"))).as("ss16"),
            sum(when(col("arm") =!= 0, col("ss6"))).as("ss26"))
          .select(col("n1").cast("long").as("n1"),
            col("n2").cast("long").as("n2"),
            expr(m1).as("mean1"), expr(m2).as("mean2"),
            expr(tExpr).as("t"), expr(dfExpr).as("df"))
      },
      Some(s"""WITH e AS (
          SELECT user_id % 2 AS arm,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
          FROM events WHERE event_type = 'purchase'),
        g AS (
          SELECT arm, count(*) AS n_g,
            sum(CAST(v AS HUGEINT)) AS s1g,
            sum(CAST(v AS HUGEINT) * v) AS s2g
          FROM e GROUP BY 1),
        h AS (
          SELECT arm, n_g, s1g,
            s2g * 1000000 - (s1g * s1g * 1000000 // n_g) AS ss6
          FROM g),
        a AS (
          SELECT
            CAST(sum(CASE WHEN arm = 0 THEN n_g END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN arm <> 0 THEN n_g END) AS BIGINT) AS n2,
            sum(CASE WHEN arm = 0 THEN s1g END) AS s11,
            sum(CASE WHEN arm <> 0 THEN s1g END) AS s12,
            sum(CASE WHEN arm = 0 THEN ss6 END) AS ss16,
            sum(CASE WHEN arm <> 0 THEN ss6 END) AS ss26
          FROM h)
        SELECT n1, n2, $m1 AS mean1, $m2 AS mean2,
          $tExpr AS t, $dfExpr AS df
        FROM a"""))
  }

  /** A60: CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013,
    * WSDM — "Improving the Sensitivity of Online Controlled
    * Experiments by Utilizing Pre-Experiment Data"): adjust each
    * user's experiment-period metric Y by their PRE-period metric X,
    * Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X), which shrinks arm
    * variance by exactly ρ² while leaving the treatment-effect
    * estimate unbiased — the standard way an experimentation platform
    * doubles its effective sample size for free. Exactness: per-user
    * (x, y) in integer cents from ONE conditional groupBy; pooled
    * moments give the exact integer numerators covN = n·Σxy − Σx·Σy
    * and varN = n·Σxx − (Σx)² (DECIMAL(38,0)/HUGEINT); θ, adjusted
    * arm means and the ρ² reduction are doubles derived from those
    * integers via expression text interpolated from one Scala string
    * into both engines. Shape: scan → per-user combine → one 2-row
    * arm aggregate joined to a 1-ROW pooled frame (broadcast — the
    * whitelisted 1-row BNLJ pattern); nothing data-proportional
    * crosses the second shuffle. */
  val a60Cuped: Q = {
    val theta = "CAST(cov_n AS DOUBLE) / CAST(varx_n AS DOUBLE)"
    val meanY = "CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 1.0e2"
    val meanYAdj = s"(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - $theta" +
      " * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1.0e2"
    val varRed = "CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE)" +
      " / (CAST(varx_n AS DOUBLE) * CAST(vary_n AS DOUBLE))"
    Q(
      "a60_cuped",
      (s, dir) => {
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.types.DecimalType
        def d(c: Column) = c.cast(DecimalType(38, 0))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val u = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            (Q.dec("value") * 100).cast("long").as("v"))
          .groupBy((col("user_id") % 2).as("arm"), col("user_id"))
          .agg(sum(when(col("ts") < cut, col("v")).otherwise(0L)).as("x"),
            sum(when(col("ts") >= cut, col("v")).otherwise(0L)).as("y"))
        val pooled = u.agg(count(lit(1)).as("n"),
            sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"),
            sum(d(col("x")) * d(col("x"))).as("sxx"),
            sum(d(col("x")) * d(col("y"))).as("sxy"),
            sum(d(col("y")) * d(col("y"))).as("syy"))
          .select(col("n"), col("sx"),
            (d(col("n")) * col("sxy") - col("sx") * col("sy")).as("cov_n"),
            (d(col("n")) * col("sxx") - col("sx") * col("sx")).as("varx_n"),
            (d(col("n")) * col("syy") - col("sy") * col("sy")).as("vary_n"))
        u.groupBy("arm")
          .agg(count(lit(1)).as("n_a"),
            sum(d(col("x"))).as("sx_a"), sum(d(col("y"))).as("sy_a"))
          .join(broadcast(pooled))
          .select(col("arm"), col("n_a").as("n_users"),
            expr(meanY).as("mean_y"), expr(meanYAdj).as("mean_y_adj"),
            expr(theta).as("theta"), expr(varRed).as("var_reduction"))
          .orderBy("arm")
      },
      Some(s"""WITH u AS (
          SELECT user_id % 2 AS arm, user_id,
            sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS x,
            sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS y
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        p AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
            sum(CAST(x AS HUGEINT)) AS sx,
            CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
              - sum(CAST(x AS HUGEINT)) * sum(CAST(y AS HUGEINT)) AS cov_n,
            CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
              - sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT)) AS varx_n,
            CAST(count(*) AS HUGEINT) * sum(CAST(y AS HUGEINT) * y)
              - sum(CAST(y AS HUGEINT)) * sum(CAST(y AS HUGEINT)) AS vary_n
          FROM u),
        g AS (
          SELECT arm, count(*) AS n_a,
            sum(CAST(x AS HUGEINT)) AS sx_a,
            sum(CAST(y AS HUGEINT)) AS sy_a
          FROM u GROUP BY 1)
        SELECT arm, n_a AS n_users,
          $meanY AS mean_y, $meanYAdj AS mean_y_adj,
          $theta AS theta, $varRed AS var_reduction
        FROM g CROSS JOIN p ORDER BY arm"""))
  }

  /** A62: TWO-PROPORTION Z-TEST (the pooled-variance normal
    * approximation — conversion-rate A/B testing's workhorse, the
    * binary-outcome sibling of a59's Welch t): did the purchase
    * CONVERSION RATE (users with ≥1 HIGH-VALUE purchase — value > 95,
    * among users with any event; the plain any-purchase rate is ~1.0
    * on this corpus, which degenerates the pooled variance to zero)
    * differ between arms? All counts are exact integers from
    * one per-user combine + one 2-row fold; p̂₁, p̂₂, the pooled p̂ and
    * z are doubles derived from those integers through shared
    * expression text. Shape: scan → per-user any-purchase flag →
    * 2-group aggregate → 1-row fold. */
  val a62PropZtest: Q = {
    val p1 = "(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    val p2 = "(CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    val pp = "(CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    val zT = s"($p1 - $p2) / sqrt($pp * (1.0e0 - $pp)" +
      " * (1.0e0 / CAST(n1 AS DOUBLE) + 1.0e0 / CAST(n2 AS DOUBLE)))"
    Q(
      "a62_prop_ztest",
      (s, dir) => {
        val u = Tables.load(s, dir, "events")
          .groupBy((col("user_id") % 2).as("arm"), col("user_id"))
          .agg(max(when(col("event_type") === "purchase" &&
            Q.dec("value") > 95, 1L).otherwise(0L)).as("converted"))
        u.agg(
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") =!= 0, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 0, col("converted"))
              .otherwise(0L)).as("c1"),
            sum(when(col("arm") =!= 0, col("converted"))
              .otherwise(0L)).as("c2"))
          .select(col("n1"), col("n2"), col("c1"), col("c2"),
            expr(p1).as("p1"), expr(p2).as("p2"), expr(zT).as("z"))
      },
      Some(s"""WITH u AS (
          SELECT user_id % 2 AS arm, user_id,
            max(CASE WHEN event_type = 'purchase'
                AND CAST(value AS DECIMAL(18,2)) > 95 THEN 1 ELSE 0 END)
              AS converted
          FROM events GROUP BY 1, 2),
        a AS (
          SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN arm <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
              AS BIGINT) AS c1,
            CAST(sum(CASE WHEN arm <> 0 THEN converted ELSE 0 END)
              AS BIGINT) AS c2
          FROM u)
        SELECT n1, n2, c1, c2, $p1 AS p1, $p2 AS p2, $zT AS z
        FROM a"""))
  }

  /** A64: SAMPLE-RATIO MISMATCH check (the χ² goodness-of-fit on arm
    * counts against the designed 50/50 split — the guardrail every
    * experimentation platform runs BEFORE reading any metric, because
    * a biased assignment invalidates a59–a63 wholesale; Fabijan et
    * al. 2019 catalog the failure modes). One per-user combine, one
    * 1-row fold: χ² = (n₁−E)²/E + (n₂−E)²/E with E = n/2, doubles
    * derived from exact integer counts through shared expression
    * text. χ² > 3.84 (95%, df=1) flags the experiment as broken —
    * the flag is an integer-derived double comparison, identical in
    * both engines. */
  val a64Srm: Q = {
    val eT = "(CAST(n1 + n2 AS DOUBLE) / 2.0e0)"
    val chiT = s"((CAST(n1 AS DOUBLE) - $eT) * (CAST(n1 AS DOUBLE) - $eT)" +
      s" + (CAST(n2 AS DOUBLE) - $eT) * (CAST(n2 AS DOUBLE) - $eT)) / $eT"
    Q(
      "a64_srm",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .select((col("user_id") % 2).as("arm"), col("user_id"))
          .distinct()
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") =!= 0, 1L).otherwise(0L)).as("n2"))
          .select(col("n1"), col("n2"), expr(chiT).as("srm_chi2"),
            (expr(chiT) > 3.84).as("srm_flag"))
      },
      Some(s"""WITH u AS (
          SELECT DISTINCT user_id % 2 AS arm, user_id FROM events),
        a AS (
          SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN arm <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM u)
        SELECT n1, n2, $chiT AS srm_chi2, $chiT > 3.84 AS srm_flag
        FROM a"""))
  }

  /** A65: BENJAMINI–HOCHBERG FDR control (Benjamini & Hochberg 1995)
    * — the multiple-comparisons guard every experimentation platform
    * runs over its metric battery: with m simultaneous tests, raw
    * p < 0.05 calls produce false discoveries at rate ∝ m, and the BH
    * step-up (reject the k smallest p-values where k = max{i : p(i) ≤
    * i·q/m}) bounds the EXPECTED false-discovery proportion at q.
    *
    * The procedure is the operator; the p-values are the instrument's
    * input: one test per (event_type × user-bucket) cell, null p-values
    * dealt as exact rationals h/2⁵⁶ from the engine-portable hash
    * (uniform by construction, replayed bit-exactly by the oracle), and
    * a planted block (bucket < 3) divided by 2¹² to simulate true
    * effects. Every decision is INTEGER arithmetic — p(i) ≤ i·q/m
    * cross-multiplied as h·10·m ≤ i·2⁵⁶ in DECIMAL(38)/HUGEINT — so
    * the reject set is hash-exact, not float-boundary-dependent. Ranks
    * come from the bounded m-row spine via zipWithGlobalIndex (no
    * window). q = 0.1. */
  val a65BhFdr: Q = {
    val m = 100 // 5 event types x 20 user buckets
    val pT = "(CAST(h AS DOUBLE) / 72057594037927936.0e0)"
    Q(
      "a65_bh_fdr",
      (s, dir) => {
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.types.DecimalType
        def d(c: Column) = c.cast(DecimalType(38, 0))
        val tests = Tables.load(s, dir, "events")
          .select(col("event_type"), (col("user_id") % 20).as("bucket"))
          .distinct()
          .withColumn("h0", graft.operators.Dedup.hash56(
            concat(col("event_type"), lit(":"), col("bucket"))))
          // planted true effects: the bucket<3 block's p-values shrink 2^12
          .withColumn("h", when(col("bucket") < 3,
            expr("h0 DIV 4096")).otherwise(col("h0")))
        val ranked = graft.operators.Align.zipWithGlobalIndex(
          tests, "i", col("h").asc, col("event_type"), col("bucket"))
        // step-up: k* = max rank whose p clears its own threshold
        val hits = ranked.select(
          max(when(d(col("h")) * lit(10L * m) <=
            d(col("i")) * lit(72057594037927936L), col("i"))
            .otherwise(0L)).as("kstar"))
        ranked.crossJoin(broadcast(hits))
          .select(col("event_type"), col("bucket"), col("i").as("rank"),
            expr(pT).as("p"), (col("i") <= col("kstar")).as("rejected"))
          .orderBy("rank")
      },
      Some(s"""WITH t AS (
          SELECT DISTINCT event_type, user_id % 20 AS bucket FROM events),
        h0 AS (
          SELECT event_type, bucket,
            ((md5_number_lower(event_type || ':' || bucket)
              % 72057594037927936)::BIGINT) AS h0
          FROM t),
        hh AS (
          SELECT event_type, bucket,
            CASE WHEN bucket < 3 THEN h0 // 4096 ELSE h0 END AS h
          FROM h0),
        r AS (
          SELECT event_type, bucket, h,
            CAST(row_number() OVER (ORDER BY h, event_type, bucket)
              AS BIGINT) AS i
          FROM hh),
        k AS (
          SELECT max(CASE WHEN CAST(h AS HUGEINT) * ${10L * m}
            <= CAST(i AS HUGEINT) * 72057594037927936 THEN i
            ELSE 0 END) AS kstar FROM r)
        SELECT event_type, bucket, i AS rank, $pT AS p,
          i <= kstar AS rejected
        FROM r CROSS JOIN k
        ORDER BY rank"""))
  }

  /** A66: KENDALL'S τ-b via the CONTINGENCY TABLE (Kendall 1938;
    * tie-corrected τ-b as in Kendall 1945) — the rank-correlation
    * complement to a54's Spearman ρ: τ counts pairwise ORDER
    * agreements, so it is robust to monotone transforms and reads
    * directly as P(concordant) − P(discordant). Naively O(n²) pairs;
    * over BOUNDED VALUE DOMAINS (quantity 1..50 × discount cents
    * 0..10) the whole statistic collapses onto the ≤550-cell
    * contingency table: concordant pairs C = Σ n_ij·n_i'j' over
    * (i<i', j<j'), discordant D likewise with j>j', and the tie terms
    * come from the marginals — one groupBy to cells, one BOUNDED
    * broadcast product of the cell table with itself (whitelisted: the
    * product is |domain|², never ∝ rows), integer-exact throughout.
    * τ-b = (C−D)/√((n₀−tx)(n₀−ty)) is one shared-text expression;
    * IEEE sqrt is correctly-rounded on both engines. */
  val a66KendallTau: Q = {
    val tauT = "(CAST(c - d AS DOUBLE) / sqrt(" +
      "CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)))"
    Q(
      "a66_kendall_tau",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("q"),
          (Q.dec("l_discount") * 100).cast("long").as("dc"))
        val cells = li.groupBy("q", "dc").agg(count(lit(1)).as("n"))
        val pairs = cells.as("a").join(broadcast(cells.as("b")),
            col("a.q") < col("b.q") && col("a.dc") =!= col("b.dc"))
          .select((col("a.n") * col("b.n")).as("nn"),
            (col("a.dc") < col("b.dc")).as("conc"))
          .agg(sum(when(col("conc"), col("nn")).otherwise(0L)).as("c"),
            sum(when(!col("conc"), col("nn")).otherwise(0L)).as("d"))
        // tie/pair counts via INTEGER division (DIV, matching the
        // oracle's //): Column `/` is double division, exact only
        // under 2^53 — n0 alone crosses that around ~1.3e8 rows, and
        // the tie-corrected statistic must stay integer-exact at any
        // scale factor.
        val margins = cells.agg(sum(col("n")).as("nrows"))
        val tx = cells.groupBy("q").agg(sum("n").as("nq"))
          .agg(sum(expr("nq * (nq - 1) DIV 2")).as("tx"))
        val ty = cells.groupBy("dc").agg(sum("n").as("nd"))
          .agg(sum(expr("nd * (nd - 1) DIV 2")).as("ty"))
        pairs.crossJoin(broadcast(margins))
          .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
          .select(col("c").cast("long").as("c"),
            col("d").cast("long").as("d"),
            expr("nrows * (nrows - 1) DIV 2").cast("long").as("n0"),
            col("tx").cast("long").as("tx"),
            col("ty").cast("long").as("ty"))
          .select(col("c"), col("d"), col("n0"), col("tx"), col("ty"),
            expr(tauT).as("tau_b"))
      },
      Some(s"""WITH li AS (
          SELECT CAST(l_quantity AS BIGINT) AS q,
            CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS dc
          FROM lineitem),
        cells AS (SELECT q, dc, count(*) AS n FROM li GROUP BY 1, 2),
        cd AS (
          SELECT
            CAST(sum(CASE WHEN a.dc < b.dc THEN a.n * b.n ELSE 0 END)
              AS BIGINT) AS c,
            CAST(sum(CASE WHEN a.dc > b.dc THEN a.n * b.n ELSE 0 END)
              AS BIGINT) AS d
          FROM cells a JOIN cells b ON a.q < b.q AND a.dc <> b.dc),
        mg AS (
          SELECT CAST(sum(n) AS BIGINT) AS nrows FROM cells),
        txc AS (
          SELECT CAST(sum(nq * (nq - 1) // 2) AS BIGINT) AS tx
          FROM (SELECT sum(n) AS nq FROM cells GROUP BY q)),
        tyc AS (
          SELECT CAST(sum(nd * (nd - 1) // 2) AS BIGINT) AS ty
          FROM (SELECT sum(n) AS nd FROM cells GROUP BY dc))
        SELECT c, d,
          CAST(nrows * (nrows - 1) // 2 AS BIGINT) AS n0, tx, ty,
          $tauT AS tau_b
        FROM cd CROSS JOIN mg CROSS JOIN txc CROSS JOIN tyc"""))
  }

  /** A63: DIFFERENCE-IN-DIFFERENCES (Card & Krueger 1994's quasi-
    * experimental workhorse): when assignment isn't randomized, the
    * treatment effect estimate is the treated arm's pre→post change
    * MINUS the control arm's — differencing out both the stable
    * arm-level gap and the common time trend. Four (arm, period)
    * cells from ONE conditional moment aggregate; each cell's exact
    * integer centered sum of squares uses a58's floor-division form;
    * the DiD point estimate and its Welch-style standard error
    * √(Σ varᵢ/nᵢ) are doubles from those integers via shared
    * expression text. Same cutoff as a60 — the two queries are the
    * randomized and quasi-experimental readouts of one design. */
  val a63Did: Q = {
    def m(c: String) = s"(CAST(s1_$c AS DOUBLE) / CAST(n_$c AS DOUBLE))"
    def vn(c: String) = s"(CAST(ss6_$c AS DOUBLE) / 1.0e6" +
      s" / (CAST(n_$c AS DOUBLE) - 1.0e0) / CAST(n_$c AS DOUBLE))"
    val cells = Seq("t_post", "t_pre", "c_post", "c_pre")
    val didT = s"((${m("t_post")} - ${m("t_pre")})" +
      s" - (${m("c_post")} - ${m("c_pre")})) / 1.0e2"
    val seT = s"sqrt(${cells.map(vn).mkString(" + ")}) / 1.0e2"
    Q(
      "a63_did",
      (s, dir) => {
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.types.DecimalType
        def d(c: Column) = c.cast(DecimalType(38, 0))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val e = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(
            concat_ws("_",
              when(col("user_id") % 2 === 0, "t").otherwise("c"),
              when(col("ts") >= cut, "post").otherwise("pre")).as("cell"),
            (Q.dec("value") * 100).cast("long").as("v"))
        val g = e.groupBy("cell").agg(
          count(lit(1)).as("n_g"),
          sum(d(col("v"))).as("s1g"),
          sum(d(col("v")) * d(col("v"))).as("s2g"))
          .withColumn("ss6", expr("""s2g * 1000000
            - CAST((s1g * s1g * 1000000 - pmod(s1g * s1g * 1000000,
                CAST(n_g AS DECIMAL(10,0)))) / CAST(n_g AS DECIMAL(10,0))
              AS DECIMAL(38,0))"""))
        val folds = cells.flatMap { c =>
          Seq(sum(when(col("cell") === c, col("n_g"))).as(s"n_$c"),
            sum(when(col("cell") === c, col("s1g"))).as(s"s1_$c"),
            sum(when(col("cell") === c, col("ss6"))).as(s"ss6_$c"))
        }
        g.agg(folds.head, folds.tail: _*)
          .select(
            (cells.map(c => col(s"n_$c").cast("long").as(s"n_$c")) ++
              cells.map(c => expr(s"${m(c)} / 1.0e2").as(s"mean_$c")) :+
              expr(didT).as("did") :+ expr(seT).as("se")): _*)
      },
      Some(s"""WITH e AS (
          SELECT (CASE WHEN user_id % 2 = 0 THEN 't' ELSE 'c' END) || '_'
              || (CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                  THEN 'post' ELSE 'pre' END) AS cell,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
          FROM events WHERE event_type = 'purchase'),
        g AS (
          SELECT cell, count(*) AS n_g,
            sum(CAST(v AS HUGEINT)) AS s1g,
            sum(CAST(v AS HUGEINT) * v) AS s2g
          FROM e GROUP BY 1),
        h AS (
          SELECT cell, n_g, s1g,
            s2g * 1000000 - (s1g * s1g * 1000000 // n_g) AS ss6
          FROM g),
        a AS (
          SELECT
            ${cells.map(c =>
              s"""CAST(sum(CASE WHEN cell = '$c' THEN n_g END) AS BIGINT)
                AS n_$c,
              sum(CASE WHEN cell = '$c' THEN s1g END) AS s1_$c,
              sum(CASE WHEN cell = '$c' THEN ss6 END) AS ss6_$c""")
            .mkString(",\n            ")}
          FROM h)
        SELECT ${cells.map(c => s"n_$c").mkString(", ")},
          ${cells.map(c => s"${m(c)} / 1.0e2 AS mean_$c").mkString(",\n          ")},
          $didT AS did, $seT AS se
        FROM a"""))
  }

  /** A61: POISSON BOOTSTRAP confidence interval (Efron 1979's
    * percentile bootstrap in the streaming-scale approximation of
    * Chamandy, Muralidharan, Najmi & Naidu 2012, "Estimating
    * Uncertainty for Massive Data Streams" — multinomial resample
    * counts become independent Poisson(1) weights, so each of the B
    * resamples is ONE conditional weighted sum instead of a data
    * shuffle): a 95% CI on mean purchase value with zero model
    * assumptions. Determinism is total: row r's weight in resample b
    * is the Poisson(1) inverse-CDF evaluated at u = hash56(id‖b),
    * and the CDF cuts are pre-scaled to the integer grid —
    * w = #{k : u ≥ ⌊P(X≤k)·2⁵⁶⌋}, capped at 6 (P(X>6) < 1e-4) — so
    * the whole draw is INTEGER comparisons; no float enters until the
    * final mean division, whose expression text both engines share.
    * Shape: B·2 conditional sums in one map-side-combined aggregate —
    * rows × B hash evaluations, NO explode, NO extra shuffle; the
    * resample means sort as a B-element in-row array. The at-scale
    * statistics operator: exact-replayable uncertainty on any metric
    * without ever materializing a resample. */
  val a61BootstrapCi: Q = {
    val B = 40
    // P(Poisson(1) ≤ k)·2^56 for k = 0..5, floored — JVM doubles via
    // math.exp at build time, shipped as identical integer literals to
    // both engines (the hllLinearCaseSql discipline).
    val cuts: Seq[Long] = {
      val fact = Seq(1L, 1L, 2L, 6L, 24L, 120L)
      val cdf = fact.indices.map(k =>
        (0 to k).map(j => math.exp(-1.0) / fact(j)).sum)
      cdf.map(p => (p * graft.operators.Dedup.M56.toDouble).toLong)
    }
    def meanT(b: Int) = s"CAST(s$b AS DOUBLE) / CAST(n$b AS DOUBLE)"
    val loIdx = (0.025 * B).toInt + 1  // 2nd of 40
    val hiIdx = B - (0.025 * B).toInt  // 39th of 40
    Q(
      "a61_bootstrap_ci",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"),
            (Q.dec("value") * 100).cast("long").as("v"))
        val withW = e.select(
          (col("v") +: (1 to B).map { b =>
            val u = graft.operators.Dedup.hash56(
              concat_ws(":", col("event_id"), lit(b)))
            cuts.map(t => when(u >= t, 1L).otherwise(0L))
              .reduce(_ + _).as(s"w$b")
          }): _*)
        val aggs =
          Seq(count(lit(1)).as("n0"), sum(col("v")).as("s0")) ++
            (1 to B).flatMap(b => Seq(
              sum(col(s"w$b")).as(s"n$b"),
              sum(col(s"w$b") * col("v")).as(s"s$b")))
        val sorted = s"array_sort(array(${(1 to B).map(meanT).mkString(", ")}))"
        withW.agg(aggs.head, aggs.tail: _*)
          .select(col("n0").as("n"),
            expr("CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 1.0e2")
              .as("mean"),
            expr(s"element_at($sorted, $loIdx) / 1.0e2").as("ci_lo"),
            expr(s"element_at($sorted, $hiIdx) / 1.0e2").as("ci_hi"))
      },
      Some({
        val wSql = (1 to B).map { b =>
          val u = s"((md5_number_lower(event_id || ':' || $b) % ${graft.operators.Dedup.M56})::BIGINT)"
          val w = cuts.map(t => s"(CASE WHEN $u >= $t THEN 1 ELSE 0 END)")
            .mkString(" + ")
          s"($w) AS w$b"
        }.mkString(",\n          ")
        val aggSql = (1 to B).map(b =>
          s"CAST(sum(w$b) AS BIGINT) AS n$b, CAST(sum(w$b * v) AS BIGINT) AS s$b")
          .mkString(",\n          ")
        val sorted = s"list_sort([${(1 to B).map(meanT).mkString(", ")}])"
        s"""WITH e AS (
          SELECT event_id,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
          FROM events WHERE event_type = 'purchase'),
        w AS (
          SELECT v,
          $wSql
          FROM e),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n0,
            CAST(sum(v) AS BIGINT) AS s0,
          $aggSql
          FROM w)
        SELECT n0 AS n,
          CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 1.0e2 AS mean,
          $sorted[$loIdx] / 1.0e2 AS ci_lo,
          $sorted[$hiIdx] / 1.0e2 AS ci_hi
        FROM a"""
      }))
  }

  /** A53: GINI COEFFICIENT per event type — the inequality measure
    * behind "does 1% of users drive 90% of value" (and, in corpus
    * work, how concentrated token mass is across documents): via the
    * rank-sum identity G = (2Σi·xᵢ − (n+1)Σx)/(n·Σx) over
    * ascending-sorted values, which needs ONE ranked pass instead of
    * the all-pairs |xᵢ−xⱼ| definition. Exactness: values in integer
    * cents, rank·value products summed in DECIMAL(38,0)/HUGEINT, and
    * the final ratio is ONE integer division after scaling by 10⁹ —
    * no double until the display cast. The rank is a per-group
    * row_number with ties broken on event_id — a total order both
    * engines replay — but NOT a window: event_type has 5 values, so
    * `row_number() OVER (PARTITION BY event_type …)` would sort the
    * whole relation inside 5 tasks (round-12 verdict #1's
    * scale-killer class). [[graft.operators.Align.groupedRowNumber]]
    * computes the identical index distributed: one range-partitioned
    * global prefix count minus each group's broadcast start offset —
    * no task ever holds more than its range slice. */
  val a53Gini = Q(
    "a53_gini",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      def d(c: Column) = c.cast(DecimalType(38, 0))
      val e = Tables.load(s, dir, "events").select(col("event_type"),
        (Q.dec("value") * 100).cast("long").as("v"), col("event_id"))
      val a = graft.operators.Align
        .groupedRowNumber(e, Seq("event_type"), "i", col("v"), col("event_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(d(col("v"))).as("sv"),
          sum(d(col("i")) * d(col("v"))).as("siv"))
        .withColumn("gnum",
          (col("siv") * 2 - col("sv") * (d(col("n")) + 1)) *
            lit(1000000000L))
        .withColumn("gden", col("sv") * d(col("n")))
      a.select(col("event_type"), col("n"),
          (col("sv").cast("double") / lit(100.0)).as("total_value"),
          (expr("gnum div gden").cast("double") / lit(1.0e9)).as("gini"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
        SELECT event_type,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v, event_id
        FROM events),
      r AS (
        SELECT event_type, v,
          row_number() OVER (PARTITION BY event_type
                             ORDER BY v, event_id) AS i
        FROM e),
      a AS (
        SELECT event_type, count(*) AS n,
          sum(CAST(v AS HUGEINT)) AS sv,
          sum(CAST(i AS HUGEINT) * v) AS siv
        FROM r GROUP BY 1)
      SELECT event_type, n,
        CAST(sv AS DOUBLE) / 100.0 AS total_value,
        CAST(CAST((siv * 2 - sv * (n + 1)) * 1000000000 // (sv * n)
          AS BIGINT) AS DOUBLE) / 1.0e9 AS gini
      FROM a ORDER BY event_type"""))

  /** A52: BENFORD'S-LAW conformance (Newcomb 1881, Benford 1938) —
    * the first-significant-digit screen auditors run on money columns
    * (fabricated values over-use mid digits; organic multiplicative
    * data follows P(d) = log₁₀(1+1/d)). The nine Benford
    * probabilities are computed ONCE on the JVM and shipped as the
    * same double literals to both engines (the PortableLn.dbl
    * serialization), so no in-engine log exists anywhere; the digit
    * itself extracts through integer→string — exact by construction.
    * Per-digit χ² contributions floor to 1e-9 (the a45 discipline).
    * One scan, a 9-row groupBy, a 1-row total broadcast. */
  val a52Benford = Q(
    "a52_benford",
    (s, dir) => {
      import graft.functions.PortableLn.dbl
      val digitCase = (1 to 9).map(d =>
        s"WHEN $d THEN ${dbl(math.log10(1.0 + 1.0 / d))}").mkString(" ")
      val byD = Tables.load(s, dir, "orders")
        .select(expr("CAST(substr(CAST(CAST(round(o_totalprice) AS BIGINT)" +
          " AS STRING), 1, 1) AS BIGINT)").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val tot = byD.agg(sum("n_obs").as("n_total"))
      byD.crossJoin(broadcast(tot))
        .withColumn("expected", expr(
          s"CAST(n_total AS DOUBLE) * (CASE digit $digitCase END)"))
        .withColumn("contrib", expr(
          """CAST(floor(((CAST(n_obs AS DOUBLE) - expected)
             * (CAST(n_obs AS DOUBLE) - expected) / expected) * 1.0e9)
             AS BIGINT)""").cast("double") / lit(1.0e9))
        .select("digit", "n_obs", "expected", "contrib")
        .orderBy("digit")
    },
    Some {
      import graft.functions.PortableLn.dbl
      val digitCase = (1 to 9).map(d =>
        s"WHEN $d THEN ${dbl(math.log10(1.0 + 1.0 / d))}").mkString(" ")
      s"""WITH b AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice) AS BIGINT)
          AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders),
      byd AS (SELECT digit, count(*) AS n_obs FROM b GROUP BY 1),
      tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM byd),
      e AS (
        SELECT digit, n_obs,
          CAST(n_total AS DOUBLE) * (CASE digit $digitCase END) AS expected
        FROM byd CROSS JOIN tot)
      SELECT digit, n_obs, expected,
        CAST(CAST(floor(((CAST(n_obs AS DOUBLE) - expected)
            * (CAST(n_obs AS DOUBLE) - expected) / expected) * 1.0e9)
            AS BIGINT) AS DOUBLE) / 1.0e9 AS contrib
      FROM e ORDER BY digit"""
    })

  /** A51: HORVITZ–THOMPSON estimation from the 1/16 hash sample — the
    * "query the sample, estimate the corpus" pattern that keeps 100 TB
    * dashboards interactive: each sampled row is up-weighted by its
    * known inverse inclusion probability (×16), turning the sample
    * aggregate into an unbiased estimator of the full total; because
    * membership is a deterministic row predicate (md5 of the composite
    * row key — a26/a27/txt_sample's mechanism), the estimator is
    * mergeable, reproducible, and oracle-replayable. The query carries
    * its own ground truth: true total, estimate, and the permille
    * error in pure integer cents, so the estimator's accuracy is
    * hash-checked rather than asserted. One scan, one grouped
    * aggregate computing BOTH sides. */
  val a51HtEstimate = Q(
    "a51_ht_estimate",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
        Q.dec("l_extendedprice").as("rev"),
        (graft.operators.Dedup.hash56(
          concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))) % 16).as("g"))
      l.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("n_sampled"),
          sum(col("rev")).as("true_d"),
          (sum(when(col("g") === 0, col("rev"))) * 16).as("est_d"))
        .select(col("l_returnflag"), col("n"), col("n_sampled"),
          col("true_d").cast("double").as("true_rev"),
          col("est_d").cast("double").as("est_rev"),
          expr("""(1000 * abs(CAST(est_d * 100 AS BIGINT)
                              - CAST(true_d * 100 AS BIGINT)))
                  div CAST(true_d * 100 AS BIGINT)""").as("err_pm"))
        .orderBy("l_returnflag")
    },
    Some {
      val m56 = graft.operators.Dedup.M56
      s"""WITH l AS (
        SELECT l_returnflag,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS rev,
          (md5_number_lower(CAST(l_orderkey AS VARCHAR) || ':'
            || CAST(l_linenumber AS VARCHAR)) % $m56)::BIGINT % 16 AS g
        FROM lineitem),
      a AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
          sum(rev) AS true_d,
          sum(CASE WHEN g = 0 THEN rev END) * 16 AS est_d
        FROM l GROUP BY 1)
      SELECT l_returnflag, n, n_sampled,
        CAST(true_d AS DOUBLE) AS true_rev,
        CAST(est_d AS DOUBLE) AS est_rev,
        (1000 * abs(CAST(est_d * 100 AS BIGINT)
                    - CAST(true_d * 100 AS BIGINT)))
          // CAST(true_d * 100 AS BIGINT) AS err_pm
      FROM a ORDER BY 1"""
    })

  /** A27: quantiles over a deterministic hash sample — the sketch-family
    * quantile twin of a26 (t-digest state, like HLL's, is engine-private
    * and can't be oracle-replayed; a hash-threshold sample CAN). Rows
    * whose md5-derived event_id hash lands in a 10% gate form the
    * sample (mergeable by construction — membership is a pure row
    * predicate, exactly txt_sample's mechanism); exact p50/p90 are then
    * computed over sample rows only, so the sort that exact a17 pays on
    * the full table shrinks by the gate factor. */
  val a27SampleQuantile = Q(
    "a27_sample_quantile",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .filter(graft.operators.Dedup.hash56(col("event_id").cast("string")) % 100 < 10)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_sampled"),
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"))
        .orderBy("event_type"),
    Some(s"""SELECT event_type, count(*) AS n_sampled,
        quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.9) AS p90
      FROM events
      WHERE ((md5_number_lower(CAST(event_id AS VARCHAR)) % ${graft.operators.Dedup.M56})::BIGINT) % 100 < 10
      GROUP BY event_type ORDER BY event_type"""))

  /** A39: bottom-k-by-hash quantile SKETCH (Sketches.hashSampleQuantiles)
    * — a27's fixed-memory sibling. a27's 10% hash gate keeps state
    * ∝ data (fine for a one-shot query, wrong for a serving summary);
    * this keeps exactly k=64 values per group — the KMV idea applied to
    * percentiles: bottom-k rows by hash56(id) are a uniform sample,
    * merge = union-keep-k-smallest, shuffle = groups × k via the TopKW
    * partial aggregate. Every step replays in DuckDB (same hashes, same
    * k rows, same a17-proven interpolation), so the sketch OUTPUT is
    * oracle-EXACT — unlike t-digest, whose engine-private state pins
    * a18 to a tolerance contract forever. */
  val a39SampledQuantiles = Q(
    "a39_sampled_quantiles",
    (s, dir) => graft.operators.Sketches.hashSampleQuantiles(
        Tables.load(s, dir, "events"), "event_type", "event_id", "value",
        k = 64, qs = Seq(0.5, 0.9))
      .orderBy("event_type"),
    Some(s"""WITH s AS (
        SELECT event_type, event_id, value,
          (CAST(((md5_number_lower(CAST(event_id AS VARCHAR))
                  % ${graft.operators.Dedup.M56})::BIGINT) AS DOUBLE)
            / CAST(${graft.operators.Dedup.M56} AS DOUBLE)) AS u
        FROM events),
      r AS (
        SELECT event_type, event_id, value, u,
          row_number() OVER (PARTITION BY event_type
            ORDER BY u ASC, event_id ASC) AS rn,
          count(*) OVER (PARTITION BY event_type) AS n
        FROM s)
      SELECT event_type, CAST(n AS BIGINT) AS n,
        quantile_cont(value, 0.5) AS p50_est,
        quantile_cont(value, 0.9) AS p90_est
      FROM r WHERE rn <= 64
      GROUP BY event_type, n ORDER BY event_type"""))

  /** A40: WINSORIZED aggregation — clip values to each group's exact
    * [p05, p95] band before summing, the robust-statistics cleaning
    * step (a31 FLAGS outliers; this BOUNDS their influence — the tail
    * event no longer owns the mean). Two-phase: exact per-group
    * percentiles (the a17-proven pair), broadcast back, row-local
    * clamp, DECIMAL-contract sum. At 100 TB swap phase 1 for
    * a39's bottom-k sketch — the clamp phase is unchanged. */
  val a40Winsorize = Q(
    "a40_winsorize",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val pct = e.groupBy("event_type")
        .agg(expr("percentile(value, 0.05D)").as("p05"),
          expr("percentile(value, 0.95D)").as("p95"))
      e.join(broadcast(pct), Seq("event_type"))
        .select(col("event_type"), col("p05"), col("p95"),
          greatest(least(col("value"), col("p95")), col("p05")).as("v"))
        .groupBy("event_type", "p05", "p95")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))
            .cast("double").as("sum_clipped"))
        .orderBy("event_type")
    },
    Some("""WITH pct AS (
        SELECT event_type,
          quantile_cont(value, 0.05) AS p05,
          quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY 1)
      SELECT e.event_type, p.p05, p.p95, count(*) AS n,
        CAST(CAST(sum(CAST(greatest(least(e.value, p.p95), p.p05)
          AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_clipped
      FROM events e JOIN pct p USING (event_type)
      GROUP BY 1, 2, 3 ORDER BY e.event_type"""))

  /** A28: count-min frequency sketch — the "how often" sibling of a26's
    * "how many distinct" (reference per-term dashboard counters at
    * cardinalities where the exact groupBy stops fitting). The 4×256
    * cell table is built with map-side combine (shuffle = d·w rows per
    * partition, input-size-independent), then the 10 heaviest users'
    * frequencies are point-estimated as min over their 4 cells. All
    * bucket hashes derive from hash56, so DuckDB replays the EXACT
    * sketch — cells, estimates, everything; `exact_n` rides along to
    * expose the (deterministic) overcount. */
  val a28CmsHeavy = Q(
    "a28_cms_heavy",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cells = graft.operators.Sketches.cmsCells(ev, "user_id", d = 4, w = 256)
      val probes = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("user_id")).limit(10)
      graft.operators.Sketches.cmsEstimate(probes, "user_id", cells, d = 4, w = 256)
        .orderBy("user_id")
    },
    Some {
      def b(key: String, j: String) =
        s"(((md5_number_lower(CONCAT($j, ':', CAST($key AS VARCHAR))) % ${graft.operators.Dedup.M56})::BIGINT) % 256)"
      s"""WITH js AS (SELECT unnest(generate_series(0, 3)) AS j),
        cells AS (
          SELECT j, ${b("user_id", "j")} AS b, count(*) AS n
          FROM events CROSS JOIN js GROUP BY 1, 2),
        probes AS (
          SELECT user_id, count(*) AS exact_n FROM events
          GROUP BY 1 ORDER BY exact_n DESC, user_id LIMIT 10),
        ph AS (
          SELECT user_id, exact_n, j, ${b("user_id", "j")} AS b
          FROM probes CROSS JOIN js)
        SELECT ph.user_id, ph.exact_n, min(c.n) AS cms_n
        FROM ph JOIN cells c USING (j, b)
        GROUP BY 1, 2 ORDER BY user_id"""
    })

  /** A30: Pearson correlation + population covariance per group from
    * EXACT integer moment sums — the distributed one-pass five-sum
    * formulation (Σx, Σy, Σxy, Σx², Σy²), map-side combined, one
    * shuffle of five longs per group. Inputs round to integer units
    * FIRST (the .5 boundary of an integer round is always
    * binary-representable, so both engines see the same half cases);
    * every sum is then exact in BIGINT, the final scalars exact in
    * DECIMAL(38,0)/HUGEINT, and the only floating-point steps are the
    * closing cast/sqrt/divide — identical IEEE ops anywhere, hence
    * oracle-exact with NO tolerance. Built-in corr() aggregates floats
    * in partition order and is not replayable; this is, at the same one
    * shuffle. Headroom: 10^5-unit values hold to ~10^9 rows per group
    * in n·Σy²; past that widen the sums themselves to DECIMAL(38,0). */
  val a30Corr = Q(
    "a30_corr",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      def d(c: Column) = c.cast(DecimalType(38, 0))
      val b = Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
        round(col("l_quantity")).cast("long").as("x"),
        round(col("l_extendedprice")).cast("long").as("y"))
      val m = b.groupBy("l_returnflag").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val f = m.select(col("l_returnflag"), col("n"),
        (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))).as("num"),
        (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))).as("d1"),
        (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))).as("d2"))
      f.select(col("l_returnflag"), col("n"),
        when(col("d1") > 0 && col("d2") > 0,
          col("num").cast("double") /
            (sqrt(col("d1").cast("double")) * sqrt(col("d2").cast("double"))))
          .as("corr_qty_price"),
        (col("num").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("cov_pop"))
        .orderBy("l_returnflag")
    },
    Some("""WITH b AS (
        SELECT l_returnflag,
          CAST(round(l_quantity) AS BIGINT) AS x,
          CAST(round(l_extendedprice) AS BIGINT) AS y
        FROM lineitem),
      m AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
          CAST(sum(x*y) AS HUGEINT) AS sxy,
          CAST(sum(x*x) AS HUGEINT) AS sxx,
          CAST(sum(y*y) AS HUGEINT) AS syy
        FROM b GROUP BY 1),
      f AS (
        SELECT l_returnflag, n,
          (n*sxy - sx*sy) AS num,
          (n*sxx - sx*sx) AS d1,
          (n*syy - sy*sy) AS d2
        FROM m)
      SELECT l_returnflag, n,
        CASE WHEN d1 > 0 AND d2 > 0 THEN
          CAST(num AS DOUBLE) / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE)))
        END AS corr_qty_price,
        CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov_pop
      FROM f ORDER BY l_returnflag"""))

  /** S12/J10: the external-lookup join VALUE-verified (its rate-limit /
    * Retry-After contract is unit-tested with a fake clock; this query
    * pins row fidelity — zero lost rows, zero duplicates, correct
    * key→value alignment through the mapPartitions machinery). The
    * "service" is a broadcast-closure dictionary built from the nation
    * table, so the oracle is the equivalent equi-join. Pacing is a
    * genuine no-op here: burst covers the whole table, because a high
    * refill rate ALONE still sleeps — acquireDelayMs ceils every
    * sub-millisecond deficit to 1 ms once the burst drains. The paced
    * fleet contract has its own fake-clock spec. */
  val s12LookupJoin = Q(
    "s12_lookup_join",
    (s, dir) => {
      import s.implicits._
      val nations = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
        .as[(Long, String)].collect().toMap // 25 rows — a bounded dict
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("string").as("nk"))
      graft.operators.ExternalLookup.lookupJoin(
        sup, "nk", k => nations.get(k.toLong),
        callsPerSec = 1e9, burst = 1e6)
    },
    Some("""SELECT s_suppkey, s_name,
        CAST(s_nationkey AS VARCHAR) AS nk, n_name AS lookup_value
      FROM supplier JOIN nation ON s_nationkey = n_nationkey"""))

  /** J15: j4's edge rebuild over PRE-BUCKETED appointments
    * (Graph.sharedKeyEdgesBucketed): identical result — same oracle as
    * j4_shared_edges — but the group collect reads bucket-partitioned
    * input with NO Exchange (PlanSpec-pinned); the write-once bucketed
    * materialization is memoized per JVM exactly like j13's. This is
    * the M8 wholesale-rebuild path a warehouse would actually run. */
  val j15BucketedEdges = Q(
    "j15_bucketed_edges",
    (s, dir) => {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.Graph.sharedKeyEdgesBucketed(
          s, Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          tag = tag, buckets = 8, minShared = 2,
          maxGroupSize = Int.MaxValue)
        .select(col("item_a").as("part_a"), col("item_b").as("part_b"),
          col("weight").as("n_orders"))
    },
    Some("""SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        count(DISTINCT a.l_orderkey) AS n_orders
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2"""))

  /** J13: the co-located fact-to-fact join — both sides bucketed on the
    * join key (graft.sources.Bucketing), so the SortMergeJoin runs with
    * NO Exchange below it (pinned in PlanSpec). This is the at-scale
    * form of every repeated orderkey join in the workload: pay the
    * shuffle once at write, never again. Results are identical to the
    * plain join, which is what the oracle checks. */
  val j13Bucketed = Q(
    "j13_bucketed_join",
    (s, dir) => {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Bucketing.bucketedOrderJoin(s,
          Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "orders"), tag)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Q.dsum(col("l_quantity")).as("sum_qty"),
          Q.dsum(col("l_extendedprice")).as("sum_price"))
    },
    Some("""SELECT o.o_orderpriority, count(*) AS n,
        CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1"""))

  /** Graph triangles over the shared-key edges (Graph.triangleCount):
    * degree-ordered orientation bounds every vertex's wedge fan-out at
    * O(√m), so the count is two equi-joins even on power-law graphs.
    * The oracle replays the same orientation and joins. */
  val gTriangles = Q(
    "g_triangles",
    (s, dir) =>
      Graph.triangleCount(Graph.sharedEdgesView(s, dir)),
    Some("""WITH ld AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM ld a JOIN ld b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (
        SELECT item, count(*) AS d FROM (
          SELECT x AS item FROM edges UNION ALL SELECT y FROM edges)
        GROUP BY 1),
      oriented AS (
        SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y)
                    THEN e.x ELSE e.y END AS a,
               CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y)
                    THEN e.y ELSE e.x END AS b
        FROM edges e
        JOIN deg dx ON dx.item = e.x
        JOIN deg dy ON dy.item = e.y)
      SELECT count(*) AS n_triangles
      FROM oriented e1
      JOIN oriented e2 ON e1.b = e2.a
      JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b"""))

  /** G: common-neighbor link prediction (Graph.commonNeighbors) — top-3
    * introduction candidates per product, ranked by shared co-purchase
    * neighbors, existing edges excluded. Wedge cost is Σ deg(middle)²;
    * middles above degree 50 are cut (the heavy-middle rule — part of
    * the semantics, replayed by the oracle). Per-node top-k through the
    * skew-proof TopK aggregate. */
  val gLinkpred = Q(
    "g_linkpred",
    (s, dir) =>
      Graph.commonNeighbors(Graph.sharedEdgesView(s, dir),
        k = 3, maxMiddleDeg = 50L),
    Some("""WITH ld AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM ld a JOIN ld b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      und AS (
        SELECT x AS src, y AS dst FROM edges
        UNION ALL SELECT y, x FROM edges),
      deg AS (SELECT src, count(*) AS deg FROM und GROUP BY 1),
      mid AS (
        SELECT u.src, u.dst FROM und u JOIN deg d USING (src)
        WHERE d.deg <= 50),
      wed AS (
        SELECT l.dst AS a, r.dst AS b
        FROM mid l JOIN mid r ON l.src = r.src AND l.dst < r.dst),
      cn AS (SELECT a, b, count(*) AS cn FROM wed GROUP BY 1, 2),
      cand AS (
        SELECT c.a, c.b, c.cn FROM cn c
        LEFT JOIN edges e ON e.x = c.a AND e.y = c.b
        WHERE e.x IS NULL),
      pn AS (
        SELECT a AS node, b AS rec, cn FROM cand
        UNION ALL SELECT b, a, cn FROM cand)
      SELECT node, rec, cn, rank FROM (
        SELECT node, rec, cn,
          row_number() OVER (PARTITION BY node
            ORDER BY cn DESC, rec ASC) AS rank
        FROM pn) WHERE rank <= 3"""))

  /** Local clustering coefficient per node (Graph.localClustering) —
    * triangleCount's per-node refinement: how interconnected each
    * product's co-purchase neighborhood is, in exact integer permille.
    * Same degree-ordered orientation (O(√m) fan-out bound); the
    * witness explode adds 3 rows per triangle, proportional to the
    * answer. The oracle enumerates the same oriented triangles and
    * credits all three corners. */
  val gClustering = Q(
    "g_clustering",
    (s, dir) =>
      Graph.localClustering(Graph.sharedEdgesView(s, dir)),
    Some("""WITH ld AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM ld a JOIN ld b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (
        SELECT item, CAST(count(*) AS BIGINT) AS degree FROM (
          SELECT x AS item FROM edges UNION ALL SELECT y FROM edges)
        GROUP BY 1),
      oriented AS (
        SELECT CASE WHEN dx.degree < dy.degree
                      OR (dx.degree = dy.degree AND e.x < e.y)
                    THEN e.x ELSE e.y END AS a,
               CASE WHEN dx.degree < dy.degree
                      OR (dx.degree = dy.degree AND e.x < e.y)
                    THEN e.y ELSE e.x END AS b
        FROM edges e
        JOIN deg dx ON dx.item = e.x
        JOIN deg dy ON dy.item = e.y),
      tri AS (
        SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
        FROM oriented e1
        JOIN oriented e2 ON e1.b = e2.a
        JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b),
      tn AS (
        SELECT item, CAST(count(*) AS BIGINT) AS n_tri FROM (
          SELECT ta AS item FROM tri
          UNION ALL SELECT tb FROM tri
          UNION ALL SELECT tc FROM tri)
        GROUP BY 1)
      SELECT d.item, d.degree, coalesce(tn.n_tri, 0) AS n_tri,
        CASE WHEN d.degree >= 2
             THEN (2000 * coalesce(tn.n_tri, 0)) // (d.degree * (d.degree - 1))
             ELSE 0 END AS cc_pm
      FROM deg d LEFT JOIN tn USING (item)"""))

  /** J14: dynamic partition pruning — date-partitioned events joined to
    * a runtime-filtered dim of days (graft.sources.Partitioned). The
    * events scan carries a dynamicpruningexpression partition filter
    * (pinned in PlanSpec): at 100 TB it lists only the day directories
    * the dim selects, instead of scanning the lake. The at-scale form of
    * the reference's look-back harvest (weekly_scheduler.py:272-277). */
  val j14DppJoin = Q(
    "j14_dpp_join",
    (s, dir) => {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Partitioned.dppJoin(s, dir, tag)
        .groupBy("day")
        .agg(count(lit(1)).as("n_events"),
          Q.dsum(col("value")).as("sum_value"))
    },
    Some("""WITH f AS (SELECT CAST(ts AS DATE) AS day, value FROM events),
        d AS (SELECT DISTINCT day FROM f WHERE extract(day FROM day) <= 3)
      SELECT f.day, count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM f JOIN d USING (day) GROUP BY f.day"""))

  /** A31: robust outlier detection — median/MAD flagging per group
    * (the 3-sigma rule's robust cousin: mean/stddev are themselves
    * dragged by the outliers they're meant to find). Exactness: values
    * quantize to integer units FIRST, medians run in doubled-unit
    * spaces so every interpolated midpoint is integer-valued, and the
    * flag compares 2·dev₂ > 3·mad₄ — all-integer, oracle-exact.
    *
    * Scale note: Spark's exact percentile aggregates a value→count map,
    * so the quantization ALSO bounds aggregation state to the unit
    * range (≤49k counters here) independent of row count — exact
    * medians stay cluster-safe; no approx_percentile fallback needed
    * until the unit range itself explodes. */
  val a31Outliers = Q(
    "a31_outliers",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * lit(100)).cast("long").as("u"))
      val med = ev.groupBy("event_type")
        .agg((lit(2.0) * expr("percentile(u, 0.5)")).cast("long").as("med2"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(lit(2L) * col("u") - col("med2")))
      val mad = dev.groupBy("event_type")
        .agg((lit(2.0) * expr("percentile(dev2, 0.5)")).cast("long").as("mad4"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med2"), col("mad4"))
        .agg(count(lit(1)).as("n"),
          sum(when(lit(2L) * col("dev2") > lit(3L) * col("mad4"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .select(col("event_type"), col("n"), col("n_outliers"),
          (col("med2").cast("double") / lit(200.0)).as("median_value"),
          (col("mad4").cast("double") / lit(400.0)).as("mad_value"))
        .orderBy("event_type")
    },
    Some("""WITH b AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS u
        FROM events),
      med AS (
        SELECT event_type, CAST(2.0 * quantile_cont(u, 0.5) AS BIGINT) AS med2
        FROM b GROUP BY 1),
      dev AS (
        SELECT b.event_type, med2, abs(2 * u - med2) AS dev2
        FROM b JOIN med USING (event_type)),
      mad AS (
        SELECT event_type,
          CAST(2.0 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        FROM dev GROUP BY 1)
      SELECT event_type, count(*) AS n,
        CAST(sum(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers,
        CAST(med2 AS DOUBLE) / 200.0 AS median_value,
        CAST(mad4 AS DOUBLE) / 400.0 AS mad_value
      FROM dev JOIN mad USING (event_type)
      GROUP BY event_type, med2, mad4
      ORDER BY event_type"""))

  /** A32: per-group OLS trend line (order value over time per
    * priority) from the same exact five-sum formulation as a30 — one
    * map-side-combined shuffle of five BIGINTs per group; slope,
    * intercept, and r² close over exact DECIMAL(38,0) moments with
    * only the final IEEE divisions in float, hence oracle-exact. x is
    * epoch-days (exact small integers), y integer-rounded price.
    * intercept uses the closed form (sy·sxx − sx·sxy)/d1 — ONE
    * division over exact operands, rather than (sy − slope·sx)/n
    * whose already-rounded slope would compound through two more
    * multiplications. */
  val a32Regression = Q(
    "a32_regression",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      def d(c: Column) = c.cast(DecimalType(38, 0))
      val b = Tables.load(s, dir, "orders").select(col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("x"),
        round(col("o_totalprice")).cast("long").as("y"))
      val m = b.groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      m.select(col("o_orderpriority"), col("n"),
          (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))).as("num"),
          (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))).as("d1"),
          (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))).as("d2"),
          (d(col("sy")) * d(col("sxx")) - d(col("sx")) * d(col("sxy")))
            .as("num0"))
        .select(col("o_orderpriority"), col("n"),
          (col("num").cast("double") / col("d1").cast("double")).as("slope"),
          (col("num0").cast("double") / col("d1").cast("double"))
            .as("intercept"),
          ((col("num").cast("double") * col("num").cast("double")) /
            (col("d1").cast("double") * col("d2").cast("double"))).as("r2"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH b AS (
        SELECT o_orderpriority,
          CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
          CAST(round(o_totalprice) AS BIGINT) AS y
        FROM orders),
      m AS (
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
          CAST(sum(x*y) AS HUGEINT) AS sxy,
          CAST(sum(x*x) AS HUGEINT) AS sxx,
          CAST(sum(y*y) AS HUGEINT) AS syy
        FROM b GROUP BY 1),
      f AS (
        SELECT o_orderpriority, n,
          (n*sxy - sx*sy) AS num, (n*sxx - sx*sx) AS d1,
          (n*syy - sy*sy) AS d2, (sy*sxx - sx*sxy) AS num0
        FROM m)
      SELECT o_orderpriority, n,
        CAST(num AS DOUBLE) / CAST(d1 AS DOUBLE) AS slope,
        CAST(num0 AS DOUBLE) / CAST(d1 AS DOUBLE) AS intercept,
        (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
          / (CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)) AS r2
      FROM f ORDER BY o_orderpriority"""))

  /** A33: mergeable-sketch ROLLUP — cumulative distinct users per day
    * from per-day KMV sketches alone. The property that makes sketches
    * the warehouse rollup primitive: day sketches build once (groups×k
    * longs of shuffle, map-side combined), and every cumulative answer
    * after that merges sketch ARRAYS — k-smallest of the union of
    * k-smallest sets IS the k-smallest of the union, so the merge is
    * lossless and the rollup never re-scans the raw stream. The
    * triangular day≤day join touches |days|²·k longs — at 100 TB that
    * is the difference between re-scanning a year of events per report
    * and merging 365 arrays. All-integer, oracle-exact (the oracle
    * recomputes each cumulative sketch from scratch; equality with the
    * merged form is exactly the losslessness claim). */
  val a33SketchRollup = Q(
    "a33_sketch_rollup",
    (s, dir) => {
      val k = 64
      val daily = Tables.load(s, dir, "events")
        .select(col("ts").cast("date").as("day"),
          graft.operators.Dedup.hash56(col("user_id").cast("string")).as("h"))
        .groupBy("day")
        .agg(graft.operators.Sketches.kmv(k)(col("h")).as("kmv"))
      val cum = daily.as("a")
        .join(broadcast(daily.select(col("day").as("day_b"),
          col("kmv").as("kmv_b"))), col("day_b") <= col("a.day"))
        .groupBy(col("a.day").as("day"))
        .agg(slice(array_sort(array_distinct(
          flatten(collect_list(col("kmv_b"))))), 1, k).as("kmv"))
      daily.select(col("day"),
          graft.operators.Sketches.estimate("kmv", k).as("day_users_est"))
        .join(cum.select(col("day"),
          graft.operators.Sketches.estimate("kmv", k).as("cum_users_est")),
          "day")
        .orderBy("day")
    },
    Some {
      val m56 = graft.operators.Dedup.M56
      val scale = 63L * m56
      s"""WITH h AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day,
          ((md5_number_lower(CAST(user_id AS VARCHAR)) % $m56)::BIGINT) AS hv
        FROM events),
      r AS (
        SELECT day, hv,
          row_number() OVER (PARTITION BY day ORDER BY hv) AS rn
        FROM h),
      daily AS (
        SELECT day,
          CASE WHEN count(*) < 64 THEN count(*)
               ELSE $scale // max(hv) END AS day_users_est
        FROM r WHERE rn <= 64 GROUP BY day),
      days AS (SELECT DISTINCT day FROM h),
      ch AS (
        SELECT d.day, h.hv FROM days d
        JOIN (SELECT DISTINCT day, hv FROM h) h ON h.day <= d.day),
      cdh AS (SELECT DISTINCT day, hv FROM ch),
      cr AS (
        SELECT day, hv,
          row_number() OVER (PARTITION BY day ORDER BY hv) AS rn
        FROM cdh),
      cum AS (
        SELECT day,
          CASE WHEN count(*) < 64 THEN count(*)
               ELSE $scale // max(hv) END AS cum_users_est
        FROM cr WHERE rn <= 64 GROUP BY day)
      SELECT day, day_users_est, cum_users_est
      FROM daily JOIN cum USING (day) ORDER BY day"""
    })

  /** A34: key-skew report — the pre-join diagnostic that decides
    * whether a key needs j12's salting or AQE skew splitting BEFORE the
    * join runs. One frequency pass over the key (the profiling job pays
    * the key shuffle once — this IS the job), then 1-row integer
    * stats: hottest-key share, top-10 share, max/avg ratio, and the
    * median frequency (integer-exact percentile over the bounded
    * value→count state). All integer ‰/% fixed point, oracle-exact. */
  val a34SkewReport = Q(
    "a34_skew_report",
    (s, dir) => {
      val f = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("f"))
      val top10 = f.orderBy(col("f").desc, col("user_id")).limit(10)
        .agg(sum("f").as("top10_rows"))
      f.agg(count(lit(1)).as("n_keys"), sum("f").as("n_rows"),
          max("f").as("max_f"),
          (lit(2.0) * expr("percentile(f, 0.5)")).cast("long").as("med_f2"))
        .crossJoin(broadcast(top10))
        .select(col("n_keys"), col("n_rows"), col("max_f"),
          expr("(1000 * max_f) div n_rows").as("top1_share_pm"),
          expr("(1000 * top10_rows) div n_rows").as("top10_share_pm"),
          expr("(100 * max_f * n_keys) div n_rows").as("max_over_avg_pct"),
          expr("med_f2 div 2").as("median_f"))
    },
    Some("""WITH f AS (
        SELECT user_id, count(*) AS f FROM events GROUP BY 1),
      t AS (
        SELECT CAST(sum(f) AS BIGINT) AS top10_rows FROM (
          SELECT f FROM f ORDER BY f DESC, user_id LIMIT 10)),
      m AS (
        SELECT count(*) AS n_keys, CAST(sum(f) AS BIGINT) AS n_rows,
          max(f) AS max_f,
          CAST(2.0 * quantile_cont(f, 0.5) AS BIGINT) AS med_f2
        FROM f)
      SELECT n_keys, n_rows, max_f,
        (1000 * max_f) // n_rows AS top1_share_pm,
        (1000 * top10_rows) // n_rows AS top10_share_pm,
        (100 * max_f * n_keys) // n_rows AS max_over_avg_pct,
        med_f2 // 2 AS median_f
      FROM m, t"""))

  /** A35: snapshot drift report (operators.Profile.driftReport) — the
    * between-generations monitor a training-data pipeline runs before a
    * new crawl trains anything: per (dimension, bucket) counts and
    * integer-permille shares for both generations plus the absolute
    * share delta. The "new" generation is derived deterministically
    * (clicks hash-downsampled to ~30%), so the category histogram
    * shifts while value deciles barely move — both visible in delta_pm.
    * All-integer, oracle-exact. */
  val a35DriftReport = Q(
    "a35_drift_report",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      val ev = Tables.load(s, dir, "events")
      val newSnap = ev.filter(col("event_type") =!= "click" ||
        graft.operators.Dedup.hash56(col("event_id").cast("string")) % 10 < 3)
      def buckets(df: DataFrame) = df
        .select(lit("event_type").as("dim"), col("event_type").as("bucket"))
        .unionByName(df.select(lit("value_bin").as("dim"),
          concat(lit("b"), expr(
            "least(9, cast(round(value * 100) as bigint) div 5000)"))
            .as("bucket")))
      graft.operators.Profile.driftReport(buckets(ev), buckets(newSnap))
        .orderBy("dim", "bucket")
    },
    Some {
      val m56 = graft.operators.Dedup.M56
      s"""WITH newsnap AS (
        SELECT * FROM events WHERE event_type <> 'click'
          OR ((md5_number_lower(CAST(event_id AS VARCHAR)) % $m56)::BIGINT) % 10 < 3),
      ob AS (
        SELECT 'event_type' AS dim, event_type AS bucket FROM events
        UNION ALL
        SELECT 'value_bin',
          'b' || CAST(least(9, CAST(round(value * 100) AS BIGINT) // 5000)
            AS VARCHAR)
        FROM events),
      nb AS (
        SELECT 'event_type' AS dim, event_type AS bucket FROM newsnap
        UNION ALL
        SELECT 'value_bin',
          'b' || CAST(least(9, CAST(round(value * 100) AS BIGINT) // 5000)
            AS VARCHAR)
        FROM newsnap),
      oc AS (SELECT dim, bucket, count(*) AS n_old FROM ob GROUP BY 1, 2),
      nc AS (SELECT dim, bucket, count(*) AS n_new FROM nb GROUP BY 1, 2),
      j AS (
        SELECT coalesce(oc.dim, nc.dim) AS dim,
          coalesce(oc.bucket, nc.bucket) AS bucket,
          CAST(coalesce(n_old, 0) AS BIGINT) AS n_old,
          CAST(coalesce(n_new, 0) AS BIGINT) AS n_new
        FROM oc FULL OUTER JOIN nc
          ON oc.dim = nc.dim AND oc.bucket = nc.bucket),
      t AS (
        SELECT dim, CAST(sum(n_old) AS BIGINT) AS tot_old,
          CAST(sum(n_new) AS BIGINT) AS tot_new
        FROM j GROUP BY 1)
      SELECT j.dim, bucket, n_old, n_new,
        CASE WHEN tot_old = 0 THEN 0
             ELSE (1000 * n_old) // tot_old END AS share_old_pm,
        CASE WHEN tot_new = 0 THEN 0
             ELSE (1000 * n_new) // tot_new END AS share_new_pm,
        abs(CASE WHEN tot_old = 0 THEN 0
                 ELSE (1000 * n_old) // tot_old END
          - CASE WHEN tot_new = 0 THEN 0
                 ELSE (1000 * n_new) // tot_new END) AS delta_pm
      FROM j JOIN t USING (dim) ORDER BY dim, bucket"""
    })

  /** A37: concentration index — per event type, the Herfindahl–
    * Hirschman index of user-activity shares (Σ shareᵢ², the standard
    * "is this market/keyspace dominated by a few players" statistic;
    * here: is an event type's volume spread across users or owned by a
    * handful). Computed exactly in integer basis points of a full
    * 10000-point HHI: hhi_bp = (10⁸·Σfᵢ²) div (Σf)² — LONG floor
    * division, matching DuckDB's `//` bit-for-bit (decimal division
    * would round half-up at its result scale before any cast and
    * disagree with the oracle's floor on knife-edge quotients).
    * Headroom: 10⁸·Σfᵢ² fits a LONG to ~3·10⁵ rows per hottest key;
    * past that pre-scale the frequencies (f div 10 shifts both sums by
    * 100, leaving the ratio intact to rounding) or lift into
    * DECIMAL(38,0) with an explicit floor. Complements a34's order
    * statistics (max/top-10 share) with the full-distribution scalar;
    * one frequency pass keyed (event_type, user), one bounded rollup.
    * All-integer, oracle-exact. */
  val a37Concentration = Q(
    "a37_concentration",
    (s, dir) => {
      val f = Tables.load(s, dir, "events")
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("f"))
      f.groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
          sum("f").as("n_rows"),
          sum(col("f") * col("f")).as("sum_f2"))
        .select(col("event_type"), col("n_users"), col("n_rows"),
          expr("(100000000 * sum_f2) div (n_rows * n_rows)").as("hhi_bp"))
        .orderBy("event_type")
    },
    Some("""WITH f AS (
        SELECT event_type, user_id, count(*) AS f FROM events GROUP BY 1, 2)
      SELECT event_type, count(*) AS n_users,
        CAST(sum(f) AS BIGINT) AS n_rows,
        CAST((100000000 * CAST(sum(f * f) AS HUGEINT))
          // (CAST(sum(f) AS HUGEINT) * CAST(sum(f) AS HUGEINT))
          AS BIGINT) AS hhi_bp
      FROM f GROUP BY event_type ORDER BY event_type"""))

  val all: Seq[Q] = Seq(f3Classify, f9OfficerSplit, f11Borough, f13Domain,
    f8CleanOfficer, f21Entities, gDegrees, gTriangles, gClustering, gBfs, gPpr, gSssp, gLinkpred, gHyperball, gBetweenness, gRandomWalks, gWalkPairs, a17Percentiles,
    j12Salted, a18Sketches, a26KmvSketch, a42Hll, a46HllSmall, a27SampleQuantile, a28CmsHeavy,
    a29KmvSetops, a41KmvSetops256, a51HtEstimate, a52Benford, a53Gini, a54Spearman, a55MannWhitney, a56Ks, a57Kruskal, a58Anova, a59WelchTtest, a60Cuped, a61BootstrapCi, a62PropZtest, a63Did, a64Srm, a65BhFdr, a66KendallTau, a39SampledQuantiles, a40Winsorize, a30Corr, a31Outliers, a32Regression, a33SketchRollup,
    a34SkewReport, a35DriftReport, a37Concentration, j13Bucketed, j14DppJoin,
    j15BucketedEdges, s12LookupJoin)
}
