package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** JSON handling and set-merge shapes (SURVEY.md §2.8 array/map/json,
  * §2.7 U5). */
object Extras {

  /** JSON key extraction from a raw payload column (reference
    * app.py:2038-2043 — enrichment_data JSON queried by key). */
  val jsonExtract = Q(
    "f_json_extract",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k")),
    Some("""SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) % 10 AS k_bucket,
        count(*) AS n,
        CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)) AS BIGINT) AS sum_k
      FROM events GROUP BY 1"""))

  /** U5: set-merge across group members — distinct union of token arrays
    * (reference data_enrichment.py:209-230 technology/profile merge). */
  val u5ArrayMerge = Q(
    "u5_array_merge",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy("lang")
        .agg(size(array_distinct(flatten(collect_list(split(col("text"), " ")))))
          .as("n_distinct_tokens"),
          count(lit(1)).as("n_docs")),
    Some("""SELECT lang,
        len(list_distinct(flatten(list(string_split(text, ' '))))) AS n_distinct_tokens,
        count(*) AS n_docs
      FROM documents GROUP BY 1"""))

  /** A4: parallel per-dimension counts as one CUBE pass (reference
    * database.py:1163-1181 runs three separate GROUP BYs; cube is the
    * single-scan upgrade — SURVEY §2.4). */
  val a4Cube = Q(
    "a4_cube",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .cube("lang", "source")
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .select(coalesce(col("lang"), lit("(all)")).as("lang"),
          coalesce(col("source"), lit("(all)")).as("source"),
          col("n"), col("gid")),
    Some("""SELECT coalesce(lang, '(all)') AS lang,
        coalesce(source, '(all)') AS source, count(*) AS n,
        grouping(lang) * 2 + grouping(source) AS gid
      FROM documents GROUP BY CUBE (lang, source)"""))

  /** S7: ES bool-query source — term + range + should-phrases translated
    * to pushed-down predicates with a `_source` projection (reference
    * api_clients.py:677-741). */
  val s7EsBool = Q(
    "s7_es_bool_query",
    (s, dir) => {
      import graft.sources.EsQuery._
      search(
        Tables.load(s, dir, "documents"),
        Bool(
          must = Seq(Term("lang", "en"), Range("n_chars", gte = Some(100), lt = Some(400))),
          should = Seq(MatchPhrase("text", "the row"), MatchPhrase("text", "spark")),
          mustNot = Seq(Term("source", "src3"))),
        source = Seq("doc_id", "lang", "source", "n_chars"))
    },
    Some("""SELECT doc_id, lang, source, n_chars FROM documents
      WHERE lang = 'en' AND n_chars >= 100 AND n_chars < 400
        AND (text LIKE '%the row%' OR text LIKE '%spark%')
        AND NOT (source = 'src3')"""))

  /** F19: email-pattern candidate generation — six deterministic
    * patterns exploded per contact (reference
    * contact_enrichment.py:232-240). */
  val f19EmailPatterns = Q(
    "f19_email_patterns",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          lower(regexp_extract(col("c_name"), "([A-Za-z]+)", 1)).as("first"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("last"),
          concat(lower(col("c_mktsegment")), lit(".test")).as("domain"))
        .filter(col("c_custkey") < 200)
      c.select(col("c_custkey"), posexplode(array(
          concat(col("first"), lit("."), col("last"), lit("@"), col("domain")),
          concat(col("first"), lit("@"), col("domain")),
          concat(col("last"), lit("@"), col("domain")),
          concat(substring(col("first"), 1, 1), col("last"), lit("@"), col("domain")),
          concat(col("first"), lit("_"), col("last"), lit("@"), col("domain")),
          concat(col("last"), lit("."), col("first"), lit("@"), col("domain")))))
        .select(col("c_custkey"), col("pos").as("pattern_idx"),
          col("col").as("email"))
    },
    Some("""WITH c AS (
        SELECT c_custkey,
          lower(regexp_extract(c_name, '([A-Za-z]+)', 1)) AS f,
          regexp_extract(c_name, '([0-9]+)', 1) AS l,
          lower(c_mktsegment) || '.test' AS d
        FROM customer WHERE c_custkey < 200)
      SELECT c_custkey, u.pattern_idx, u.email FROM c,
        LATERAL (SELECT unnest(['0','1','2','3','4','5'])::INT AS pattern_idx,
                        unnest([f || '.' || l || '@' || d,
                                f || '@' || d,
                                l || '@' || d,
                                substring(f, 1, 1) || l || '@' || d,
                                f || '_' || l || '@' || d,
                                l || '.' || f || '@' || d]) AS email) u"""))

  /** D5: month-chunk iteration — sequence + explode over a date range
    * (reference api_clients.py:998-1048 month partitioning to bypass the
    * ES 10k cap; the engine-side analog of manual partition pruning). */
  val d5MonthChunks = Q(
    "d5_month_chunks",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val months = o
        .agg(date_trunc("month", min(col("o_orderdate"))).as("lo"),
          date_trunc("month", max(col("o_orderdate"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 MONTH"))).as("month"))
      val counts = o
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"))
      months.join(counts, Seq("month"), "left_outer")
        .select(col("month").cast("date").as("month"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    },
    Some("""WITH bounds AS (
        SELECT date_trunc('month', min(o_orderdate)) AS lo,
               date_trunc('month', max(o_orderdate)) AS hi
        FROM orders),
      months AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
        FROM bounds),
      counts AS (
        SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n_orders
        FROM orders GROUP BY 1)
      SELECT CAST(m.month AS DATE) AS month,
        coalesce(c.n_orders, 0) AS n_orders
      FROM months m LEFT JOIN counts c ON m.month = c.month"""))

  /** A1: catalog-wide table counts as one relation (reference
    * database.py:458-471 — the 9-table stats panel). */
  val a1TableCounts = Q(
    "a1_table_counts",
    (s, dir) =>
      Tables.names.map { n =>
        Tables.load(s, dir, n).agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("table_name"), col("n_rows"))
      }.reduce(_.unionByName(_)),
    Some(Tables.names
      .map(n => s"SELECT '$n' AS table_name, count(*) AS n_rows FROM $n")
      .mkString("\n      UNION ALL ")))

  /** F17: per-group display string — "item (qty); …" sorted for
    * determinism (reference weekly_scheduler.py:955-966 officer
    * display). Strings are built before sorting: binary string order is
    * identical across engines, struct-sort semantics are not. */
  val f17DisplayString = Q(
    "f17_display_string",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"),
          concat(col("l_partkey").cast("string"), lit(" ("),
            col("l_quantity").cast("int").cast("string"), lit(")")).as("d"))
        .groupBy("l_orderkey")
        .agg(array_join(array_sort(collect_list(col("d"))), "; ").as("parts_display")),
    Some("""SELECT l_orderkey,
        array_to_string(list_sort(list(d)), '; ') AS parts_display
      FROM (
        SELECT l_orderkey,
          CAST(l_partkey AS VARCHAR) || ' (' || CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) || ')' AS d
        FROM lineitem WHERE l_orderkey < 500)
      GROUP BY 1"""))

  /** F20: confidence scoring with bonuses, floor and cap (reference
    * contact_enrichment.py:289-322 — Hunter score/100 with clamps,
    * LinkedIn +0.2/+0.1 bonuses). */
  val f20Confidence = Q(
    "f20_confidence",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          least(greatest(col("value") / 100.0, lit(0.1)), lit(0.9)).as("base"),
          when(col("event_type") === "purchase", 0.2)
            .when(col("event_type") === "click", 0.1)
            .otherwise(0.0).as("bonus"))
        .select(col("event_id"),
          least(col("base") + col("bonus"), lit(1.0)).as("confidence")),
    Some("""SELECT event_id,
        least(least(greatest(value / 100.0, 0.1), 0.9) +
          CASE WHEN event_type = 'purchase' THEN 0.2
               WHEN event_type = 'click' THEN 0.1 ELSE 0.0 END, 1.0) AS confidence
      FROM events"""))

  /** D2: UK dd/MM/yyyy format round-trip (reference app.py:237-238,
    * api_clients.py:692-698). */
  val d2UkRoundtrip = Q(
    "d2_uk_roundtrip",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          graft.functions.DateFunctions.formatUkDate(col("o_orderdate")).as("uk"),
          graft.functions.DateFunctions.parseUkDate(
            graft.functions.DateFunctions.formatUkDate(col("o_orderdate"))).as("back")),
    Some("""SELECT o_orderkey, strftime(o_orderdate, '%d/%m/%Y') AS uk,
        CAST(try_strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS back
      FROM orders"""))

  /** D8: business-day lead time — weekdays between order date and each
    * line's ship date, summarized per priority (the reference's weekly
    * scheduler reasons in working days). Engine-portable weekday math:
    * dayofweek CONVENTIONS differ between engines (Spark counts from
    * Sunday=1, DuckDB from Sunday=0 — an off-by-one that silently
    * corrupts results), so instead g(d) = weekdays since the epoch
    * MONDAY 1970-01-05 = (days div 7)·5 + least(days mod 7, 5), and
    * busdays(a,b) = g(b) − g(a) — pure integer day arithmetic both
    * engines compute identically, no dow function anywhere. Averages in
    * integer thousandths. */
  val d8Busdays = Q(
    "d8_busdays",
    (s, dir) => {
      def g(c: String) =
        s"((datediff($c, DATE '1970-01-05') div 7) * 5" +
          s" + least(datediff($c, DATE '1970-01-05') % 7, 5))"
      val j = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          expr(s"CAST(${g("CAST(l_shipdate AS DATE)")} " +
            s"- ${g("CAST(o_orderdate AS DATE)")} AS BIGINT)").as("busdays"))
      j.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), max("busdays").as("max_busdays"),
          expr("(1000 * sum(busdays)) div count(1)").as("avg_busdays_k"))
        .orderBy("o_orderpriority")
    },
    Some {
      def g(c: String) =
        s"((date_diff('day', DATE '1970-01-05', $c) // 7) * 5" +
          s" + least(date_diff('day', DATE '1970-01-05', $c) % 7, 5))"
      s"""WITH j AS (
        SELECT o_orderpriority,
          ${g("CAST(l_shipdate AS DATE)")}
            - ${g("CAST(o_orderdate AS DATE)")} AS busdays
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      SELECT o_orderpriority, count(*) AS n,
        CAST(max(busdays) AS BIGINT) AS max_busdays,
        CAST((1000 * sum(busdays)) // count(*) AS BIGINT) AS avg_busdays_k
      FROM j GROUP BY 1 ORDER BY 1"""
    })

  /** DQ: declarative expectations audit (operators.Expectations) — the
    * ingest gate: four row-local rules folded into ONE scan, plus key
    * uniqueness (key-only shuffle) and referential integrity
    * (anti-join). The corpus is clean, so violations are synthesized
    * deterministically (the dd_exact pattern): every %1000==7 order is
    * re-appended with a duplicate key, an orphaned-or-null custkey, a
    * rejected status, a negated price, and a malformed priority — each
    * rule's count is therefore a non-trivial, oracle-checked value, and
    * a rule that stops firing is a hash mismatch, not a silent pass. */
  val dqExpectations = Q(
    "dq_expectations",
    (s, dir) => {
      import graft.operators.Expectations._
      val orders = Tables.load(s, dir, "orders")
      val bad = orders.filter(col("o_orderkey") % 1000 === 7)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey") + 1000000000L).as("o_custkey"),
          lit("X").as("o_orderstatus"),
          (col("o_totalprice") * lit(-1.0)).as("o_totalprice"),
          col("o_orderdate"), lit("9-BOGUS").as("o_orderpriority"))
      val t = orders.select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority").unionByName(bad)
      val cust = Tables.load(s, dir, "customer")
      audit(
        Some(t -> Seq(
          notNull("custkey_not_null", col("o_custkey")),
          inRange("totalprice_range", col("o_totalprice"), 0.0, 10000000.0),
          accepted("status_accepted", col("o_orderstatus"), Seq("F", "O", "P")),
          matches("priority_format", col("o_orderpriority"), "^[1-5]-"))),
        Seq(
          checkUnique(t, "orderkey_unique", Seq("o_orderkey")),
          checkRef(t, "custkey_refs_customer", "o_custkey",
            cust, "c_custkey")))
        .orderBy("rule")
    },
    Some("""WITH bad AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_custkey + 1000000000 END AS o_custkey,
          'X' AS o_orderstatus,
          o_totalprice * -1.0 AS o_totalprice,
          '9-BOGUS' AS o_orderpriority
        FROM orders WHERE o_orderkey % 1000 = 7),
      t AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          o_orderpriority FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          o_orderpriority FROM bad)
      SELECT 'custkey_not_null' AS rule,
        CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS violations FROM t
      UNION ALL
      SELECT 'totalprice_range',
        CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL
          OR o_totalprice < 0.0 OR o_totalprice > 10000000.0
          THEN 1 ELSE 0 END), 0) AS BIGINT) FROM t
      UNION ALL
      SELECT 'status_accepted',
        CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL
          OR o_orderstatus NOT IN ('F', 'O', 'P')
          THEN 1 ELSE 0 END), 0) AS BIGINT) FROM t
      UNION ALL
      SELECT 'priority_format',
        CAST(coalesce(sum(CASE WHEN o_orderpriority IS NULL
          OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
          THEN 1 ELSE 0 END), 0) AS BIGINT) FROM t
      UNION ALL
      SELECT 'orderkey_unique',
        CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM
        (SELECT count(*) AS n FROM t GROUP BY o_orderkey)
      UNION ALL
      SELECT 'custkey_refs_customer', CAST(count(*) AS BIGINT) FROM t
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)
      ORDER BY rule"""))

  val all: Seq[Q] = Seq(jsonExtract, u5ArrayMerge, a4Cube, s7EsBool,
    f19EmailPatterns, d5MonthChunks, a1TableCounts, f17DisplayString,
    f20Confidence, d2UkRoundtrip, d8Busdays, dqExpectations)
}
