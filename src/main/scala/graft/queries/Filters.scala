package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Predicate / projection / sort-limit inventory (SURVEY.md §2.2, §2.6). */
object Filters {

  /** P2: equality filters (reference database.py:333-338). */
  val p2Eq = Q(
    "p2_eq_filter",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "value"),
    Some("""SELECT event_id, user_id, value FROM events
      WHERE event_type = 'click' AND user_id < 50"""))

  /** P3: null-tolerant OR filter (reference database.py:351-357 —
    * provider == p OR provider IS NULL). The data has no nulls, so nulls
    * are synthesized with nullif to exercise three-valued logic. */
  val p3NullOr = Q(
    "p3_null_or",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("lang2", nullif(col("lang"), lit("de")))
        .filter(col("lang2") === "en" || col("lang2").isNull)
        .select("doc_id", "lang2", "source"),
    Some("""SELECT doc_id, nullif(lang, 'de') AS lang2, source FROM documents
      WHERE nullif(lang, 'de') = 'en' OR nullif(lang, 'de') IS NULL"""))

  /** P7: column pruning — narrow projection with renames; `.explain`
    * shows ReadSchema limited to the three columns
    * (reference api_clients.py:730-741 `_source` list). */
  val p7Project = Q(
    "p7_projection",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"),
          upper(col("p_type")).as("type_uc")),
    Some("SELECT p_partkey AS id, p_name AS name, upper(p_type) AS type_uc FROM part"))

  /** P8: derived/computed columns (reference app.py:321 URL build,
    * database.py:530-537 address format). */
  val p8Derived = Q(
    "p8_derived",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          concat(lit("https://example.test/customer/"),
            col("c_custkey").cast("string")).as("url"),
          when(col("c_acctbal") >= 5000, "high")
            .when(col("c_acctbal") >= 1000, "mid")
            .otherwise("low").as("balance_band"),
          concat_ws(" / ", col("c_name"), col("c_mktsegment")).as("display")),
    Some("""SELECT c_custkey,
        'https://example.test/customer/' || CAST(c_custkey AS VARCHAR) AS url,
        CASE WHEN c_acctbal >= 5000 THEN 'high'
             WHEN c_acctbal >= 1000 THEN 'mid' ELSE 'low' END AS balance_band,
        concat_ws(' / ', c_name, c_mktsegment) AS display
      FROM customer"""))

  /** P9: 3-method boolean classifier — contains OR ends-with OR phrase
    * (reference utils.py:367-426 is_outline). Client-side expression and
    * the pushed-down filter are the same Column, so no sampling-bias
    * divergence (api_clients.py:673-675). */
  val p9Classifier = Q(
    "p9_classifier",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("flagged",
          col("text").contains("spark") ||
          col("text").endsWith("query") ||
          col("text").contains("window the"))
        .groupBy("lang", "flagged").agg(count(lit(1)).as("n")),
    Some("""SELECT lang,
        (text LIKE '%spark%' OR text LIKE '%query' OR text LIKE '%window the%') AS flagged,
        count(*) AS n
      FROM documents GROUP BY 1, 2"""))

  /** P10: regex validation predicates with error side-channel counts
    * (reference utils.py:10-26, applicant_processor.py:268-289). */
  val p10Regex = Q(
    "p10_regex_valid",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("valid_props", col("props").rlike("^\\{\"k\": [0-9]+\\}$"))
        .withColumn("valid_type", col("event_type").rlike("^[a-z_]+$"))
        .groupBy("valid_props", "valid_type").agg(count(lit(1)).as("n")),
    Some("""SELECT regexp_matches(props, '^\{"k": [0-9]+\}$') AS valid_props,
        regexp_matches(event_type, '^[a-z_]+$') AS valid_type, count(*) AS n
      FROM events GROUP BY 1, 2"""))

  /** O1: ORDER BY … DESC LIMIT n with unique tiebreak for determinism
    * (reference database.py:308-312). Spark plans a TakeOrderedAndProject —
    * no global sort. */
  val o1OrderLimit = Q(
    "o1_order_limit",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice"),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** O3: keyset-style pagination — page 3 of 20 by row_number
    * (reference app.py:1046-1056). */
  val o3Pagination = Q(
    "o3_pagination",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // orderBy + offset + limit plans as a top-k with offset — the page is
      // cut BEFORE ranking, so the row_number window only ever sees the 20
      // page rows (r1 ranked the whole table in one partition).
      Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .offset(40).limit(20)
        .withColumn("rn", row_number().over(Window.orderBy("c_custkey")) + lit(40))
        .select("rn", "c_custkey", "c_name")
    },
    Some("""SELECT rn, c_custkey, c_name FROM (
        SELECT row_number() OVER (ORDER BY c_custkey) AS rn, c_custkey, c_name
        FROM customer) WHERE rn > 40 AND rn <= 60"""))

  /** P5: plain case-sensitive substring post-filter (reference
    * app.py in-memory `if term in text` pass after the SQL ILIKE —
    * DIFFERENT semantics from P1's ILIKE: no case folding). First-class
    * entry; previously covered only via p1's contains. */
  val p5Substring = Q(
    "p5_substring",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .filter(col("p_name").contains("widget"))
        .select("p_partkey", "p_name", "p_type"),
    Some("""SELECT p_partkey, p_name, p_type FROM part
      WHERE contains(p_name, 'widget')"""))

  /** P6: search-then-restrict-to-selected (reference app.py search box +
    * checkbox selection: the text search runs over everything, the
    * action applies only to rows whose id is in the selected set — a
    * semi-join against the selection predicate, composed with the
    * search filter in ONE plan). */
  val p6SearchSelected = Q(
    "p6_search_selected",
    (s, dir) => {
      val selected = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_partkey").as("p_partkey"))
      Tables.load(s, dir, "part")
        .filter(lower(col("p_name")).contains("red"))
        .join(selected, Seq("p_partkey"), "left_semi")
        .select("p_partkey", "p_name", "p_brand")
    },
    Some("""SELECT p_partkey, p_name, p_brand FROM part
      WHERE contains(lower(p_name), 'red')
        AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)"""))

  /** O7: keyset (seek) pagination — the at-scale replacement for o3's
    * offset form. OFFSET N must still produce and discard N rows; the
    * keyset page is a pushed-down range predicate plus top-k, so page
    * 10^6 costs the same as page 1. The cursor is the last key of the
    * previous page (pinned here as a literal the way a client would
    * send it back). */
  val o7KeysetPage = Q(
    "o7_keyset_page",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name")
        .filter(col("c_custkey") > 40)
        .orderBy("c_custkey").limit(20),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE c_custkey > 40 ORDER BY c_custkey LIMIT 20"""))

  val all: Seq[Q] = Seq(p2Eq, p3NullOr, p7Project, p8Derived, p9Classifier,
    p10Regex, o1OrderLimit, o3Pagination, p5Substring, p6SearchSelected,
    o7KeysetPage)
}
