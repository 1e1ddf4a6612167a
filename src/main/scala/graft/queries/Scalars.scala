package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{DateFunctions, TextFunctions}
import Q._

/** Scalar function inventory as verifiable queries (SURVEY.md §2.8):
  * every function is a Column expression from graft.functions, exercised
  * over the test tables and cross-checked in DuckDB. */
object Scalars {

  /** F1: name/text normalization — lower, strip punct, collapse ws
    * (reference applicant_processor.py:66-84). */
  val f1Normalize = Q(
    "f1_normalize",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.normalizeName(col("text")).as("norm")),
    Some("""SELECT doc_id,
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9''\- ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
      FROM documents"""))

  /** F2: corporate-suffix strip, stacked suffixes peeled twice (reference
    * applicant_processor.py:31-51,86-102). Suffixes are synthesized onto
    * customer names so the strip provably round-trips. */
  val f2SuffixStrip = Q(
    "f2_suffix_strip",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .withColumn("styled", concat(col("c_name"),
          when(col("c_custkey") % 3 === 0, " HOLDINGS LIMITED")
            .when(col("c_custkey") % 3 === 1, " Ltd.")
            .otherwise(" plc")))
      c.select(col("c_custkey"), col("styled"),
        TextFunctions.removeCompanySuffixes(col("styled")).as("stripped"),
        (TextFunctions.removeCompanySuffixes(col("styled")) === col("c_name"))
          .as("roundtrip"))
    },
    Some("""WITH styled AS (
        SELECT c_custkey, c_name, c_name ||
          CASE WHEN c_custkey % 3 = 0 THEN ' HOLDINGS LIMITED'
               WHEN c_custkey % 3 = 1 THEN ' Ltd.' ELSE ' plc' END AS styled
        FROM customer)
      SELECT c_custkey, styled,
        regexp_replace(regexp_replace(styled,
          '(?i)[\s.,]+(limited|ltd\.?|plc|llp|llc|l\.l\.c\.|inc\.?|incorporated|corp\.?|corporation|company|co\.?|group|holdings?|partners(hip)?|properties|developments?|construction|builders?|homes)\s*$', ''),
          '(?i)[\s.,]+(limited|ltd\.?|plc|llp|llc|l\.l\.c\.|inc\.?|incorporated|corp\.?|corporation|company|co\.?|group|holdings?|partners(hip)?|properties|developments?|construction|builders?|homes)\s*$', '') AS stripped,
        regexp_replace(regexp_replace(styled,
          '(?i)[\s.,]+(limited|ltd\.?|plc|llp|llc|l\.l\.c\.|inc\.?|incorporated|corp\.?|corporation|company|co\.?|group|holdings?|partners(hip)?|properties|developments?|construction|builders?|homes)\s*$', ''),
          '(?i)[\s.,]+(limited|ltd\.?|plc|llp|llc|l\.l\.c\.|inc\.?|incorporated|corp\.?|corporation|company|co\.?|group|holdings?|partners(hip)?|properties|developments?|construction|builders?|homes)\s*$', '') = c_name AS roundtrip
      FROM styled"""))

  /** F5: Levenshtein edit distance — Spark built-in vs DuckDB built-in
    * (reference applicant_processor.py:140-158 hand-rolled DP). */
  val f5Levenshtein = Q(
    "f5_levenshtein",
    (s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(lower(col("p_name")), lower(col("p_type"))).as("dist")),
    Some("SELECT p_partkey, levenshtein(lower(p_name), lower(p_type)) AS dist FROM part"))

  /** F7: token Jaccard with subset bonus (reference
    * applicant_processor.py:177-198). */
  val f7TokenJaccard = Q(
    "f7_token_jaccard",
    (s, dir) => {
      val keywords = array(Seq("spark", "table", "query", "data", "fast").map(lit): _*)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenJaccard(split(col("text"), " "), keywords).as("jaccard"))
    },
    Some("""SELECT doc_id,
        least(CASE WHEN (inter = na OR inter = nb) AND inter > 0
                   THEN base + 0.2 ELSE base END, 1.0) AS jaccard
      FROM (
        SELECT doc_id, inter, na, nb,
          CASE WHEN na + nb - inter > 0
               THEN CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)
               ELSE 0.0 END AS base
        FROM (
          SELECT doc_id,
            len(list_intersect(list_distinct(string_split(text, ' ')),
                ['spark','table','query','data','fast'])) AS inter,
            len(list_distinct(string_split(text, ' '))) AS na,
            5 AS nb
          FROM documents))"""))

  /** F10: address formatting — join non-empty parts with ", " (reference
    * database.py:530-537). */
  val f10AddressFormat = Q(
    "f10_address_format",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          TextFunctions.formatAddress(col("c_name"),
            nullif(col("c_mktsegment"), lit("AUTOMOBILE")),
            lit(""), lit("UK")).as("address")),
    Some("""SELECT c_custkey,
        concat_ws(', ', trim(c_name),
          nullif(trim(nullif(c_mktsegment, 'AUTOMOBILE')), ''),
          NULL, 'UK') AS address
      FROM customer"""))

  /** F12+F14: regex extraction + validation flags (reference
    * data_enrichment.py:259-269, utils.py:10-26). */
  val f12RegexExtract = Q(
    "f12_regex_extract",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          TextFunctions.isValidCompanyNumber(
            regexp_extract(col("c_name"), "([0-9]+)", 1).substr(lit(2), lit(8)))
            .as("valid_number")),
    Some("""SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        (regexp_matches(substring(regexp_extract(c_name, '([0-9]+)', 1), 2, 8), '^[0-9]{8}$')
         OR regexp_matches(substring(regexp_extract(c_name, '([0-9]+)', 1), 2, 8), '^[A-Z]{2}[0-9]{6}$')
         OR regexp_matches(substring(regexp_extract(c_name, '([0-9]+)', 1), 2, 8), '^0[0-9]{7}$')) AS valid_number
      FROM customer"""))

  /** F15: criteria-hash cache key (reference persistent_cache.py:42-44). */
  val f15CacheKey = Q(
    "f15_cache_key",
    (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey")).distinct()
        .select(col("c_mktsegment"), col("c_nationkey"),
          TextFunctions.cacheKey(col("c_mktsegment"),
            col("c_nationkey").cast("string")).as("cache_key")),
    Some("""SELECT c_mktsegment, c_nationkey,
        md5(lower(trim(c_mktsegment)) || '|' || lower(trim(CAST(c_nationkey AS VARCHAR)))) AS cache_key
      FROM (SELECT DISTINCT c_mktsegment, c_nationkey FROM customer)"""))

  /** F18: banded numeric formatting (reference utils.py:274-308). */
  val f18FormatBand = Q(
    "f18_format_band",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          concat(floor(col("o_totalprice") / 1000).cast("long").cast("string"),
            lit("K")).as("price_band"),
          when(col("o_totalprice") >= 400000, "jumbo")
            .when(col("o_totalprice") >= 200000, "large")
            .when(col("o_totalprice") >= 50000, "medium")
            .otherwise("small").as("size_label")),
    Some("""SELECT o_orderkey,
        CAST(CAST(floor(o_totalprice / 1000) AS BIGINT) AS VARCHAR) || 'K' AS price_band,
        CASE WHEN o_totalprice >= 400000 THEN 'jumbo'
             WHEN o_totalprice >= 200000 THEN 'large'
             WHEN o_totalprice >= 50000 THEN 'medium' ELSE 'small' END AS size_label
      FROM orders"""))

  /** D1: multi-format tolerant timestamp parsing (reference
    * database.py:202-210): the same date round-trips through two textual
    * formats and coalesced try-parses. */
  val d1MultiformatParse = Q(
    "d1_multiformat_parse",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .withColumn("raw",
          when(col("o_orderkey") % 2 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
            .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy")))
      o.select(col("o_orderkey"), col("raw"),
        DateFunctions.parseTimestampMulti(col("raw")).cast("date").as("parsed"))
    },
    Some("""WITH r AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               ELSE strftime(o_orderdate, '%d/%m/%Y') END AS raw
        FROM orders)
      SELECT o_orderkey, raw,
        CAST(coalesce(try_strptime(raw, '%Y-%m-%dT%H:%M:%S'),
                      try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
                      try_strptime(raw, '%Y-%m-%d'),
                      try_strptime(raw, '%d/%m/%Y')) AS DATE) AS parsed
      FROM r"""))

  /** D3: friendly date with ordinal suffix (reference app.py:230-247). */
  val d3FriendlyDate = Q(
    "d3_friendly_date",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          DateFunctions.friendlyDate(col("o_orderdate")).as("friendly")),
    Some("""SELECT o_orderkey,
        dayname(o_orderdate) || ' ' || CAST(day(o_orderdate) AS VARCHAR) ||
        CASE WHEN day(o_orderdate) IN (11,12,13) THEN 'th'
             WHEN day(o_orderdate) % 10 = 1 THEN 'st'
             WHEN day(o_orderdate) % 10 = 2 THEN 'nd'
             WHEN day(o_orderdate) % 10 = 3 THEN 'rd' ELSE 'th' END ||
        ' ' || monthname(o_orderdate) || ' ' || CAST(year(o_orderdate) AS VARCHAR) AS friendly
      FROM orders WHERE o_orderkey < 1000"""))

  val all: Seq[Q] = Seq(f1Normalize, f2SuffixStrip, f5Levenshtein,
    f7TokenJaccard, f10AddressFormat, f12RegexExtract, f15CacheKey,
    f18FormatBand, d1MultiformatParse, d3FriendlyDate)
}
