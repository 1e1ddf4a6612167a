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
        sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)) AS sum_k
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

  val all: Seq[Q] = Seq(jsonExtract, u5ArrayMerge, a4Cube, s7EsBool)
}
