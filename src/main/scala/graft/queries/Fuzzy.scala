package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.FuzzyJoin

/** J6 — the fuzzy similarity join, staged on customer names: applicants
  * are noisy variants (exact / extra suffix / typo) of company names; the
  * join must recover the source row through the right scoring tier. */
object Fuzzy {

  private[queries] val SuffixReSql =
    """(?i)[\s.,]+(limited|ltd\.?|plc|llp|llc|l\.l\.c\.|inc\.?|incorporated|corp\.?|corporation|company|co\.?|group|holdings?|partners(hip)?|properties|developments?|construction|builders?|homes)\s*$"""

  private[queries] def normSql(x: String) =
    s"trim(regexp_replace(regexp_replace(lower($x), '[^a-z0-9''\\- ]', ' ', 'g'), ' +', ' ', 'g'))"
  private[queries] def stripSql(x: String) =
    s"regexp_replace(regexp_replace($x, '$SuffixReSql', ''), '$SuffixReSql', '')"

  val j6FuzzyJoin = Q(
    "j6_fuzzy_join",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val companies = cust.select(col("c_custkey").as("company_id"),
        col("c_name").as("company_name"))
      val applicants = cust.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("applicant_id"),
          when(col("c_custkey") % 3 === 0,
            concat(regexp_replace(col("c_name"), "Customer", "Custmer"),
              lit(" Holdings Limited")))
            .when(col("c_custkey") % 3 === 1, concat(col("c_name"), lit(" LLP")))
            .otherwise(col("c_name")).as("applicant_name"))
      FuzzyJoin.matchNames(applicants, companies,
        "applicant_id", "applicant_name", "company_id", "company_name",
        minConfidence = 0.7, topK = 3, commonTokens = Seq("customer", "custmer"))
    },
    Some(s"""WITH companies AS (
        SELECT c_custkey AS company_id, c_name AS company_name,
          ${normSql("c_name")} AS c_norm,
          ${normSql(stripSql("c_name"))} AS c_base,
          regexp_extract(c_name, '([0-9]+)', 1) AS blk
        FROM customer),
      applicants AS (
        SELECT c_custkey AS applicant_id,
          CASE WHEN c_custkey % 3 = 0
                 THEN regexp_replace(c_name, 'Customer', 'Custmer') || ' Holdings Limited'
               WHEN c_custkey % 3 = 1 THEN c_name || ' LLP'
               ELSE c_name END AS applicant_name
        FROM customer WHERE c_custkey % 5 = 0),
      a2 AS (
        SELECT applicant_id, applicant_name,
          ${normSql("applicant_name")} AS a_norm,
          ${normSql(stripSql("applicant_name"))} AS a_base,
          regexp_extract(applicant_name, '([0-9]+)', 1) AS blk
        FROM applicants),
      scored AS (
        SELECT a.applicant_id, a.applicant_name, c.company_id, c.company_name,
          list_filter(list_distinct(string_split(a.a_base, ' ')),
            t -> length(t) > 2 AND t NOT IN ('the', 'and', 'of')) AS at,
          list_filter(list_distinct(string_split(c.c_base, ' ')),
            t -> length(t) > 2 AND t NOT IN ('the', 'and', 'of')) AS ct,
          a.a_norm, a.a_base, c.c_norm, c.c_base
        FROM a2 a JOIN companies c ON a.blk = c.blk),
      tiers AS (
        SELECT applicant_id, applicant_name, company_id, company_name,
          least(CASE WHEN (len(list_intersect(at, ct)) = len(at)
                        OR len(list_intersect(at, ct)) = len(ct))
                       AND len(list_intersect(at, ct)) > 0
                     THEN CAST(len(list_intersect(at, ct)) AS DOUBLE)
                          / CAST(len(at) + len(ct) - len(list_intersect(at, ct)) AS DOUBLE) + 0.2
                     ELSE CASE WHEN len(at) + len(ct) - len(list_intersect(at, ct)) > 0
                               THEN CAST(len(list_intersect(at, ct)) AS DOUBLE)
                                    / CAST(len(at) + len(ct) - len(list_intersect(at, ct)) AS DOUBLE)
                               ELSE 0.0 END END, 1.0) AS token_sim,
          CASE WHEN greatest(length(a_base), length(c_base)) = 0 THEN 1.0
               ELSE 1.0 - CAST(levenshtein(a_base, c_base) AS DOUBLE)
                    / CAST(greatest(length(a_base), length(c_base)) AS DOUBLE) END AS fuzzy_sim,
          a_norm, a_base, c_norm, c_base
        FROM scored),
      m AS (
        SELECT applicant_id, applicant_name, company_id, company_name,
          CASE WHEN a_norm = c_norm THEN 'exact'
               WHEN a_base = c_base THEN 'suffix_normalized'
               WHEN token_sim >= 0.7 THEN 'token'
               WHEN fuzzy_sim >= 0.8 THEN 'fuzzy' END AS method,
          CASE WHEN a_norm = c_norm THEN 1.0
               WHEN a_base = c_base THEN 0.95
               WHEN token_sim >= 0.7 THEN token_sim
               WHEN fuzzy_sim >= 0.8 THEN fuzzy_sim END AS confidence
        FROM tiers)
      SELECT applicant_id, applicant_name, company_id, company_name, method,
        confidence, match_rank
      FROM (
        SELECT *, row_number() OVER (PARTITION BY applicant_id
          ORDER BY confidence DESC, company_id) AS match_rank
        FROM m WHERE confidence >= 0.7)
      WHERE match_rank <= 3"""))

  val all: Seq[Q] = Seq(j6FuzzyJoin)
}
