package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.ApplicantPipeline

/** The composed applicant-pipeline job as ONE oracle-checked query
  * (reference webhook_handler.py:133-212 → applicant_pipeline.py:43-131).
  *
  * Input = deterministic synthetic applicants: noisy customer-name
  * variants (the j6 staging), plus the reference's pinned 5-row
  * validation batch (test_pipeline.py:171-193) and one individual (the
  * applicant_pipeline.py:148-150 skip rule). Output = long-format stage
  * stats, so the oracle pins every behavior at once: 3 validation
  * errors + 1 duplicate skipped + 1 individual skipped from the planted
  * rows, and the fuzzy-match volumes from the customer-derived rows.
  */
object E2E {

  val pipelineE2e = Q(
    "pipeline_e2e",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val companies = cust.select(col("c_custkey").as("company_id"),
        col("c_name").as("company_name"))
      val fromCust = cust.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("input_id"),
          concat(lit("APP/"), col("c_custkey")).as("planning_reference"),
          when(col("c_custkey") % 3 === 0,
            concat(regexp_replace(col("c_name"), "Customer", "Custmer"),
              lit(" Holdings Limited")))
            .when(col("c_custkey") % 3 === 1, concat(col("c_name"), lit(" LLP")))
            .otherwise(col("c_name")).as("applicant_name"))
      import s.implicits._
      val planted = Seq[(Long, String, String)](
        (1000001L, null, "Test Company Ltd"),      // missing reference
        (1000002L, "", "Whoever"),                 // empty reference
        (1000003L, "TEST/2025/006", ""),           // empty name
        (1000004L, "TEST/2025/007", "Valid Company Ltd"),  // valid
        (1000005L, "test/2025/007", "VALID COMPANY LTD"),  // dup after normalize
        (1000006L, "TEST/2025/008", "Mr John Smith"))      // individual
        .toDF("input_id", "planning_reference", "applicant_name")
      val out = ApplicantPipeline.run(
        fromCust.unionByName(planted),
        "input_id", "planning_reference", "applicant_name",
        companies, "company_id", "company_name",
        minConfidence = 0.7, topK = 3,
        commonTokens = Seq("customer", "custmer"))
      // the pipeline's stage caches are per-batch scratch: register so
      // the session releases them between queries (Output.unpersist is
      // the caller-managed alternative for batch loops)
      out.registerScratch()
      out.stats
    },
    Some(s"""WITH raw AS (
        SELECT c_custkey AS input_id, 'APP/' || c_custkey AS pref,
          CASE WHEN c_custkey % 3 = 0
                 THEN regexp_replace(c_name, 'Customer', 'Custmer') || ' Holdings Limited'
               WHEN c_custkey % 3 = 1 THEN c_name || ' LLP'
               ELSE c_name END AS name
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT * FROM (VALUES
          (1000001, NULL, 'Test Company Ltd'),
          (1000002, '', 'Whoever'),
          (1000003, 'TEST/2025/006', ''),
          (1000004, 'TEST/2025/007', 'Valid Company Ltd'),
          (1000005, 'test/2025/007', 'VALID COMPANY LTD'),
          (1000006, 'TEST/2025/008', 'Mr John Smith')) v(input_id, pref, name)),
      checked AS (
        SELECT input_id, pref, name,
          CASE WHEN pref IS NULL THEN 'Missing required field: planning_reference'
               WHEN length(trim(pref)) = 0 THEN 'Empty required field: planning_reference'
               WHEN name IS NULL THEN 'Missing required field: applicant_name'
               WHEN length(trim(name)) = 0 THEN 'Empty required field: applicant_name'
               WHEN length(trim(pref)) < 3 THEN 'Planning reference too short'
               WHEN length(trim(name)) < 2 THEN 'Applicant name too short' END AS error
        FROM raw),
      normalized AS (
        SELECT input_id, upper(trim(pref)) AS planning_reference,
          trim(name) AS raw_name,
          ${Fuzzy.normSql("trim(name)")} AS normalized_name,
          CASE WHEN regexp_matches(trim(name), '(?i)^(mr|mrs|ms|miss|dr|prof)\\.?\\s')
                 OR (len(regexp_split_to_array(trim(name), '\\s+')) BETWEEN 2 AND 3
                     AND NOT regexp_matches(trim(name), '${Fuzzy.SuffixReSql}'))
               THEN 'individual' ELSE 'company' END AS atype
        FROM checked WHERE error IS NULL),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY planning_reference, normalized_name
          ORDER BY input_id) AS rn
        FROM normalized),
      matchable AS (
        SELECT input_id, raw_name,
          ${Fuzzy.normSql("raw_name")} AS a_norm,
          ${Fuzzy.normSql(Fuzzy.stripSql("raw_name"))} AS a_base,
          regexp_extract(raw_name, '([0-9]+)', 1) AS blk
        FROM ranked WHERE rn = 1 AND atype = 'company'),
      companies AS (
        SELECT c_custkey AS company_id, c_name AS company_name,
          ${Fuzzy.normSql("c_name")} AS c_norm,
          ${Fuzzy.normSql(Fuzzy.stripSql("c_name"))} AS c_base,
          regexp_extract(c_name, '([0-9]+)', 1) AS blk
        FROM customer),
      scored AS (
        SELECT a.input_id, c.company_id,
          list_filter(list_distinct(string_split(a.a_base, ' ')),
            t -> length(t) > 2 AND t NOT IN ('the', 'and', 'of')) AS at,
          list_filter(list_distinct(string_split(c.c_base, ' ')),
            t -> length(t) > 2 AND t NOT IN ('the', 'and', 'of')) AS ct,
          a.a_norm, a.a_base, c.c_norm, c.c_base
        FROM matchable a JOIN companies c ON a.blk = c.blk AND a.blk <> ''),
      tiers AS (
        SELECT input_id, company_id,
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
        SELECT input_id, company_id,
          CASE WHEN a_norm = c_norm THEN 1.0
               WHEN a_base = c_base THEN 0.95
               WHEN token_sim >= 0.7 THEN token_sim
               WHEN fuzzy_sim >= 0.8 THEN fuzzy_sim END AS confidence
        FROM tiers),
      topm AS (
        SELECT input_id, company_id FROM (
          SELECT *, row_number() OVER (PARTITION BY input_id
            ORDER BY confidence DESC, company_id) AS match_rank
          FROM m WHERE confidence >= 0.7)
        WHERE match_rank <= 3)
      SELECT 'total_input' AS metric, count(*) AS value FROM checked
      UNION ALL SELECT 'validation_errors', count(*) FROM checked WHERE error IS NOT NULL
      UNION ALL SELECT 'duplicates_skipped', count(*) FROM ranked WHERE rn > 1
      UNION ALL SELECT 'unique_applicants', count(*) FROM ranked WHERE rn = 1
      UNION ALL SELECT 'individuals_skipped', count(*) FROM ranked WHERE rn = 1 AND atype = 'individual'
      UNION ALL SELECT 'companies_processed', count(*) FROM ranked WHERE rn = 1 AND atype = 'company'
      UNION ALL SELECT 'match_rows', count(*) FROM topm
      UNION ALL SELECT 'matched_applicants', count(DISTINCT input_id) FROM topm"""))

  val all: Seq[Q] = Seq(pipelineE2e)
}
