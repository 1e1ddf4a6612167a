package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.{Catalog, TableStore}

/** The composed applicant pipeline — the reference system's
  * "INSERT … SELECT" (webhook_handler.py:133-212 batch endpoint +
  * applicant_pipeline.py:43-131): validate → normalize → dedupe →
  * skip-individuals → fuzzy company match → tier classification →
  * catalog upserts → officer-network edge rebuild, as one declarative
  * job over DataFrames.
  *
  * Error accounting follows the CODE, not the test's print text: from the
  * pinned 5-row batch (test_pipeline.py:171-193) the handler records 3
  * validation errors, processes 1, and silently skips 1 duplicate
  * (webhook_handler.py:144-148,173-192) — so duplicates are surfaced as
  * their own stat here instead of being folded into the error count.
  *
  * Scale: every stage is a narrow projection or a key-partitioned window;
  * the only joins are the blocked fuzzy join (FuzzyJoin) and business-key
  * merges (Merge) — nothing iterates on the driver.
  */
object ApplicantPipeline {

  /** validate_applicant_data (applicant_processor.py:268-289): first
    * failing check wins, in the reference's check order. Null = valid. */
  def validationError(pref: Column, name: Column): Column =
    when(pref.isNull, "Missing required field: planning_reference")
      .when(length(trim(pref)) === 0, "Empty required field: planning_reference")
      .when(name.isNull, "Missing required field: applicant_name")
      .when(length(trim(name)) === 0, "Empty required field: applicant_name")
      .when(length(trim(pref)) < 3, "Planning reference too short")
      .when(length(trim(name)) < 2, "Applicant name too short")

  /** Pipeline stage outputs — lazy DataFrames sharing one scan. The
    * checked/ranked/matches stages are cached (stats and persistence read
    * them repeatedly); call [[Output.unpersist]] when done with a batch
    * or a long-lived session accumulates per-batch cache entries. */
  final case class Output(
      errors: DataFrame,     // (input_id, error)
      applicants: DataFrame, // deduped: (input_id, planning_reference, raw_name, normalized_name, applicant_type)
      duplicates: DataFrame, // the rows dedupe dropped
      matches: DataFrame,    // (input_id, applicant_name, company_id, company_name, method, confidence, match_rank)
      stats: DataFrame,      // long-format (metric, value BIGINT)
      private[operators] val cached: Seq[DataFrame] = Nil) {
    def unpersist(): Unit = cached.foreach(_.unpersist())
    /** Hand the stage caches to [[Scratch]] for between-queries release
      * (registered queries can't unpersist inline without forcing the
      * plan eager). */
    def registerScratch(): Unit = cached.foreach(Scratch.register(_))
  }

  /** Run the batch through validate → normalize → dedupe → match.
    *
    * @param raw (ordinalCol, prefCol, nameCol) — ordinalCol must be
    *            GLOBALLY unique (webhook event id, not a per-batch
    *            ordinal): it orders first-wins dedup within the batch
    *            (applicant_processor.py:317-336) AND becomes the
    *            persisted surrogate id in [[runWithStore]], where a
    *            reused ordinal from a later micro-batch would collide
    *            with an earlier entity's row.
    * @param companies (companyId, companyName) — the match universe.
    */
  def run(raw: DataFrame, ordinalCol: String, prefCol: String, nameCol: String,
      companies: DataFrame, companyId: String, companyName: String,
      minConfidence: Double = 0.7, topK: Int = 3,
      commonTokens: Seq[String] = Nil): Output = {
    import org.apache.spark.sql.expressions.Window

    // cached: the stats block reads these lineages up to 8 times, and
    // runWithStore reads them again for its writes
    val checked = Scratch.cacheIfAbsent(raw.select(
      col(ordinalCol).as("input_id"),
      col(prefCol).as("pref_raw"), col(nameCol).as("name_raw"),
      validationError(col(prefCol), col(nameCol)).as("error")))

    val errors = checked.filter(col("error").isNotNull)
      .select("input_id", "error")

    // normalize_applicant_data (applicant_processor.py:291-315)
    val normalized = checked.filter(col("error").isNull).select(
      col("input_id"),
      upper(trim(col("pref_raw"))).as("planning_reference"),
      trim(col("name_raw")).as("raw_name"),
      TextFunctions.normalizeName(trim(col("name_raw"))).as("normalized_name"),
      when(TextFunctions.isLikelyIndividual(trim(col("name_raw"))),
        "individual").otherwise("company").as("applicant_type"))

    // deduplicate_applicants: first occurrence per (reference, normalized
    // name) survives — deterministic via the arrival ordinal
    val byKey = Window.partitionBy("planning_reference", "normalized_name")
      .orderBy("input_id")
    val ranked = Scratch.cacheIfAbsent(
      normalized.withColumn("__rn", row_number().over(byKey)))
    val applicants = ranked.filter(col("__rn") === 1).drop("__rn")
    val duplicates = ranked.filter(col("__rn") > 1).drop("__rn")

    // individuals never reach matching (applicant_pipeline.py:148-150)
    val matchable = applicants.filter(col("applicant_type") === "company")
    val matches = FuzzyJoin.matchNames(
      matchable.select(col("input_id"), col("raw_name")), companies,
      "input_id", "raw_name", companyId, companyName,
      minConfidence, topK, commonTokens)
      .withColumnRenamed("applicant_id", "input_id")
    Scratch.cacheIfAbsent(matches)

    val stat = (m: String, df: DataFrame) =>
      df.agg(count(lit(1)).cast("long").as("value"))
        .select(lit(m).as("metric"), col("value"))
    val stats = stat("total_input", checked)
      .unionByName(stat("validation_errors", errors))
      .unionByName(stat("duplicates_skipped", duplicates))
      .unionByName(stat("unique_applicants", applicants))
      .unionByName(stat("individuals_skipped",
        applicants.filter(col("applicant_type") === "individual")))
      .unionByName(stat("companies_processed", matchable))
      .unionByName(stat("match_rows", matches))
      .unionByName(stat("matched_applicants",
        matches.select("input_id").distinct()))

    Output(errors, applicants, duplicates, matches, stats,
      cached = Seq(checked, ranked, matches))
  }

  /** Charge-based tier rule (weekly_scheduler.py:917-919): records WITH
    * charge information → "Lender (No Contact)", without → raw-data tier. */
  def dataTier(hasCharges: Column): Column =
    when(hasCharges, "Lender (No Contact)").otherwise("Sic 41100 (Raw Data)")

  /** Store-wired variant: runs [[run]] and persists every side effect the
    * reference pipeline performs, against the real catalog tables:
    *
    *   1. planning_applications insert-if-absent on (borough, reference);
    *   2. applicants appended new-only on (planning_application_id,
    *      normalized_name), with the application id RESOLVED against the
    *      stored table — a reference seen in an earlier batch keeps its
    *      original id (webhook_handler.py:153-176);
    *   3. applicant_company_matches upserted on (applicant_id, company_id);
    *   4. tier classification upserted into enrichment_data on
    *      (company_id, provider) per the charge rule;
    *   5. shared_officer_edges rebuilt wholesale from appointments
    *      (M8 overwrite; applicant_pipeline.py:97-104).
    *
    * `companies` must carry (company_id, company_name, has_charges). */
  def runWithStore(store: TableStore, raw: DataFrame,
      ordinalCol: String, prefCol: String, nameCol: String,
      borough: String, companies: DataFrame,
      minConfidence: Double = 0.7, topK: Int = 3,
      commonTokens: Seq[String] = Nil): Output = {
    val out = run(raw, ordinalCol, prefCol, nameCol,
      companies, "company_id", "company_name",
      minConfidence, topK, commonTokens)
    val apps = out.applicants
    val matches = out.matches

    // one row per DISTINCT reference: two applicants can share a planning
    // application within a batch (dedup keys on reference+name, not
    // reference alone) — min input_id is the deterministic surviving id
    store.insertIfAbsent("planning_applications", Catalog.conform(
      apps.groupBy("planning_reference")
        .agg(min("input_id").as("id"))
        .select(col("id"), lit(borough).as("borough"),
          col("planning_reference").as("reference")),
      Catalog.planningApplications))

    // resolve each applicant to the SURVIVING planning-application id
    val pa = store.read("planning_applications")
      .select(col("id").as("planning_application_id"),
        col("reference").as("planning_reference"))
    val resolved = apps.join(pa, "planning_reference")
    val existing = store.read("applicants")
      .select("planning_application_id", "normalized_name")
    // localCheckpoint — NOT cache — before the append: the anti-join
    // reads the applicants path, and writing that same path recaches
    // every plan referencing it (Spark refreshes caches by path), so a
    // cached `fresh` would re-evaluate AFTER the append, see its own
    // output, and collapse to empty. The checkpoint cuts the lineage to
    // materialized blocks that no write can invalidate.
    val fresh = Merge.newOnly(resolved, existing,
      Seq("planning_application_id", "normalized_name")).localCheckpoint()
    store.append("applicants", Catalog.conform(
      fresh.select(col("input_id").as("id"), col("planning_application_id"),
        col("raw_name"), col("normalized_name"), col("applicant_type")),
      Catalog.applicants))

    // Matches are persisted only for applicants that LANDED this run: a
    // cross-batch redelivery is a skipped duplicate exactly like a
    // within-batch one (webhook_handler.py:144-148 skips duplicates
    // before matching) — without this gate a replayed webhook would
    // plant match/enrichment rows under an applicant id that was never
    // stored (a dangling foreign key in the reference schema).
    val landed = matches.join(fresh.select("input_id"),
      Seq("input_id"), "left_semi")

    store.upsert("applicant_company_matches", Catalog.conform(
      landed.select(
        xxhash64(col("input_id"), col("company_id")).as("id"),
        col("input_id").as("applicant_id"), col("company_id"),
        col("method").as("match_method"),
        col("confidence").as("confidence_score")),
      Catalog.applicantCompanyMatches))

    store.upsert("enrichment_data", Catalog.conform(
      landed.join(companies, "company_id")
        .select(col("company_id"), dataTier(col("has_charges")).as("tier"))
        .distinct()
        .select(col("company_id").as("id"), col("company_id"),
          lit("weekly_companies_house_import").as("provider"),
          concat(lit("{\"data_tier\": \""), col("tier"), lit("\"}"))
            .as("enrichment_data")),
      Catalog.enrichmentData))

    // M8: the officer network is a derived table — rebuilt wholesale from
    // appointments, never incrementally patched
    store.overwrite("shared_officer_edges", Catalog.conform(
      Graph.sharedKeyEdges(store.read("appointments"), "officer_id", "company_id")
        .select(xxhash64(col("item_a"), col("item_b")).as("id"),
          col("item_a").as("company_a_id"), col("item_b").as("company_b_id"),
          col("weight").cast("int").as("shared_officer_count")),
      Catalog.sharedOfficerEdges))

    out
  }
}
