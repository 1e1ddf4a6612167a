package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string functions (SURVEY.md §2.8 F1–F22), each a pure `Column`
  * expression so Catalyst can fold/pushdown/codegen them — no UDFs in the
  * hot path. Semantics follow the reference implementations cited per
  * function (reference root: DatabaseConverter/).
  */
object TextFunctions {

  /** F1 — normalize a company/free-text name: lowercase, strip punctuation
    * (keep apostrophe and hyphen), collapse whitespace.
    * Reference: applicant_processor.py:66-84 (its lru_cache is unnecessary
    * here — expressions vectorize). */
  def normalizeName(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9'\\- ]", " "), " +", " "))

  /** Company-suffix alternation shared by F2 (20 suffix groups distilled;
    * reference applicant_processor.py:31-51). Anchored at end-of-string. */
  private val SuffixRe =
    "(?i)[\\s.,]+(limited|ltd\\.?|plc|llp|llc|l\\.l\\.c\\.|inc\\.?|" +
      "incorporated|corp\\.?|corporation|company|co\\.?|group|" +
      "holdings?|partners(hip)?|properties|developments?|" +
      "construction|builders?|homes)\\s*$"

  /** F2 — strip trailing corporate suffixes ("X HOLDINGS LIMITED" → "X").
    * Applied twice to peel stacked suffixes, as the reference's loop does
    * (applicant_processor.py:86-102). */
  def removeCompanySuffixes(c: Column): Column =
    regexp_replace(regexp_replace(c, SuffixRe, ""), SuffixRe, "")

  /** F3 — heuristic: is this applicant a private individual rather than a
    * company? Title prefix, or 2-3 words without a corporate suffix.
    * Reference: applicant_processor.py:104-125. */
  def isLikelyIndividual(c: Column): Column = {
    val titled = c.rlike("(?i)^(mr|mrs|ms|miss|dr|prof)\\.?\\s")
    val words = size(split(trim(c), "\\s+"))
    val hasSuffix = c.rlike(SuffixRe)
    titled || (words.between(2, 3) && !hasSuffix)
  }

  /** F4 — name tokens: suffix-strip → normalize → split → drop short
    * tokens and stopwords. Reference: applicant_processor.py:127-138. */
  def nameTokens(c: Column, stopwords: Seq[String] = Seq("the", "and", "of")): Column =
    filter(
      array_except(
        split(normalizeName(removeCompanySuffixes(c)), " "),
        lit(stopwords.toArray)),
      t => length(t) > lit(2))

  /** F7 — token Jaccard similarity with subset bonus (+0.2 capped at 1.0).
    * Reference: applicant_processor.py:177-198. */
  def tokenJaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    val union = (size(ad) + size(bd) - size(array_intersect(ad, bd))).cast("double")
    val base = when(union > 0, inter / union).otherwise(lit(0.0))
    val subset = inter === size(ad).cast("double") || inter === size(bd).cast("double")
    least(when(subset && inter > 0, base + 0.2).otherwise(base), lit(1.0))
  }

  /** F8 — clean an officer name: strip honorifics, flip "LAST, First" to
    * "First Last", keep first+last token, title-case.
    * Reference: app.py:805-842 (the richer of the two variants — SURVEY
    * §7.4 pins last-definition-wins). */
  def cleanOfficerName(c: Column): Column = {
    val flipped = when(c.contains(","),
      concat_ws(" ",
        trim(element_at(split(c, ",", 2), 2)),
        trim(element_at(split(c, ",", 2), 1))))
      .otherwise(c)
    val noTitle = regexp_replace(flipped,
      "(?i)\\b(mr|mrs|ms|miss|dr|prof|sir|dame)\\.?\\s+", "")
    val toks = split(trim(regexp_replace(noTitle, "\\s+", " ")), " ")
    initcap(lower(when(size(toks) >= 2,
      concat_ws(" ", element_at(toks, 1), element_at(toks, -1)))
      .otherwise(concat_ws(" ", toks))))
  }

  /** F9 — officer full name → (first_name, last_name) struct: uppercase,
    * strip titles, collapse whitespace; first + last token title-cased,
    * middle names dropped; fewer than 2 parts → ("", "").
    * Reference: contact_enrichment.py:270-287. */
  def splitOfficerName(c: Column): Column = {
    val cleaned = trim(regexp_replace(
      regexp_replace(upper(c), "\\b(MR|MRS|MS|MISS|DR|PROF)\\b\\.?\\s*", ""),
      "\\s+", " "))
    val parts = split(cleaned, " ")
    val enough = size(parts) >= 2
    struct(
      when(enough, initcap(lower(element_at(parts, 1)))).otherwise("")
        .as("first_name"),
      when(enough, initcap(lower(element_at(parts, -1)))).otherwise("")
        .as("last_name"))
  }

  /** F10 — join non-empty address parts with ", " (concat_ws skips NULLs;
    * empty strings are nulled first). Reference: database.py:530-537. */
  def formatAddress(parts: Column*): Column =
    concat_ws(", ", parts.map(p => nullif(trim(p), lit(""))): _*)

  /** F11 — borough name normalization: & → "and", collapse whitespace,
    * title case, plus the reference's special-case renames.
    * Reference: utils.py:323-365. */
  def normalizeBorough(c: Column): Column = {
    val cleaned = initcap(trim(regexp_replace(
      regexp_replace(lower(c), "\\s*&\\s*", " and "), "\\s+", " ")))
    when(cleaned === "City Of London", "City of London")
      .when(cleaned === "City Of Westminster", "Westminster")
      .when(cleaned === "Kingston Upon Thames", "Kingston upon Thames")
      .when(cleaned === "Richmond Upon Thames", "Richmond upon Thames")
      .when(cleaned === "Kensington And Chelsea", "Kensington and Chelsea")
      .otherwise(regexp_replace(cleaned, " And ", " and "))
  }

  /** F12 — UK postcode extraction. Reference: data_enrichment.py:259-269. */
  def extractPostcode(c: Column): Column =
    regexp_extract(upper(c), "([A-Z]{1,2}[0-9][A-Z0-9]?\\s*[0-9][A-Z]{2})", 1)

  /** F13 — guess a web domain from a company name.
    * Reference: utils.py:202-221. */
  def guessDomain(c: Column): Column = {
    val toks = filter(
      split(normalizeName(removeCompanySuffixes(c)), " "),
      t => length(t) > lit(0) && !t.isin("the", "and", "of", "a"))
    concat(array_join(slice(toks, 1, 3), ""), lit(".com"))
  }

  /** F14 — UK company-number validation (8 digits, or 2 letters + 6
    * digits, or leading zero-padded). Reference: utils.py:10-26. */
  def isValidCompanyNumber(c: Column): Column =
    c.rlike("^[0-9]{8}$") || c.rlike("^[A-Z]{2}[0-9]{6}$") ||
      c.rlike("^0[0-9]{7}$")

  /** F15 — deterministic cache key from normalized criteria columns.
    * Reference: persistent_cache.py:42-44 (md5 of sorted criteria). */
  def cacheKey(criteria: Column*): Column =
    md5(concat_ws("|", criteria.map(c => lower(trim(c))): _*))

  /** F21 — HTML entity fix. Reference: api_clients.py:916. */
  def fixHtmlEntities(c: Column): Column =
    regexp_replace(regexp_replace(c, "&amp;", "&"), "&nbsp;", " ")

  /** F22 — filename sanitize + truncate. Reference: utils.py:310-321. */
  def sanitizeFilename(c: Column, maxLen: Int = 100): Column =
    substring(regexp_replace(c, "[^A-Za-z0-9._-]", "_"), 1, maxLen)
}
