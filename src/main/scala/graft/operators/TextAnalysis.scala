package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting. Pure Column
  * expressions (codegen-friendly, no UDFs), every one reproducible in the
  * DuckDB oracle.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language heuristic. */
  val EnStop: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "with", "for", "on")
  val FrStop: Seq[String] = Seq("le", "la", "les", "et", "de", "des", "un", "une", "est", "avec")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "von", "zu", "ein", "eine", "ist", "mit")
  val EsStop: Seq[String] = Seq("el", "la", "los", "las", "y", "de", "un", "una", "es", "con")

  /** Distinct lowercase word tokens. */
  def tokens(text: Column): Column =
    array_distinct(split(lower(trim(text)), "\\s+"))

  private def hits(toks: Column, stop: Seq[String]): Column =
    size(array_intersect(toks, array(stop.map(lit): _*)))

  /** Language ID by stopword-hit voting (en/fr/de), deterministic
    * tie-break order en > fr > de, 'und' (undetermined) when no hits. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = hits(t, EnStop)
    val fr = hits(t, FrStop)
    val de = hits(t, DeStop)
    when(en === 0 && fr === 0 && de === 0, "und")
      .when(en >= fr && en >= de, "en")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  /** Whitespace token count. */
  def wordCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish sub-token count: letter runs, digit runs, and individual
    * punctuation each count as one token (the pre-tokenizer shape used by
    * byte-pair encoders). */
  def subTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality heuristics: length, word count, mean word length, stopword
    * ratio, punctuation ratio — composed into a 0-100 score. */
  def qualityScore(text: Column): Column = {
    val chars = length(text)
    val words = wordCount(text)
    val meanWordLen = chars.cast("double") / words.cast("double")
    val stopRatio = hits(tokens(text), EnStop).cast("double") / lit(10.0)
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val punctRatio = punct.cast("double") / chars.cast("double")
    val lenScore = when(chars.between(100, 5000), 40.0)
      .when(chars.between(20, 10000), 20.0).otherwise(0.0)
    val wordScore = when(meanWordLen.between(3.0, 10.0), 30.0).otherwise(10.0)
    val stopScore = when(stopRatio >= 0.2, 20.0).otherwise(stopRatio * 100.0)
    val punctScore = when(punctRatio <= 0.1, 10.0).otherwise(0.0)
    lenScore + wordScore + stopScore + punctScore
  }

  /** The Gopher quality-filter stop set (Rae et al. 2021, A1.1): a doc
    * must contain at least 2 of these to pass the stop-word rule. */
  val GopherStop: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality rules (Rae et al. 2021, A1.1) as per-document flags
    * plus the composed keep verdict — the published rule bundle curation
    * pipelines actually apply, as one row-local expression pass:
    *
    *   r_wc        50 ≤ word count ≤ 100 000
    *   r_mwl       mean word length in [3, 10]
    *   r_sym       symbol-to-word ratio ('#' or ellipsis) ≤ 0.1
    *   r_bullet    ≤ 90% of lines start with a bullet
    *   r_ellipsis  ≤ 30% of lines end with an ellipsis
    *   r_alpha     ≥ 80% of words contain an alphabetic character
    *   r_stop      ≥ 2 hits in [[GopherStop]]
    *
    * Every ratio comparison is CROSS-MULTIPLIED into exact integer
    * arithmetic (10·sym ≤ wc, 10·alpha ≥ 8·wc, 3·wc ≤ Σlen ≤ 10·wc, …)
    * so no float division exists to drift between engines. Pure
    * row-local expressions: at 100 TB this pipelines inside whole-stage
    * codegen with the scan — no shuffle, no state. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = rawTokens(col(textCol))
    val wc = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (a, w) => a + length(w).cast("long"))
    val alpha = size(filter(words, w => w.rlike("[a-z]"))).cast("long")
    val stopHits = size(array_intersect(array_distinct(words),
      array(GopherStop.map(lit): _*))).cast("long")
    val lines = split(col(textCol), "\n")
    val nl = size(lines).cast("long")
    val bullets = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val ellipses = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val symbols = size(regexp_extract_all(col(textCol),
      lit("#|\\.\\.\\.|…"), lit(0))).cast("long")
    def flag(c: Column) = when(c, 1L).otherwise(0L)
    val rWc = flag(wc >= 50L && wc <= 100000L)
    val rMwl = flag(lit(3L) * wc <= sumLen && sumLen <= lit(10L) * wc)
    val rSym = flag(lit(10L) * symbols <= wc)
    val rBullet = flag(lit(10L) * bullets <= lit(9L) * nl)
    val rEllipsis = flag(lit(10L) * ellipses <= lit(3L) * nl)
    val rAlpha = flag(lit(10L) * alpha >= lit(8L) * wc)
    val rStop = flag(stopHits >= 2L)
    docs.select(col(idCol).as("doc_id"), wc.as("word_count"),
      rWc.as("r_wc"), rMwl.as("r_mwl"), rSym.as("r_sym"),
      rBullet.as("r_bullet"), rEllipsis.as("r_ellipsis"),
      rAlpha.as("r_alpha"), rStop.as("r_stop"),
      (rWc * rMwl * rSym * rBullet * rEllipsis * rAlpha * rStop).as("keep"))
  }

  /** Placeholder stand-in for C4's published word blocklist (the "Dirty,
    * Naughty…" list) — the operator is list-parameterized; tests plant
    * these tokens. */
  val C4Badwords: Seq[String] = Seq("profanity", "obscenity")

  /** C4 cleaning rules (Raffel et al. 2020 §2.2) as per-document flags —
    * the LINE-level keep filter plus the PAGE-level drop rules, the
    * other published curation bundle next to [[gopherRules]]:
    *
    *   line kept    ≥ 5 words, ends in terminal punctuation ([.!?"]),
    *                no "javascript", no policy boilerplate phrase
    *   r_sent       kept text contains ≥ 3 sentence terminators
    *   r_lorem      no "lorem ipsum"
    *   r_brace      no '{' (code page)
    *   r_bad        no blocklist word ([[C4Badwords]])
    *
    * All counts are exact integers and every predicate is row-local
    * string work — like gopherRules this pipelines inside whole-stage
    * codegen with the scan; no shuffle, no state, no floats to drift. */
  def c4Rules(docs: DataFrame, idCol: String, textCol: String,
      badwords: Seq[String] = C4Badwords): DataFrame = {
    val t = lower(col(textCol))
    val lines = split(col(textCol), "\n")
    val nl = size(lines).cast("long")
    val kept = filter(lines, l =>
      size(split(trim(l), "\\s+")) >= 5 &&
        trim(l).rlike("[.!?\"]$") &&
        !lower(l).contains("javascript") &&
        !lower(l).rlike("privacy policy|terms of use|cookie policy"))
    val nKept = size(kept).cast("long")
    val sentences = size(regexp_extract_all(array_join(kept, "\n"),
      lit("[.!?]"), lit(0))).cast("long")
    def flag(c: Column) = when(c, 1L).otherwise(0L)
    val rSent = flag(sentences >= 3L)
    val rLorem = flag(!t.contains("lorem ipsum"))
    val rBrace = flag(!col(textCol).contains("{"))
    val rBad = flag(!t.rlike(s"\\b(${badwords.mkString("|")})\\b"))
    docs.select(col(idCol).as("doc_id"), nl.as("n_lines"),
      nKept.as("n_kept_lines"), sentences.as("n_sentences"),
      rSent.as("r_sent"), rLorem.as("r_lorem"), rBrace.as("r_brace"),
      rBad.as("r_bad"), (rSent * rLorem * rBrace * rBad).as("keep"))
  }

  /** Refine-style collision fingerprint: md5 of the sorted distinct
    * normalized tokens — word order and duplication invariant, so
    * shuffled near-duplicates collide. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(tokens(text)), " "))

  /** Polynomial rolling hash over characters mod 1e9+7 (order-sensitive
    * fingerprint, the classic Rabin-Karp shape). */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), greatest(length(text), lit(1))),
        i => ascii(text.substr(i, lit(1)))),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)

  // ---- curation additions (PII, repetition, tokenization) -----------------

  /** ALL lowercase word tokens in order, duplicates kept — the stream a
    * tokenizer/repetition filter sees (tokens() above is the DISTINCT
    * set for langid/fingerprints). */
  def rawTokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{7,15}"

  /** Count of email-shaped / phone-shaped spans. */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** PII scrub: replace every email/phone span with a fixed tag —
    * the pre-training redaction pass (never drop the document, keep the
    * surrounding text trainable). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** FEATURE-HASHING vectorizer (the hashing trick, Weinberger et al.
    * 2009): each token lands in bucket hash(tok) mod dims with sign
    * ±1 from a second hash bit, per-doc bucket sums densify to a
    * fixed-width integer vector. No vocabulary pass, no dictionary
    * broadcast, no OOV — the featurizer whose cost is ONE token scan
    * regardless of corpus vocabulary, which is why it is the one that
    * survives 100 TB (a vocab-indexed TF matrix needs a distinct-term
    * table ∝ vocabulary and a join; this needs neither). The signed
    * hash makes collisions cancel in expectation (unbiased inner
    * products — the paper's point). Exact integers end to end, so the
    * oracle replays it from the same md5-derived hash. Shape: explode
    * tokens → one map-side-combined (doc, bucket) sum → one per-doc
    * map assembly; output ∝ docs × dims. */
  def hashFeatures(docs: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims > 0, "dims must be positive")
    val toks = docs.select(col(idCol),
      explode(rawTokens(col(textCol))).as("tok"))
    val h = toks.select(col(idCol),
      (Dedup.hash56(col("tok")) % dims).as("idx"),
      when(Dedup.hash56(concat(col("tok"), lit(":s"))) % 2 === 0, 1L)
        .otherwise(-1L).as("sgn"))
    h.groupBy(col(idCol), col("idx")).agg(sum("sgn").as("v"))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("v"))))
        .as("m"))
      .select(col(idCol),
        // registry outputs are scalar (driver-hash contract): the dense
        // vector ships as one comma-joined string column
        concat_ws(",", transform(sequence(lit(0), lit(dims - 1)),
          i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))
            .cast("string")))
          .as("features"))
  }

  /** Per-doc (doc_id, x, y) adjacent-token bigrams over [[rawTokens]] —
    * emitted IN-ROW from the token array (no window, no shuffle); docs
    * with fewer than two tokens emit nothing. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), rawTokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2) // sequence(1, 0) would run DESCENDING
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t) - 1),
           i -> struct(element_at(t, i) AS x, element_at(t, i + 1) AS y))"""))
        .as("p"))
      .select(col("doc_id"), col("p.x").as("x"), col("p.y").as("y"))

  /** Bigram-LM likelihood score — the perplexity-style quality filter of
    * the CCNet/Gopher pipelines, in oracle-replayable integer fixed
    * point. Train: corpus bigram counts c(x,y) and prefix counts c(x·).
    * Score: each doc bigram contributes p6 = c(x,y)·10⁶ DIV c(x·) (the
    * conditional probability in millionths); the doc score is the
    * integer mean of its p6 stream. Boilerplate and common prose score
    * high, gibberish and rare-word soup score low — the same signal as
    * log-perplexity without the cross-engine libm drift a real log would
    * reintroduce (rank order of documents is preserved under the
    * monotone map).
    *
    * Scale shape: bigrams are emitted in-row ([[docBigrams]], no window);
    * the LM table is a groupBy of the bigram stream (map-side combined)
    * and the scoring pass is one equi-join on (x, y) — the join both
    * sides shuffle on is the LM's natural key, and the prefix-count side
    * is vocab-sized. No driver state, no iteration. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = docBigrams(docs, idCol, textCol)
    val counts = bi.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val prefix = bi.groupBy("x").agg(count(lit(1)).as("c_x"))
    val lm = counts.join(prefix, "x")
    bi.join(lm, Seq("x", "y"))
      .withColumn("p6", expr("(c_xy * 1000000) DIV c_x"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p6) DIV count(1)").as("lm_score"))
  }

  /** Top-k PMI collocations (Church & Hanks 1990): pointwise mutual
    * information over the corpus bigrams, ranked in integer fixed
    * point. PMI = log(p_xy / (p_x·p_y)) is a monotone transform of
    * c_xy·N / (c_x·c_y), so ranking by pmi6 = c_xy·N·10⁶ DIV (c_x·c_y)
    * (ties → (x, y) total order) reproduces the PMI order with zero
    * cross-engine libm drift — same contract as [[bigramScore]].
    * `minCount` keeps hapax pairs out (raw PMI is maximized by
    * singletons — the classic noise filter). Unigram masses are the
    * position-consistent ones (c_x = bigrams with x first, c_y = with
    * y second), so probabilities live in one sample space.
    *
    * Plan: one bigram explode feeding three map-side-combined
    * aggregates, the 1-row N frame broadcast into the scorer, partial
    * top-k. Overflow bound: c_xy·N·10⁶ needs c_xy·N < 9.2e12 —
    * beyond that scale drop the 10⁶ to 10³ or pre-divide by c_x. */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    val bi = docBigrams(docs, idCol, textCol)
    val counts = bi.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val cx = bi.groupBy("x").agg(count(lit(1)).as("c_x"))
    val cy = bi.groupBy("y").agg(count(lit(1)).as("c_y"))
    val n = bi.agg(count(lit(1)).as("n_bi"))
    counts.join(cx, "x").join(cy, "y")
      .crossJoin(broadcast(n))
      .withColumn("pmi6", expr("(c_xy * n_bi * 1000000) DIV (c_x * c_y)"))
      .select("x", "y", "c_xy", "pmi6")
      .orderBy(col("pmi6").desc, col("x"), col("y"))
      .limit(k)
  }

  /** Per-slice token-distribution divergence against the whole corpus —
    * the mixture-QA instrument behind "which source is distributionally
    * off": KL(slice‖corpus) and KL(corpus‖slice) per slice, add-one
    * smoothed over the corpus vocabulary (Kullback & Leibler 1951; the
    * asymmetry is the point — slice‖corpus punishes tokens the slice
    * over-uses, corpus‖slice punishes corpus mass the slice lacks).
    *
    * Cross-engine exactness (the drift-monitor discipline from
    * operators.Profile): every probability is one exactly-rounded IEEE
    * division of exact integer counts, the log is [[graft.functions.PortableLn]]
    * (bit-identical in Spark and DuckDB), both KL directions share ONE
    * ln evaluation (ln(q/p) = −ln(p/q) — sign flips are exact), and the
    * per-term contributions are summed as 1e-12 fixed-point BIGINTs so
    * partition order can't wiggle a double sum. |Σterm| < 31 per slice
    * (Σp·|ln| ≤ 2·lnmax), so the scaled sum stays < 2^53 with room.
    *
    * Scale shape: tokenize+count is map-side partial agg; the smoothing
    * grid is vocab × slices — enumerated with the ≤|slices|-row totals
    * frame broadcast, so the "product" is exactly the output size, never
    * corpus². One shuffle on term for the counts, one on slice for the
    * final rollup. */
  /** Per-document Shannon entropy of the CHARACTER distribution — the
    * classic gibberish/quality signal (repetitive spam scores low,
    * random noise scores near ln|alphabet|, natural text sits in
    * between; Shannon 1948). Exactness contract = [[mixDivergence]]'s:
    * p_c = c/n is one IEEE division of exact integer counts, ln(1/p_c)
    * = ln(n/c) goes through the bit-portable
    * [[graft.functions.PortableLn]], each class's p·ln(1/p) term is
    * floored to 1e-12 fixed point, and the per-doc sum is BIGINT — so
    * partition order can't wiggle a double sum and DuckDB replays the
    * value bit-for-bit.
    *
    * Performance shape (both fixes measured at sf0.1): the character
    * explode is ONE in-row split per doc — the indexed substring(t,i,1)
    * form was O(i) per call on UTF8 strings (boundary scan), O(n²) per
    * document, 3.9 s; and ln(n/c) evaluates as ln n − ln c with
    * PortableLn's ~100-branch CASE chains run over the DISTINCT integer
    * count values only (a few hundred rows, broadcast back) instead of
    * every (doc, class) row — 2.2 s → 0.5 s. One shuffle on (doc, char)
    * to count, one on doc to roll up. */
  def docEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnt = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .filter(length(col("t")) > 0)
      .select(col("doc_id"), explode(split(col("t"), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("k"))
    // ln over the distinct INTEGER values that appear as c or n — the
    // expensive flat-CASE chain runs on this tiny frame only
    val vals = cnt.select(col("c").as("v"))
      .unionByName(tot.select(col("n").as("v"))).distinct()
      .withColumn("r", col("v").cast("double"))
    val lnv = graft.functions.PortableLn.withLn(vals, "r", "lnv")
      .select("v", "lnv")
    cnt.join(tot, "doc_id")
      .join(broadcast(lnv.withColumnRenamed("v", "c")
        .withColumnRenamed("lnv", "ln_c")), "c")
      .join(broadcast(lnv.withColumnRenamed("v", "n")
        .withColumnRenamed("lnv", "ln_n")), "n")
      .withColumn("term", floor(
        (col("c").cast("double") / col("n").cast("double")) *
          (col("ln_n") - col("ln_c")) * lit(1.0e12)).cast("long"))
      .groupBy("doc_id")
      .agg(max("n").as("n_chars"), max("k").as("n_classes"),
        (sum("term").cast("double") / lit(1.0e12)).as("entropy"))
  }

  def mixDivergence(docs: DataFrame, sliceCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(sliceCol).as("slice"),
      explode(rawTokens(col(textCol))).as("term"))
    val sliceCnt = toks.groupBy("slice", "term").agg(count(lit(1)).as("cs"))
    val corpusCnt = sliceCnt.groupBy("term").agg(sum("cs").as("cc"))
    val sliceTotals = sliceCnt.groupBy("slice")
      .agg(sum("cs").as("ns"), count(lit(1)).as("vs"))
    val corpusTotals = corpusCnt.agg(sum("cc").as("nc"), count(lit(1)).as("v"))
    val grid = corpusCnt
      .crossJoin(broadcast(sliceTotals))
      .join(sliceCnt, Seq("slice", "term"), "left")
      .na.fill(0L, Seq("cs"))
      .crossJoin(broadcast(corpusTotals))
      .withColumn("r",
        ((col("cs") + 1).cast("double") * (col("nc") + col("v")).cast("double")) /
          ((col("cc") + 1).cast("double") * (col("ns") + col("v")).cast("double")))
    graft.functions.PortableLn.withLn(grid, "r", "lnr")
      .withColumn("ps",
        (col("cs") + 1).cast("double") / (col("ns") + col("v")).cast("double"))
      .withColumn("pc",
        (col("cc") + 1).cast("double") / (col("nc") + col("v")).cast("double"))
      .withColumn("t_sc",
        floor((col("ps") * col("lnr")) * lit(1.0e12)).cast("long"))
      .withColumn("t_cs",
        floor((-(col("pc") * col("lnr"))) * lit(1.0e12)).cast("long"))
      .groupBy("slice")
      .agg(max("ns").as("n_tokens"), max("vs").as("n_terms"),
        (sum("t_sc").cast("double") / lit(1.0e12)).as("kl_slice_corpus"),
        (sum("t_cs").cast("double") / lit(1.0e12)).as("kl_corpus_slice"))
      .orderBy("slice")
  }
}
