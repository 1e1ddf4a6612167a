package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Round-3 training-data curation operators over the documents table:
  * PII redaction, repetition (Gopher-style) filtering, vocabulary
  * building, token-id encoding, deterministic stratified sampling, and
  * training-window chunking. Pure relational/expression compositions —
  * no UDFs — each with a bit-exact DuckDB oracle. */
object Corpus {

  /** PII redaction: scrub email/phone spans, keep the document. The
    * corpus has no natural PII, so spans are planted deterministically
    * on doc_id < 100 (same convention as dd_exact's planted dups) —
    * the redaction machinery runs over every row either way. */
  val txtPii = Q(
    "txt_pii_redact",
    (s, dir) => {
      val planted = when(col("doc_id") < 100,
          concat(col("text"), lit(" contact: user"),
            col("doc_id").cast("string"), lit("@example.com or +44"),
            (lit(7000000000L) + col("doc_id")).cast("string")))
        .otherwise(col("text"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), planted.as("text2"))
        .select(col("doc_id"),
          TextAnalysis.emailCount(col("text2")).as("n_emails"),
          TextAnalysis.phoneCount(col("text2")).as("n_phones"),
          TextAnalysis.redactPii(col("text2")).as("redacted"))
    },
    Some(s"""WITH p AS (
        SELECT doc_id,
          CASE WHEN doc_id < 100
               THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +44'
                    || CAST(7000000000 + doc_id AS VARCHAR)
               ELSE text END AS text2
        FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(text2, '${TextAnalysis.EmailRe}')) AS n_emails,
        len(regexp_extract_all(text2, '${TextAnalysis.PhoneRe}')) AS n_phones,
        regexp_replace(regexp_replace(text2,
          '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
          '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS redacted
      FROM p"""))

  /** Repetition filter (the Gopher-report shape): per document, the
    * most frequent word bigram's share of all bigrams. Boilerplate and
    * template spam score high; flagged at ≥ 0.2. Relational build —
    * explode bigrams, count, max — so it scales as a groupBy, never a
    * per-row quadratic. */
  val txtRepetition = Q(
    "txt_repetition",
    (s, dir) => {
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.rawTokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
      val bigrams = base.select(col("doc_id"),
        explode(expr(
          """transform(sequence(1, size(t) - 1),
                       i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""))
          .as("bg"))
      bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(max(col("cnt")).as("max_bg"), sum(col("cnt")).as("total_bg"))
        .select(col("doc_id"), col("total_bg"), col("max_bg"),
          (col("max_bg").cast("double") / col("total_bg").cast("double"))
            .as("top_bigram_frac"))
        .withColumn("flagged", col("top_bigram_frac") >= 0.2)
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      bi AS (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i + 1])) AS bg
        FROM base WHERE len(t) >= 2),
      c AS (SELECT doc_id, bg, count(*) AS cnt FROM bi GROUP BY 1, 2)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_bg,
        max(cnt) AS max_bg,
        CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_bigram_frac,
        (CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)) >= 0.2 AS flagged
      FROM c GROUP BY 1"""))

  /** Full Gopher quality-rule bundle (Rae et al. 2021, A1.1) —
    * [[graft.operators.TextAnalysis.gopherRules]]: seven per-document
    * flags (word count, mean word length, symbol ratio, bullet lines,
    * ellipsis lines, alpha-word ratio, stop-word hits) and the composed
    * keep verdict, every ratio cross-multiplied into exact integers.
    * The synthetic corpus is single-line word soup, so the line/symbol
    * rules would be inert on raw text — violating shapes are PLANTED
    * deterministically by doc_id residue (the txt_pii convention):
    * bullet-per-word, ellipsis line ends, '##' soup, digit-only words,
    * and a one-word doc, so every rule is oracle-verified firing BOTH
    * ways at both scales. */
  val txtGopher = Q(
    "txt_gopher",
    (s, dir) => {
      val planted = when(col("doc_id") % 11 === 3,
          expr("replace(text, ' ', concat(chr(10), '- '))"))
        .when(col("doc_id") % 11 === 4,
          expr("replace(text, ' ', concat('...', chr(10)))"))
        .when(col("doc_id") % 11 === 5, expr("replace(text, ' ', ' ## ')"))
        .when(col("doc_id") % 11 === 6, expr("repeat('9 ', 60)"))
        .when(col("doc_id") % 11 === 7, lit("word"))
        // a PASSING shape: the soup has at most one Gopher stopword, so
        // without this plant r_stop (and keep) would be constant-0
        .when(col("doc_id") % 11 === 8,
          expr("concat(text, ' the rest of it and that should have been with us')"))
        .otherwise(col("text"))
      TextAnalysis.gopherRules(
        Tables.load(s, dir, "documents").select(col("doc_id"), planted.as("t2")),
        "doc_id", "t2")
    },
    Some(s"""WITH p AS (
        SELECT doc_id,
          CASE
            WHEN doc_id % 11 = 3 THEN replace(text, ' ', chr(10) || '- ')
            WHEN doc_id % 11 = 4 THEN replace(text, ' ', '...' || chr(10))
            WHEN doc_id % 11 = 5 THEN replace(text, ' ', ' ## ')
            WHEN doc_id % 11 = 6 THEN repeat('9 ', 60)
            WHEN doc_id % 11 = 7 THEN 'word'
            WHEN doc_id % 11 = 8 THEN text ||
              ' the rest of it and that should have been with us'
            ELSE text END AS t
        FROM documents),
      m AS (
        SELECT doc_id,
          string_split_regex(lower(trim(t)), '\\s+') AS words,
          string_split(t, chr(10)) AS lines,
          CAST(len(regexp_extract_all(t, '#|\\.\\.\\.|…')) AS BIGINT) AS symbols
        FROM p),
      c AS (
        SELECT doc_id,
          CAST(len(words) AS BIGINT) AS wc,
          CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS sum_len,
          CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha,
          CAST(len(list_intersect(list_distinct(words),
            [${TextAnalysis.GopherStop.map(w => s"'$w'").mkString(", ")}])) AS BIGINT) AS stop_hits,
          CAST(len(lines) AS BIGINT) AS nl,
          CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT) AS bullets,
          CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS BIGINT) AS ellipses,
          symbols
        FROM m),
      f AS (
        SELECT doc_id, wc,
          CAST(CASE WHEN wc >= 50 AND wc <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_wc,
          CAST(CASE WHEN 3 * wc <= sum_len AND sum_len <= 10 * wc THEN 1 ELSE 0 END AS BIGINT) AS r_mwl,
          CAST(CASE WHEN 10 * symbols <= wc THEN 1 ELSE 0 END AS BIGINT) AS r_sym,
          CAST(CASE WHEN 10 * bullets <= 9 * nl THEN 1 ELSE 0 END AS BIGINT) AS r_bullet,
          CAST(CASE WHEN 10 * ellipses <= 3 * nl THEN 1 ELSE 0 END AS BIGINT) AS r_ellipsis,
          CAST(CASE WHEN 10 * alpha >= 8 * wc THEN 1 ELSE 0 END AS BIGINT) AS r_alpha,
          CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop
        FROM c)
      SELECT doc_id, wc AS word_count, r_wc, r_mwl, r_sym, r_bullet,
        r_ellipsis, r_alpha, r_stop,
        r_wc * r_mwl * r_sym * r_bullet * r_ellipsis * r_alpha * r_stop AS keep
      FROM f"""))

  // Shared fixture sentences for txt_c4 — one set of Scala constants
  // feeds BOTH the Spark plant and the DuckDB replay, so the two sides
  // cannot drift.
  private val c4S1 = "a first proper sentence with enough words here."
  private val c4S2 = "a second proper sentence with enough words here."
  private val c4S3 = "a third proper sentence with enough words also."
  private val c4Js = "please enable javascript to continue browsing this page."
  private val c4Pp = "read our privacy policy before continuing to browse."
  private val c4Bw = "this sentence casually mentions profanity in passing today."

  /** The OTHER published curation bundle: C4's line-keep filter + page
    * drops (Raffel et al. 2020 §2.2) as per-document flags
    * ([[graft.operators.TextAnalysis.c4Rules]]). The synthetic soup has
    * no terminal punctuation, so rule-exercising shapes are planted
    * deterministically by doc_id (the txt_pii/txt_gopher convention):
    * every flag fires both ways under the oracle — line drops that do
    * NOT kill the page (javascript / policy boilerplate lines), page
    * drops (lorem ipsum, code braces, blocklist), and clean passes. */
  val txtC4 = Q(
    "txt_c4",
    (s, dir) => {
      def page(ls: String*) = lit(ls.mkString("\n"))
      val planted = when(col("doc_id") % 13 === 3,
          concat(col("text"), lit(" lorem ipsum dolor sit amet.")))
        .when(col("doc_id") % 13 === 4,
          concat(col("text"), lit(" { code block here }")))
        .when(col("doc_id") % 13 === 5, page(c4S1, c4Js, c4S2, c4S3))
        .when(col("doc_id") % 13 === 6, page(c4S1, c4Pp, c4S2, c4S3))
        .when(col("doc_id") % 13 === 7, page(c4S1, c4S2, c4S3))
        .when(col("doc_id") % 13 === 8, page(c4S1, c4S2))
        .when(col("doc_id") % 13 === 9, page(c4S1, c4S2, c4Bw))
        .otherwise(col("text"))
      TextAnalysis.c4Rules(
        Tables.load(s, dir, "documents").select(col("doc_id"), planted.as("t2")),
        "doc_id", "t2")
    },
    Some {
      def page(ls: String*) = ls.map(l => s"'$l'").mkString(" || chr(10) || ")
      s"""WITH p AS (
        SELECT doc_id,
          CASE
            WHEN doc_id % 13 = 3 THEN text || ' lorem ipsum dolor sit amet.'
            WHEN doc_id % 13 = 4 THEN text || ' { code block here }'
            WHEN doc_id % 13 = 5 THEN ${page(c4S1, c4Js, c4S2, c4S3)}
            WHEN doc_id % 13 = 6 THEN ${page(c4S1, c4Pp, c4S2, c4S3)}
            WHEN doc_id % 13 = 7 THEN ${page(c4S1, c4S2, c4S3)}
            WHEN doc_id % 13 = 8 THEN ${page(c4S1, c4S2)}
            WHEN doc_id % 13 = 9 THEN ${page(c4S1, c4S2, c4Bw)}
            ELSE text END AS t
        FROM documents),
      m AS (
        SELECT doc_id, t, string_split(t, chr(10)) AS lines,
          list_filter(string_split(t, chr(10)), l ->
            len(string_split_regex(trim(l), '\\s+')) >= 5
            AND regexp_matches(trim(l), '[.!?"]$$')
            AND NOT contains(lower(l), 'javascript')
            AND NOT regexp_matches(lower(l),
              'privacy policy|terms of use|cookie policy')) AS kept
        FROM p),
      c AS (
        SELECT doc_id,
          CAST(len(lines) AS BIGINT) AS n_lines,
          CAST(len(kept) AS BIGINT) AS n_kept_lines,
          CAST(len(regexp_extract_all(
            coalesce(array_to_string(kept, chr(10)), ''),
            '[.!?]')) AS BIGINT) AS n_sentences,
          CAST(CASE WHEN NOT contains(lower(t), 'lorem ipsum')
            THEN 1 ELSE 0 END AS BIGINT) AS r_lorem,
          CAST(CASE WHEN NOT contains(t, '{') THEN 1 ELSE 0 END AS BIGINT) AS r_brace,
          CAST(CASE WHEN NOT regexp_matches(lower(t),
            '\\b(${TextAnalysis.C4Badwords.mkString("|")})\\b')
            THEN 1 ELSE 0 END AS BIGINT) AS r_bad
        FROM m)
      SELECT doc_id, n_lines, n_kept_lines, n_sentences,
        CAST(CASE WHEN n_sentences >= 3 THEN 1 ELSE 0 END AS BIGINT) AS r_sent,
        r_lorem, r_brace, r_bad,
        CAST(CASE WHEN n_sentences >= 3 THEN 1 ELSE 0 END AS BIGINT)
          * r_lorem * r_brace * r_bad AS keep
      FROM c"""
    })

  /** Tokenizer vocabulary: corpus-wide top-1000 words by frequency,
    * assigned dense ids in (count DESC, token ASC) order. The global
    * window ranks only the LIMITed top slice (TakeOrderedAndProject
    * below it), never the full vocabulary — the a12/o3 rule. */
  val txtVocab = Q(
    "txt_vocab",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val top = Tables.load(s, dir, "documents")
        .select(explode(TextAnalysis.rawTokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(1000)
      top.withColumn("token_id",
          row_number().over(Window.orderBy(col("n").desc, col("token")))
            .cast("long"))
        .select("token_id", "token", "n")
    },
    Some("""SELECT row_number() OVER (ORDER BY n DESC, token) AS token_id,
        token, n
      FROM (
        SELECT token, count(*) AS n FROM (
          SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents)
        GROUP BY 1 ORDER BY n DESC, token LIMIT 1000)"""))

  /** Token-id encoding: each document's word stream mapped through the
    * vocabulary (broadcast join — the vocab is tiny by construction);
    * out-of-vocabulary words encode as 0. Pinned to doc_id < 200 to
    * bound the exploded output at every scale factor. */
  val txtEncode = Q(
    "txt_encode",
    (s, dir) => {
      val vocab = txtVocab.run(s, dir).select("token_id", "token")
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          posexplode(TextAnalysis.rawTokens(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .select(col("doc_id"), col("pos"),
          coalesce(col("token_id"), lit(0L)).as("token_id"))
    },
    Some("""WITH vocab AS (
        SELECT row_number() OVER (ORDER BY n DESC, token) AS token_id, token
        FROM (
          SELECT token, count(*) AS n FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
            FROM documents)
          GROUP BY 1 ORDER BY n DESC, token LIMIT 1000)),
      toks AS (
        SELECT doc_id, i - 1 AS pos, t[i] AS token FROM (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
          FROM documents WHERE doc_id < 200),
          LATERAL (SELECT unnest(generate_series(1, len(t))) AS i))
      SELECT t.doc_id, t.pos, coalesce(v.token_id, 0) AS token_id
      FROM toks t LEFT JOIN vocab v USING (token)"""))

  /** EXACT heavy-hitter tokens (operators.HeavyHitters): every token
    * carrying > 1/200 of the corpus token mass, with exact counts — the
    * stopword-discovery / vocab-head pass. The direct GROUP BY would
    * shuffle the whole token domain (billions of keys at 100 TB, almost
    * all below threshold); the two-pass form shuffles partitions × k
    * Misra-Gries entries, then recounts only the ≤ k candidates through
    * a broadcast semi-join. Output is exact, so the oracle is the plain
    * HAVING query — MG nominates, never answers. */
  val txtHeavyTokens = Q(
    "txt_heavy_tokens",
    (s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
      graft.operators.HeavyHitters.exactHeavyHitters(toks, "item", k = 200)
    },
    Some("""WITH tok AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS item
        FROM documents),
      tot AS (SELECT count(*) AS n FROM tok)
      SELECT item, CAST(count(*) AS BIGINT) AS cnt
      FROM tok, tot GROUP BY item, n HAVING count(*) * 200 > n"""))

  /** Per-language heavy tokens — the per-GROUP form: items above 1/100
    * of each language's own token mass (per-language stopword lists; a
    * global threshold would drown low-resource languages under the
    * high-resource head). One MG summary per group, shuffle capped at
    * langs × k, same exact-recount contract. */
  val txtHeavyByLang = Q(
    "txt_heavy_by_lang",
    (s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("item"))
      graft.operators.HeavyHitters.exactHeavyHittersPerGroup(
        toks, "lang", "item", k = 100)
    },
    Some("""WITH tok AS (
        SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS item
        FROM documents),
      n AS (SELECT lang, count(*) AS n FROM tok GROUP BY 1)
      SELECT t.lang, t.item, CAST(count(*) AS BIGINT) AS cnt
      FROM tok t JOIN n USING (lang)
      GROUP BY t.lang, t.item, n.n HAVING count(*) * 100 > n.n"""))

  /** Deterministic stratified sample: ~10% of documents, selected by
    * content-independent stable hash of the id — reproducible across
    * runs, engines, and partitionings (no rand()), and joinable back to
    * the full table. The per-language counts verify the strata stay
    * proportional. */
  val txtSample = Q(
    "txt_sample",
    (s, dir) => Tables.load(s, dir, "documents")
      .filter(Dedup.hash56(col("doc_id").cast("string")) % 10 === 0)
      .select("doc_id", "lang"),
    Some(s"""SELECT doc_id, lang FROM documents
      WHERE ((md5_number_lower(CAST(doc_id AS VARCHAR)) % ${Dedup.M56})::BIGINT) % 10 = 0"""))

  /** Weighted sampling without replacement (operators.Sampling,
    * Efraimidis–Spirakis with deterministic hash draws): the 100 docs
    * sampled ∝ n_chars — the "sample long documents proportionally
    * harder" mixture knob txt_sample's unweighted hash-mod can't
    * express. Reproducible by construction (pure function of ids and
    * weights), exact-k, and the oracle replays the full selection via
    * the shared PortableLn ranking. */
  val txtWeightedSample = Q(
    "txt_weighted_sample",
    (s, dir) => graft.operators.Sampling.weightedSample(
      Tables.load(s, dir, "documents"), "doc_id", "n_chars", k = 100),
    Some(graft.operators.Sampling.weightedSampleOracleSql(
      "documents", "doc_id", "n_chars", k = 100)))

  /** Stratified E-S sampling: exact 20 docs PER LANGUAGE ∝ n_chars —
    * the fixed-ratio mixture primitive (txt_mix declares ratios; this
    * selects the members). Same deterministic keys as
    * txt_weighted_sample; the per-stratum TopK caps the shuffle at
    * partitions × langs × k and the oracle replays every stratum's
    * selection through the shared PortableLn ranking. */
  val txtWeightedStratified = Q(
    "txt_weighted_stratified",
    (s, dir) => graft.operators.Sampling.weightedSampleStratified(
      Tables.load(s, dir, "documents"), "lang", "doc_id", "n_chars", k = 20),
    Some(graft.operators.Sampling.weightedSampleOracleSql(
      "documents", "doc_id", "n_chars", k = 20, strataCol = Some("lang"))))

  /** TEMPERATURE-weighted mixture sampling (α = 0.5): the multilingual
    * training-mix knob — per-source sampling budgets ∝ (source
    * character mass)^α, flattening the head so low-resource sources are
    * over-represented relative to proportional sampling (the mT5/XLM-R
    * recipe). Exactness: mass is an exact BIGINT sum; sqrt is IEEE
    * correctly-rounded on both engines; the root is floored into 1e6
    * fixed point BEFORE the budget division, so shares are pure integer
    * arithmetic ((1000·sq6) div Σsq6). Member selection is bottom-k per
    * source by deterministic hash order through the partial TopK
    * aggregator (shuffle caps at sources × maxK — never a full-corpus
    * window); the hash is compared AS DOUBLE on both engines, so the
    * 2^56 → 2^53 rounding ties break identically (doc_id asc). The
    * driver-side collect is one row per source — bounded. */
  val txtMixTemperature = Q(
    "txt_mix_temperature",
    (s, dir) => {
      import graft.operators.TopK
      val d = Tables.load(s, dir, "documents")
      val per = d.groupBy("source")
        .agg(sum(col("n_chars").cast("long")).as("mass"))
        .withColumn("sq6",
          expr("CAST(floor(sqrt(CAST(mass AS DOUBLE)) * 1000000) AS BIGINT)"))
      val tot = per.agg(sum("sq6").as("tot6"))
      val kTab = per.crossJoin(broadcast(tot))
        .select(col("source"), expr("(1000 * sq6) div tot6").as("k_target"))
      val maxK = kTab.agg(max("k_target")).collect().head.getLong(0).toInt
      val topk = TopK.topK(maxK)
      val key = Dedup.hash56(concat(lit("t:"), col("doc_id").cast("string")))
      d.select(col("source"), col("doc_id"), key.as("hk"))
        .groupBy("source")
        .agg(topk((-col("hk")).cast("double"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("doc_id"))
        .join(broadcast(kTab), Seq("source"))
        .filter(col("rank") <= col("k_target"))
        .select("source", "rank", "doc_id", "k_target")
    },
    Some(s"""WITH per AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass
        FROM documents GROUP BY source),
      sq AS (SELECT source,
          CAST(floor(sqrt(CAST(mass AS DOUBLE)) * 1000000) AS BIGINT) AS sq6
        FROM per),
      tot AS (SELECT CAST(sum(sq6) AS BIGINT) AS tot6 FROM sq),
      k AS (SELECT source, (1000 * sq6) // tot6 AS k_target FROM sq, tot),
      r AS (SELECT source, doc_id,
          row_number() OVER (PARTITION BY source
            ORDER BY CAST(${h56("CONCAT('t:', CAST(doc_id AS VARCHAR))")}
              AS DOUBLE) ASC, doc_id) AS rank
        FROM documents)
      SELECT r.source, CAST(rank AS BIGINT) AS rank, doc_id,
        CAST(k_target AS BIGINT) AS k_target
      FROM r JOIN k USING (source) WHERE rank <= k_target"""))

  /** Deterministic stratified train/val/test split: assignment is a pure
    * function of doc_id (hash56 % 100 → 90/5/5), so the split is
    * reproducible on any engine, stable under re-partitioning, and adding
    * documents never moves an existing one between splits. Stratification
    * is verified, not enforced: the per-(lang, split) counts this emits
    * are the check that hashing splits every stratum ~proportionally. */
  val txtSplit = Q(
    "txt_split",
    (s, dir) => {
      val bucket = Dedup.hash56(col("doc_id").cast("string")) % 100
      Tables.load(s, dir, "documents")
        .select(col("lang"),
          when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test").as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"))
    },
    Some(s"""WITH b AS (
        SELECT lang,
          CASE WHEN bucket < 90 THEN 'train'
               WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT lang,
          ((md5_number_lower(CAST(doc_id AS VARCHAR)) % ${Dedup.M56})::BIGINT) % 100
            AS bucket FROM documents))
      SELECT lang, split, count(*) AS n_docs FROM b GROUP BY 1, 2"""))

  /** Deterministic epoch shuffle (Align.epochShuffle): the training
    * loader's seeded shuffle at corpus scale — position = rank of
    * hash56('1:' doc_id), a reproducible per-epoch global permutation
    * with no rand() and no single-partition window (range-sort +
    * zipWithIndex assigns the global rank). */
  val txtShuffle = Q(
    "txt_shuffle",
    (s, dir) => graft.operators.Align.epochShuffle(
        Tables.load(s, dir, "documents").select("doc_id"), "doc_id",
        epoch = 1)
      .select("shuffle_pos", "doc_id"),
    Some(s"""SELECT row_number() OVER (
        ORDER BY ${h56("CONCAT('1:', CAST(doc_id AS VARCHAR))")}, doc_id)
        AS shuffle_pos, doc_id
      FROM documents"""))

  /** Training-window chunking: token windows of 64 with stride 48
    * (16-token overlap) — the doc→sample exploder feeding a trainer.
    * Emits (doc, chunk ordinal, tokens in chunk); chunk content joins
    * back via txt_encode positions [idx*48, idx*48+n). */
  val txtChunks = Q(
    "txt_chunks",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.rawTokens(col("text"))).as("n"))
      .select(col("doc_id"),
        explode(expr("sequence(0, CAST(floor((n - 1) / 48) AS INT))"))
          .as("chunk_idx"),
        col("n"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(64), col("n") - col("chunk_idx") * 48).cast("long")
          .as("n_tokens"))
    ,
    Some("""WITH n AS (
        SELECT doc_id, len(string_split_regex(lower(trim(text)), '\s+')) AS n
        FROM documents)
      SELECT doc_id, i AS chunk_idx, least(64, n - i * 48) AS n_tokens
      FROM n, LATERAL (SELECT unnest(generate_series(0, (n - 1) // 48)) AS i)"""))

  // DuckDB twins of Dedup.hash56 → h31 (same fragments Pipeline.scala
  // uses), so the decontamination oracle replays ShingleHash bit-exactly
  private def h56(x: String) =
    s"((md5_number_lower($x) % ${Dedup.M56})::BIGINT)"
  private def h31(x: String) = s"(${h56(x)} % ${Dedup.P})"
  private def shingles12 =
    s"""list_distinct(list_transform(
        generate_series(1, greatest(length(text)-11, 1)),
        i -> ${h31("substring(text, i, 12)")}))"""

  /** Benchmark decontamination (operators.Decontaminate): docs sharing
    * hashed char 12-grams with the pseudo-eval set (doc_id % 97 = 0).
    * The benchmark shingle set is broadcast — at 100 TB the corpus is
    * read once and never shuffled on anything but the final per-doc
    * count. */
  val txtDecontam = Q(
    "txt_decontam",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.Decontaminate.overlap(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 12, minOverlap = 20)
    },
    Some(s"""WITH bench AS (
        SELECT DISTINCT unnest($shingles12) AS h
        FROM documents WHERE doc_id % 97 = 0),
      corpus AS (
        SELECT doc_id, $shingles12 AS hs
        FROM documents WHERE doc_id % 97 <> 0),
      ex AS (
        SELECT doc_id, len(hs) AS n_shingles, unnest(hs) AS h FROM corpus)
      SELECT doc_id, n_shingles, count(*) AS n_overlap,
        count(*) >= 20 AS contaminated
      FROM ex JOIN bench USING (h)
      GROUP BY doc_id, n_shingles"""))

  /** The actionable form of txt_decontam: a per-doc contamination RATIO
    * (shared shingles over own shingles, in millionths — integer fixed
    * point, same reproducibility contract as txt_bigram_score) plus the
    * drop verdict at a 5% threshold. An absolute overlap count flags
    * long documents that graze the benchmark; the curation rules that
    * matter gate on the FRACTION of the document that is benchmark
    * material. */
  val txtDecontamRatio = Q(
    "txt_decontam_ratio",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.Decontaminate.overlap(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", n = 12, minOverlap = 20)
        .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
          expr("(n_overlap * 1000000) DIV n_shingles").as("ratio6"),
          (expr("(n_overlap * 1000000) DIV n_shingles") >= 50000)
            .as("drop_doc"))
    },
    Some(s"""WITH bench AS (
        SELECT DISTINCT unnest($shingles12) AS h
        FROM documents WHERE doc_id % 97 = 0),
      corpus AS (
        SELECT doc_id, $shingles12 AS hs
        FROM documents WHERE doc_id % 97 <> 0),
      ex AS (
        SELECT doc_id, len(hs) AS n_shingles, unnest(hs) AS h FROM corpus),
      agg AS (
        SELECT doc_id, n_shingles, count(*) AS n_overlap
        FROM ex JOIN bench USING (h)
        GROUP BY doc_id, n_shingles)
      SELECT doc_id, n_shingles, n_overlap,
        (n_overlap * 1000000) // n_shingles AS ratio6,
        ((n_overlap * 1000000) // n_shingles) >= 50000 AS drop_doc
      FROM agg"""))

  /** GPT-style sequence packing: within each hash bucket, documents are
    * concatenated in doc_id order into one token stream and cut every
    * 256 tokens — docs straddle bin boundaries (the pretraining packer,
    * not first-fit). Pure window + explode: the cumulative token offset
    * is a running sum, each doc emits one row per bin it touches with
    * the tokens it contributes there. Buckets are the parallelism unit:
    * at 100 TB raise the bucket count and each per-bucket window stays
    * narrow — there is never a global sort or single-partition window. */
  val txtPack = Q(
    "txt_pack",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 256
      val w = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (Dedup.hash56(col("doc_id").cast("string")) % 8).as("bucket"),
          size(TextAnalysis.rawTokens(col("text"))).cast("long").as("n"))
        .withColumn("off", coalesce(sum("n").over(w), lit(0L)))
        .select(col("doc_id"), col("bucket"), col("n"), col("off"),
          explode(expr(s"sequence(off div $cap, (off + n - 1) div $cap)"))
            .as("bin_id"))
        .select(col("doc_id"), col("bucket"), col("bin_id"),
          (least(col("off") + col("n"), (col("bin_id") + 1) * cap)
            - greatest(col("off"), col("bin_id") * cap)).as("n_tokens"))
    },
    Some(s"""WITH d AS (
        SELECT doc_id,
          ((md5_number_lower(CAST(doc_id AS VARCHAR)) % ${Dedup.M56})::BIGINT)
            % 8 AS bucket,
          len(string_split_regex(lower(trim(text)), '\\s+')) AS n
        FROM documents),
      o AS (
        SELECT doc_id, bucket, n,
          CAST(coalesce(sum(n) OVER (PARTITION BY bucket ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM d),
      e AS (
        SELECT doc_id, bucket, n, off,
          unnest(generate_series(off // 256, (off + n - 1) // 256)) AS bin_id
        FROM o)
      SELECT doc_id, bucket, bin_id,
        least(off + n, (bin_id + 1) * 256) - greatest(off, bin_id * 256)
          AS n_tokens
      FROM e"""))

  /** The loader tail composed: epoch shuffle → shard → pack, what a
    * trainer actually reads. The epoch-1 shuffled stream
    * (Align.epochShuffle — reproducible, no rand()) is dealt
    * round-robin to 8 data-parallel loader shards (rank r reads
    * positions ≡ r mod 8 — bins never straddle shards, exactly like
    * real distributed loaders), and each shard packs ITS slice of the
    * shuffled order into 256-token bins with docs straddling bin
    * boundaries (txt_pack's packer, ordered by shuffle_pos instead of
    * doc_id). Deterministic across re-runs (pinned in OperatorsSpec):
    * same epoch → same permutation → same bins, which is what makes a
    * crashed epoch resumable at an exact sample position.
    *
    * Scale shape: the only additions over txt_pack are the shuffle
    * rank (range-sort + zipWithIndex, no global window) and a window
    * partitioned BY SHARD — shards are the parallelism unit; raise the
    * shard count with the cluster and every per-shard window stays
    * narrow. */
  val txtEpochPack = Q(
    "txt_epoch_pack",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 256
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.rawTokens(col("text"))).cast("long").as("n"))
      val sh = graft.operators.Align.epochShuffle(base, "doc_id", epoch = 1)
        .withColumn("shard", (col("shuffle_pos") - 1) % 8)
      val w = Window.partitionBy("shard").orderBy("shuffle_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      sh.withColumn("off", coalesce(sum("n").over(w), lit(0L)))
        .select(col("doc_id"), col("shard"), col("shuffle_pos"),
          col("n"), col("off"),
          explode(expr(s"sequence(off div $cap, (off + n - 1) div $cap)"))
            .as("bin_id"))
        .select(col("doc_id"), col("shard"), col("shuffle_pos"), col("bin_id"),
          (least(col("off") + col("n"), (col("bin_id") + 1) * cap)
            - greatest(col("off"), col("bin_id") * cap)).as("n_tokens"))
    },
    Some(s"""WITH nn AS (
        SELECT doc_id, len(string_split_regex(lower(trim(text)), '\\s+')) AS n
        FROM documents),
      sh AS (
        SELECT doc_id, n, row_number() OVER (
          ORDER BY ${h56("CONCAT('1:', CAST(doc_id AS VARCHAR))")}, doc_id)
          AS shuffle_pos
        FROM nn),
      sd AS (SELECT doc_id, n, shuffle_pos,
          (shuffle_pos - 1) % 8 AS shard FROM sh),
      o AS (
        SELECT doc_id, shard, shuffle_pos, n,
          CAST(coalesce(sum(n) OVER (PARTITION BY shard ORDER BY shuffle_pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM sd),
      e AS (
        SELECT doc_id, shard, shuffle_pos, n, off,
          unnest(generate_series(off // 256, (off + n - 1) // 256)) AS bin_id
        FROM o)
      SELECT doc_id, shard, shuffle_pos, bin_id,
        least(off + n, (bin_id + 1) * 256) - greatest(off, bin_id * 256)
          AS n_tokens
      FROM e"""))

  /** TF-IDF top terms per document. idf is the LINEAR inverse document
    * frequency N/df, not ln(N/df): a single IEEE division is bit-exact
    * across engines, while ln() may differ in the last ulp between
    * libm implementations and silently flip near-tied ranks. Within a
    * document the tie order is (score DESC, term ASC), which is total.
    * Shape: two groupBys (term frequency, document frequency) and one
    * broadcast of the 1-row corpus count; the per-doc window ranks only
    * that doc's terms. */
  val txtTfidf = Q(
    "txt_tfidf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs.select(col("doc_id"),
          explode(TextAnalysis.rawTokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    },
    Some("""WITH toks AS (
        SELECT doc_id,
          unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (
        SELECT doc_id, term, tf, df,
          CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS tfidf
        FROM tf JOIN dfreq USING (term), n)
      SELECT doc_id, term, tf, df, tfidf, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
        FROM sc)
      WHERE rank <= 3"""))

  /** Per-language mixing weights for txt_mix — the oracle SQL is
    * generated from these same constants. */
  val MixWeights: Seq[(String, Double)] =
    Seq("en" -> 0.5, "es" -> 0.8, "de" -> 0.25, "fr" -> 0.1, "zh" -> 1.0)

  /** Domain/language mixing: each stratum is downsampled to its target
    * weight with the deterministic hash gate (keep iff
    * hash56(doc_id) % 1000 < weight·1000) — reproducible across runs,
    * engines, and partitionings, unlike rand()-based sampling, and a
    * pure per-row predicate: one scan, no shuffle before the tiny
    * per-language rollup. This is the pretraining "data mixture" knob
    * (upsample rare languages, downsample the dominant one). */
  val txtMix = Q(
    "txt_mix",
    (s, dir) => {
      val gate = MixWeights.foldLeft(lit(0L)) { case (acc, (k, v)) =>
        when(col("lang") === k, lit((v * 1000).toLong)).otherwise(acc)
      }
      val target = MixWeights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
        when(col("lang") === k, lit(v)).otherwise(acc)
      }
      Tables.load(s, dir, "documents")
        .select(col("lang"), target.as("target_rate"),
          (Dedup.hash56(col("doc_id").cast("string")) % 1000 < gate).as("keep"))
        .groupBy("lang", "target_rate")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("lang"), col("n_total"), col("n_kept"), col("target_rate"),
          (col("n_kept").cast("double") / col("n_total").cast("double"))
            .as("realized_rate"))
    },
    Some {
      val gateCase = MixWeights.map { case (k, v) =>
        s"WHEN '$k' THEN ${(v * 1000).toLong}" }.mkString(" ")
      val targetCase = MixWeights.map { case (k, v) =>
        s"WHEN '$k' THEN CAST($v AS DOUBLE)" }.mkString(" ")
      s"""WITH k AS (
        SELECT lang,
          CASE lang $targetCase ELSE 0.0 END AS target_rate,
          CASE WHEN ((md5_number_lower(CAST(doc_id AS VARCHAR))
                % ${Dedup.M56})::BIGINT) % 1000
              < (CASE lang $gateCase ELSE 0 END)
            THEN 1 ELSE 0 END AS keep
        FROM documents)
      SELECT lang, count(*) AS n_total,
        CAST(sum(keep) AS BIGINT) AS n_kept, target_rate,
        CAST(sum(keep) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS realized_rate
      FROM k GROUP BY lang, target_rate"""
    })

  /** Token-distribution divergence per SOURCE against the corpus mix
    * (TextAnalysis.mixDivergence): both KL directions, add-one smoothed,
    * through the bit-portable ln and 1e-12 fixed-point sums — so the
    * whole instrument (not just its inputs) is hash-checked against
    * DuckDB computing the identical arithmetic. The mixture-QA
    * companion to txt_mix: mix declares sampling rates, this measures
    * whether a slice's LANGUAGE-LEVEL distribution actually matches
    * what it feeds the blend. */
  val txtMixDivergence = Q(
    "txt_mix_divergence",
    (s, dir) => TextAnalysis.mixDivergence(
      Tables.load(s, dir, "documents"), "source", "text"),
    Some {
      import graft.functions.PortableLn
      s"""WITH toks AS (
        SELECT source AS slice,
          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents),
      sc AS (SELECT slice, term, count(*) AS cs FROM toks GROUP BY 1, 2),
      ccc AS (SELECT term, CAST(sum(cs) AS BIGINT) AS cc FROM sc GROUP BY 1),
      st AS (SELECT slice, CAST(sum(cs) AS BIGINT) AS ns, count(*) AS vs
        FROM sc GROUP BY 1),
      ct AS (SELECT CAST(sum(cc) AS BIGINT) AS nc, count(*) AS v FROM ccc),
      grid AS (
        SELECT s.slice, c.term, COALESCE(x.cs, 0) AS cs, c.cc,
          s.ns, s.vs, t.nc, t.v
        FROM ccc c CROSS JOIN st s
        LEFT JOIN sc x ON x.slice = s.slice AND x.term = c.term
        CROSS JOIN ct t),
      g0 AS (SELECT *,
          (CAST(cs + 1 AS DOUBLE) * CAST(nc + v AS DOUBLE)) /
          (CAST(cc + 1 AS DOUBLE) * CAST(ns + v AS DOUBLE)) AS r
        FROM grid),
      ${PortableLn.cteChainSql("g0", "r", "lnr", "g")},
      terms AS (SELECT slice, ns, vs,
          CAST(floor(((CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE))
            * lnr) * 1.0e12) AS BIGINT) AS t_sc,
          CAST(floor((-((CAST(cc + 1 AS DOUBLE) / CAST(nc + v AS DOUBLE))
            * lnr)) * 1.0e12) AS BIGINT) AS t_cs
        FROM ${PortableLn.cteChainOut("g")})
      SELECT slice, max(ns) AS n_tokens, max(vs) AS n_terms,
        CAST(sum(t_sc) AS DOUBLE) / 1.0e12 AS kl_slice_corpus,
        CAST(sum(t_cs) AS DOUBLE) / 1.0e12 AS kl_corpus_slice
      FROM terms GROUP BY slice ORDER BY slice"""
    })

  /** BPE tokenizer: train 6 greedy merges on the whole corpus (argmax
    * pair by count DESC, pair ASC — total order, so the oracle replays
    * training as one pair-count/argmax/replace CTE triple per iteration,
    * the kmeansFixed unrolling), then encode docs 0..99: word count and
    * post-merge BPE symbol count per doc. Train state is the
    * distinct-word table, corpus-frequency weighted — vocab-sized, not
    * corpus-sized (operators.Bpe). */
  val txtBpe = Q(
    "txt_bpe",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val vocab = graft.operators.Bpe.train(
        graft.operators.Bpe.wordFreq(docs, "text"), iters = 6)
      graft.operators.Bpe.encodeCounts(
        docs.filter(col("doc_id") < 100), "doc_id", "text", vocab)
    },
    Some(s"""WITH $bpeTrainCtes,
        vocab AS (
          SELECT word, len(string_split(r, '^')) - 1 AS n_sym FROM e6),
        doc_words AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents WHERE doc_id < 100)
        SELECT d.doc_id, count(*) AS n_words, CAST(sum(v.n_sym) AS BIGINT) AS n_bpe
        FROM doc_words d JOIN vocab v USING (word)
        GROUP BY d.doc_id"""))

  /** DuckDB replay of Bpe.train's 6 merges: a pair-count / argmax /
    * replace CTE triple per iteration over the frequency-weighted word
    * table — shared by txt_bpe (counts) and txt_bpe_ids (id streams).
    * Precondition: the corpus must admit ≥6 merges (any corpus with a
    * multi-character word does). Bpe.train stops early when the pair
    * table empties; this fixed unrolling has no such break — CROSS JOIN
    * against an empty argmax CTE would silently empty the vocab. */
  private def bpeTrainCtes: String = {
    val iterCtes = (1 to 6).map { t =>
      s"""p$t AS (
          SELECT x, y, CAST(sum(f) AS BIGINT) AS c FROM (
            SELECT e.f, e.ss[i] AS x, e.ss[i + 1] AS y
            FROM (SELECT f, string_split(r, '^')[2:] AS ss FROM e${t - 1}) e,
              LATERAL (SELECT unnest(generate_series(1, len(ss) - 1)) AS i))
          GROUP BY x, y),
        m$t AS (SELECT x, y FROM p$t ORDER BY c DESC, x ASC, y ASC LIMIT 1),
        e$t AS (
          SELECT word, f, replace(r, '^' || x || '^' || y, '^' || x || y) AS r
          FROM e${t - 1}, m$t)"""
    }.mkString(",\n        ")
    s"""wf AS (
        SELECT word, count(*) AS f FROM (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents)
        GROUP BY word),
      e0 AS (
        SELECT word, f, regexp_replace(word, '(.)', '^\\1', 'g') AS r FROM wf),
      $iterCtes"""
  }

  /** The trainer-facing form of txt_bpe: docs 0..19 encoded to their
    * full BPE token-ID streams (symbol id = lexicographic rank in the
    * final symbol set — engine-independent), comma-joined in token
    * order. */
  val txtBpeIds = Q(
    "txt_bpe_ids",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val vocab = graft.operators.Bpe.train(
        graft.operators.Bpe.wordFreq(docs, "text"), iters = 6)
      graft.operators.Bpe.encodeIds(
        docs.filter(col("doc_id") < 20), "doc_id", "text", vocab)
    },
    Some(s"""WITH $bpeTrainCtes,
        syms AS (SELECT DISTINCT unnest(string_split(r, '^')[2:]) AS s FROM e6),
        symid AS (SELECT s, row_number() OVER (ORDER BY s) - 1 AS id FROM syms),
        wsym AS (
          SELECT word, i, ss[i] AS s
          FROM (SELECT word, string_split(r, '^')[2:] AS ss FROM e6),
            LATERAL (SELECT unnest(generate_series(1, len(ss))) AS i)),
        word_ids AS (
          SELECT word, string_agg(CAST(id AS VARCHAR), ',' ORDER BY i) AS word_ids
          FROM wsym JOIN symid USING (s) GROUP BY word),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM documents WHERE doc_id < 20),
        dw AS (
          SELECT doc_id, i, w[i] AS word
          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i))
      SELECT doc_id, string_agg(word_ids, ',' ORDER BY i) AS ids
      FROM dw JOIN word_ids USING (word)
      GROUP BY doc_id"""))

  /** The property that makes the tokenizer trustworthy, as a query:
    * decode(encode(x)) == x. Every token of docs 0..19 is encoded to
    * symbol ids and decoded back through the INVERSE id→symbol join;
    * the reassembled text_rt must equal the whitespace-normalized
    * token stream and n_mismatch must be 0 — a colliding or dropped
    * symbol id (the failure mode of a buggy id assignment) breaks the
    * hash here. Oracle replays both directions of the map. */
  val txtBpeRoundtrip = Q(
    "txt_bpe_roundtrip",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val vocab = graft.operators.Bpe.train(
        graft.operators.Bpe.wordFreq(docs, "text"), iters = 6)
      graft.operators.Bpe.roundTrip(
        docs.filter(col("doc_id") < 20), "doc_id", "text", vocab)
    },
    Some(s"""WITH $bpeTrainCtes,
        syms AS (SELECT DISTINCT unnest(string_split(r, '^')[2:]) AS s FROM e6),
        symid AS (SELECT s, row_number() OVER (ORDER BY s) - 1 AS id FROM syms),
        wsym AS (
          SELECT word, i, ss[i] AS s
          FROM (SELECT word, string_split(r, '^')[2:] AS ss FROM e6),
            LATERAL (SELECT unnest(generate_series(1, len(ss))) AS i)),
        wid AS (
          SELECT word, i, id FROM wsym JOIN symid USING (s)),
        dec AS (
          SELECT word, string_agg(sym.s, '' ORDER BY i) AS decoded
          FROM wid JOIN symid sym USING (id) GROUP BY word),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM documents WHERE doc_id < 20),
        dw AS (
          SELECT doc_id, i, w[i] AS word
          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i))
      SELECT doc_id, string_agg(decoded, ' ' ORDER BY i) AS text_rt,
        CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(CASE WHEN decoded <> word THEN 1 ELSE 0 END) AS BIGINT)
          AS n_mismatch
      FROM dw JOIN dec USING (word)
      GROUP BY doc_id"""))

  /** Per-group QUOTA CAP — the "cap over-represented domains" curation
    * rule (C4 drops boilerplate-heavy domains; mixture recipes cap any
    * single source): keep at most `cap` documents per language, chosen
    * by smallest hash56(doc_id) (deterministic, reproducible, stable
    * under corpus growth in the KMV sense — a new doc displaces at most
    * one incumbent). Emits the kept (lang, doc_id, rk) rows.
    *
    * Scale shape: rank-per-group over the group's hash order — the w1
    * top-k pattern; for skew-heavy groups the TopK Aggregator (w6) is
    * the shuffle-bounded twin, trading a sort for vocab-sized state. */
  val txtGroupCap = Q(
    "txt_group_cap",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy(col("__h"), col("doc_id"))
      Tables.load(s, dir, "documents")
        .withColumn("__h", Dedup.hash56(col("doc_id").cast("string")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 100)
        .select(col("lang"), col("doc_id"), col("rk").cast("long").as("rk"))
    },
    Some(s"""SELECT lang, doc_id, rk FROM (
        SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
          ORDER BY ${h56("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
        FROM documents) WHERE rk <= 100"""))

  /** Tokenizer FERTILITY by language — BPE symbols per word, the metric
    * tokenizer teams track per language slice (a vocab trained on an
    * English-heavy mix over-segments other languages; fertility is how
    * that shows up). Fixed-point millionths (integer DIV) so the ratio
    * is oracle-exact, same contract as txt_bigram_score. One broadcast
    * vocab join + one groupBy(lang) — the corpus streams once. */
  val txtFertility = Q(
    "txt_fertility",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val vocab = graft.operators.Bpe.train(
        graft.operators.Bpe.wordFreq(docs, "text"), iters = 6)
      docs.select(col("lang"),
          explode(TextAnalysis.rawTokens(col("text"))).as("word"))
        .join(broadcast(vocab.select("word", "n_sym")), "word")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_bpe"))
        .select(col("lang"), col("n_words"), col("n_bpe"),
          expr("(n_bpe * 1000000) DIV n_words").as("fert6"))
    },
    Some(s"""WITH $bpeTrainCtes,
        vocab AS (
          SELECT word, len(string_split(r, '^')) - 1 AS n_sym FROM e6),
        dw AS (
          SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents)
      SELECT lang, count(*) AS n_words, CAST(sum(n_sym) AS BIGINT) AS n_bpe,
        (CAST(sum(n_sym) AS BIGINT) * 1000000) // count(*) AS fert6
      FROM dw JOIN vocab USING (word)
      GROUP BY lang"""))

  /** DuckDB replay of Bpe.trainBatched(rounds, window): per round, one
    * pair-count CTE, a ranked candidate window (QUALIFY rk <= window), a
    * NON-recursive disjointness anti-join selecting the kept merges, and
    * `window` statically-unrolled apply steps (a missing step replaces
    * the never-occurring sentinel '^ ' — '^' is always followed by a
    * non-space symbol character — so it is the identity). */
  private def bpeBatchedCtes(rounds: Int, window: Int): String = {
    val roundCtes = (1 to rounds).map { t =>
      val steps = (1 to window).map { st =>
        s"""b${t}_$st AS (
          SELECT word, f, replace(r,
            coalesce((SELECT '^' || x || '^' || y FROM k$t WHERE step = $st), '^ '),
            coalesce((SELECT '^' || x || y FROM k$t WHERE step = $st), '')) AS r
          FROM b${t}_${st - 1})"""
      }.mkString(",\n        ")
      s"""p$t AS (
          SELECT x, y, CAST(sum(f) AS BIGINT) AS c FROM (
            SELECT e.f, e.ss[i] AS x, e.ss[i + 1] AS y
            FROM (SELECT f, string_split(r, '^')[2:] AS ss FROM e${t - 1}) e,
              LATERAL (SELECT unnest(generate_series(1, len(ss) - 1)) AS i))
          GROUP BY x, y),
        cand$t AS (
          SELECT x, y, row_number() OVER (ORDER BY c DESC, x ASC, y ASC) AS rk
          FROM p$t QUALIFY rk <= $window),
        k$t AS (
          SELECT x, y, row_number() OVER (ORDER BY rk) AS step
          FROM cand$t a
          WHERE NOT EXISTS (SELECT 1 FROM cand$t h
            WHERE h.rk < a.rk
              AND (h.x = a.x OR h.x = a.y OR h.y = a.x OR h.y = a.y))),
        b${t}_0 AS (SELECT word, f, r FROM e${t - 1}),
        $steps,
        e$t AS (SELECT word, f, r FROM b${t}_$window)"""
    }.mkString(",\n        ")
    s"""wf AS (
        SELECT word, count(*) AS f FROM (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents)
        GROUP BY word),
      e0 AS (
        SELECT word, f, regexp_replace(word, '(.)', '^\\1', 'g') AS r FROM wf),
      $roundCtes"""
  }

  /** txt_bpe's batched twin: 2 rounds of up-to-8 disjoint merges instead
    * of 6 sequential argmax jobs — the Bpe.trainBatched contract (stale
    * within-round counts, rank-ordered application) replayed exactly by
    * the oracle. Same encode step over docs 0..99. */
  val txtBpeBatched = Q(
    "txt_bpe_batched",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val vocab = graft.operators.Bpe.trainBatched(
        graft.operators.Bpe.wordFreq(docs, "text"), rounds = 2, window = 8)
      graft.operators.Bpe.encodeCounts(
        docs.filter(col("doc_id") < 100), "doc_id", "text", vocab)
    },
    Some(s"""WITH ${bpeBatchedCtes(rounds = 2, window = 8)},
        vocab AS (
          SELECT word, len(string_split(r, '^')) - 1 AS n_sym FROM e2),
        doc_words AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents WHERE doc_id < 100)
        SELECT d.doc_id, count(*) AS n_words, CAST(sum(v.n_sym) AS BIGINT) AS n_bpe
        FROM doc_words d JOIN vocab v USING (word)
        GROUP BY d.doc_id"""))

  /** Bigram-LM quality scoring — the perplexity-style filter of the
    * CCNet/Gopher curation recipes, in integer fixed point (conditional
    * probabilities in millionths, integer mean per doc) so the oracle
    * replays it bit-exactly; a true log-perplexity would reintroduce
    * cross-engine libm drift while preserving the same document ranking.
    * The LM trains on the WHOLE corpus; docs 0..99 are scored. */
  val txtBigramScore = Q(
    "txt_bigram_score",
    (s, dir) => graft.operators.TextAnalysis.bigramScore(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      .filter(col("doc_id") < 100)
      .orderBy("doc_id"),
    Some("""WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      bi AS (
        SELECT doc_id, t[i] AS x, t[i + 1] AS y
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks WHERE len(t) >= 2)),
      cnt AS (SELECT x, y, count(*) AS c_xy FROM bi GROUP BY 1, 2),
      pre AS (SELECT x, count(*) AS c_x FROM bi GROUP BY 1),
      scored AS (
        SELECT b.doc_id, (c.c_xy * 1000000) // p.c_x AS p6
        FROM bi b JOIN cnt c USING (x, y) JOIN pre p USING (x))
      SELECT doc_id, count(*) AS n_bigrams,
        CAST(sum(p6) // count(*) AS BIGINT) AS lm_score
      FROM scored WHERE doc_id < 100
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Per-document character-distribution Shannon entropy
    * (TextAnalysis.docEntropy) — the gibberish/quality signal, exact in
    * 1e-12 fixed point through PortableLn (mixDivergence's contract:
    * one IEEE division of exact counts per class, floored terms, BIGINT
    * sum). */
  val txtEntropy = Q(
    "txt_entropy",
    (s, dir) => graft.operators.TextAnalysis.docEntropy(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some {
      import graft.functions.PortableLn
      s"""WITH ch AS (
        SELECT doc_id, substring(text, i, 1) AS ch
        FROM documents,
          LATERAL (SELECT unnest(generate_series(1, length(text))) AS i)
        WHERE length(text) > 0),
      cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
      tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS k
        FROM cnt GROUP BY 1),
      vals AS (
        SELECT v, CAST(v AS DOUBLE) AS r FROM (
          SELECT c AS v FROM cnt UNION SELECT n FROM tot)),
      ${PortableLn.cteChainSql("vals", "r", "lnv", "g")},
      lnv AS (SELECT v, lnv FROM ${PortableLn.cteChainOut("g")}),
      terms AS (SELECT cnt.doc_id, n, k,
          CAST(floor(((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
            * (ln_n.lnv - ln_c.lnv)) * 1.0e12) AS BIGINT) AS term
        FROM cnt JOIN tot USING (doc_id)
        JOIN lnv ln_c ON ln_c.v = cnt.c
        JOIN lnv ln_n ON ln_n.v = tot.n)
      SELECT doc_id, max(n) AS n_chars, max(k) AS n_classes,
        CAST(sum(term) AS DOUBLE) / 1.0e12 AS entropy
      FROM terms GROUP BY doc_id ORDER BY doc_id"""
    })

  /** Top-40 PMI collocations (TextAnalysis.collocations): pointwise
    * mutual information in integer fixed point (pmi6 = c_xy·N·10⁶ DIV
    * (c_x·c_y) — the monotone transform of log PMI, so the ranking is
    * the textbook one with zero libm drift), bigrams with ≥5
    * occurrences, ties broken (x, y). */
  val txtCollocations = Q(
    "txt_collocations",
    (s, dir) => graft.operators.TextAnalysis.collocations(
      Tables.load(s, dir, "documents"), "doc_id", "text",
      minCount = 5L, k = 40),
    Some("""WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      bi AS (
        SELECT t[i] AS x, t[i + 1] AS y
        FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks WHERE len(t) >= 2)),
      cnt AS (SELECT x, y, count(*) AS c_xy FROM bi GROUP BY 1, 2
              HAVING count(*) >= 5),
      cx AS (SELECT x, count(*) AS c_x FROM bi GROUP BY 1),
      cy AS (SELECT y, count(*) AS c_y FROM bi GROUP BY 1),
      n AS (SELECT count(*) AS n_bi FROM bi)
      SELECT c.x, c.y, c.c_xy,
        (c.c_xy * n.n_bi * 1000000) // (cx.c_x * cy.c_y) AS pmi6
      FROM cnt c JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN n
      ORDER BY pmi6 DESC, x, y LIMIT 40"""))

  /** Fixed retrieval batch for txt_bm25 — the oracle SQL is generated
    * from these same constants (operators.Retrieval.bm25OracleSql). */
  val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "join"),
    2L -> Seq("hash", "scan", "filter"),
    3L -> Seq("vector", "stream"),
    4L -> Seq("customer", "merge", "window"),
    5L -> Seq("data", "query", "table"))

  /** BM25 ranked retrieval: top-10 docs per query from the inverted
    * index, scored in exact 1e-6 fixed point (operators.Retrieval —
    * true Lucene-form log idf through the bit-portable PortableLn,
    * floor before the order-invariant BIGINT sum). Plan: one
    * map-side-combined postings shuffle, broadcast query terms,
    * partial TopK — no window holds a query's full match list. */
  val txtBm25 = Q(
    "txt_bm25",
    (s, dir) => graft.operators.Retrieval.bm25TopK(
      Tables.load(s, dir, "documents"), "doc_id", "text", Bm25Queries, 10),
    Some(graft.operators.Retrieval.bm25OracleSql(Bm25Queries, 10)))

  /** RAG context assembly (Retrieval.contextPack): BM25 top-10 per
    * query, packed into a 256-token context in rank order with
    * prefix-stop truncation — retrieval and context-window assembly as
    * ONE relational plan. */
  val txtRagPack = Q(
    "txt_rag_pack",
    (s, dir) => graft.operators.Retrieval.contextPack(
      Tables.load(s, dir, "documents"), "doc_id", "text",
      Bm25Queries, k = 10, budget = 256L),
    Some(graft.operators.Retrieval.contextPackOracleSql(
      Bm25Queries, 10, 256L)))

  /** Phrase batch for txt_phrase — mixed 2- and 3-token phrases chosen
    * to have real occurrence spread in the corpus (bigrams ~45 hits,
    * trigrams ~7 at sf0.01). */
  val PhraseQueries: Seq[(Long, String)] = Seq(
    1L -> "table hash",
    2L -> "customer join",
    3L -> "slow hash batch",
    4L -> "part filter scan",
    5L -> "window fast query")

  /** Exact phrase search — the positional complement of txt_bm25:
    * token-ADJACENT matches ranked by occurrence count. Windows-as-
    * terms plan (operators.Retrieval.phraseSearch): n-token windows
    * emitted in-row per distinct phrase length, broadcast equi-join
    * against the phrase batch, partial TopK — matching a phrase costs
    * one probe regardless of its length, and no posting-list
    * intersection chain. */
  val txtPhrase = Q(
    "txt_phrase",
    (s, dir) => graft.operators.Retrieval.phraseSearch(
      Tables.load(s, dir, "documents"), "doc_id", "text",
      PhraseQueries, 10),
    Some(graft.operators.Retrieval.phraseOracleSql(PhraseQueries, 10)))

  /** Second phrase batch, served from the STORED phrase index — proves
    * the index outlives the batch that built it (the Bm25QueriesB
    * pattern). */
  val PhraseQueriesB: Seq[(Long, String)] = Seq(
    1L -> "join scan",
    2L -> "query merge",
    3L -> "data table join",
    4L -> "hash filter",
    5L -> "big stream sort")

  /** Exact phrase search served from the MATERIALIZED window-postings
    * store (operators.PhraseIndex): window extraction runs once per
    * index build; this batch reads only the stored window-bucketed
    * postings. The oracle replays extraction from scratch — identical
    * results IS the stored-index contract (the txt_bm25_stored
    * pattern). */
  val txtPhraseStored = Q(
    "txt_phrase_stored",
    (s, dir) => {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.PhraseIndex.phraseTopKStored(s,
        Tables.load(s, dir, "documents"), "doc_id", "text",
        PhraseQueriesB, 10, tag = tag, lengths = Seq(2, 3))
    },
    Some(graft.operators.Retrieval.phraseOracleSql(PhraseQueriesB, 10)))

  /** Mixed batch for txt_phrase_long: two phrases at indexed lengths
    * (pure stored probes), two 4-token phrases with real corpus hits
    * (prefix-probe + verify path), and one 4-token phrase whose 3-token
    * PREFIX occurs but whose full phrase does not — the query that
    * proves the verify step actually filters, not just forwards, the
    * candidate set. */
  val PhraseQueriesLong: Seq[(Long, String)] = Seq(
    1L -> "table hash",
    2L -> "slow hash batch",
    3L -> "value slow hash data",
    4L -> "filter value small value",
    5L -> "filter value small window")

  /** Phrases LONGER than the indexed lengths served from the SAME 2..3
    * stored index (operators.PhraseIndex.servePhrasesWithFallback): the
    * length-4 phrases probe their length-3 prefix postings for
    * candidates, then verify the full phrase by re-extracting windows
    * over ONLY the candidate docs — a broadcast-semi-pruned text scan,
    * ∝ candidates, never the corpus (Williams/Zobel/Bahle 2004's
    * combined-index serve). The oracle replays the phrase search from
    * scratch at every length — equality proves prefix recall AND verify
    * precision. */
  val txtPhraseLong = Q(
    "txt_phrase_long",
    (s, dir) => {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      // same tag as txt_phrase_stored: one shared 2..3 index build
      graft.operators.PhraseIndex.buildPhraseIndex(s,
        Tables.load(s, dir, "documents"), "doc_id", "text", tag,
        lengths = Seq(2, 3))
      graft.operators.PhraseIndex.servePhrasesWithFallback(s,
        Tables.load(s, dir, "documents"), "doc_id", "text",
        PhraseQueriesLong, 10, tag)
    },
    Some(graft.operators.Retrieval.phraseOracleSql(PhraseQueriesLong, 10)))

  /** The phrase-index maintenance cycle as one oracle-exact query —
    * the txt_bm25_upsert shape on the window-postings store: build,
    * RETRACT doc_id%10==3, RE-INDEX doc_id%10==7 with changed text,
    * COMPACT (atomic era swap), retract doc_id%10==9 post-compaction,
    * serve. Must equal a from-scratch extraction over the mutated
    * corpus — which is exactly what the oracle computes. */
  val txtPhraseUpsert = Q(
    "txt_phrase_upsert",
    (s, dir) => {
      import graft.operators.PhraseIndex
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_pup"
      graft.sources.Bucketing.ensureOnce(s"phraseupsert@$tag") {
        val docs = Tables.load(s, dir, "documents")
        PhraseIndex.buildPhraseIndex(s, docs, "doc_id", "text", tag,
          lengths = Seq(2, 3))
        PhraseIndex.deleteFromPhraseIndex(s,
          docs.filter(col("doc_id") % 10 === 3).select("doc_id"),
          "doc_id", tag)
        PhraseIndex.upsertIntoPhraseIndex(s,
          docs.filter(col("doc_id") % 10 === 7)
            .select(col("doc_id"),
              concat(col("text"), lit(" upd")).as("text")),
          "doc_id", "text", tag)
        PhraseIndex.compactPhraseIndex(s, tag, "doc_id")
        PhraseIndex.deleteFromPhraseIndex(s,
          docs.filter(col("doc_id") % 10 === 9).select("doc_id"),
          "doc_id", tag)
      }
      PhraseIndex.servePhrases(s, "doc_id", PhraseQueries, 10, tag)
    },
    Some {
      val mutated = "SELECT doc_id, CASE WHEN doc_id % 10 = 7 " +
        "THEN text || ' upd' ELSE text END AS text " +
        "FROM documents WHERE doc_id % 10 NOT IN (3, 9)"
      graft.operators.Retrieval.phraseOracleSql(PhraseQueries, 10,
        corpusSql = Some(mutated))
    })

  /** Query batch for txt_phrase_rank: BM25 terms + an exact-phrase
    * constraint per query — the reference's ES bool `must` +
    * `match_phrase` combination (api_clients.py:677-728). */
  val PhraseRankQueries: Seq[(Long, Seq[String], String)] = Seq(
    (1L, Seq("spark", "join"), "table hash"),
    (2L, Seq("hash", "scan", "filter"), "customer join"),
    (3L, Seq("data", "query", "table"), "join scan"),
    (4L, Seq("customer", "merge", "window"), "part filter scan"),
    (5L, Seq("vector", "stream"), "hash filter"))

  /** Phrase-constrained ranked retrieval: candidates = docs containing
    * the exact phrase (stored phrase-index probe), ranking = BM25 over
    * the stored term postings; rank assigned on the FILTERED candidate
    * set. Both stores are the ones txt_bm25_stored / txt_phrase_stored
    * build (shared tags — one index family per corpus, many query
    * shapes), and the plan runs one postings pass per leg joined by a
    * semi-join before the partial TopK. */
  val txtPhraseRank = Q(
    "txt_phrase_rank",
    (s, dir) => {
      import graft.operators.{PhraseIndex, Retrieval}
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val docs = Tables.load(s, dir, "documents")
      Retrieval.buildIndex(s, docs, "doc_id", "text", tag)
      PhraseIndex.buildPhraseIndex(s, docs, "doc_id", "text", tag,
        lengths = Seq(2, 3))
      Retrieval.phraseRankedTopK(s, "doc_id", PhraseRankQueries, 10,
        bm25Tag = tag, phraseTag = tag)
    },
    Some(graft.operators.Retrieval.phraseRankOracleSql(
      PhraseRankQueries, 10)))

  /** Second retrieval batch, served from the STORED index — proves the
    * index outlives the batch that built it. */
  val Bm25QueriesB: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("order", "group", "sort"),
    2L -> Seq("big", "small"),
    3L -> Seq("line", "part", "key"))

  /** BM25 served from the materialized term-bucketed postings store
    * (operators.Retrieval.bm25TopKStored): the corpus is tokenized once
    * per index build; this query batch reads only the stored tables.
    * The oracle recomputes from scratch — identical results, which IS
    * the stored-index contract. */
  val txtBm25Stored = Q(
    "txt_bm25_stored",
    (s, dir) => {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.Retrieval.bm25TopKStored(s,
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Bm25QueriesB, 10, tag = tag)
    },
    Some(graft.operators.Retrieval.bm25OracleSql(Bm25QueriesB, 10)))

  /** FILTERED sparse search (Retrieval.serveIndexFiltered) — "search
    * WHERE …" over the SAME stored index txt_bm25_stored builds: a
    * metadata-derived id set (doc_id%3==0 standing in for a lang/date
    * predicate) narrows candidates AFTER df/idf and BEFORE the TopK, so
    * scores are identical to the unfiltered serve and ranks re-assign
    * among the allowed docs — post-filter semantics, the deployed
    * bool/filter + match shape. The oracle spells the same placement
    * out in SQL (filter between scoring and ranking). The dense twin is
    * sim_ivf_filtered. */
  val txtBm25Filtered = Q(
    "txt_bm25_filtered",
    (s, dir) => {
      import graft.operators.Retrieval
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val docs = Tables.load(s, dir, "documents")
      Retrieval.buildIndex(s, docs, "doc_id", "text", tag)
      Retrieval.serveIndexFiltered(s, "doc_id", Bm25QueriesB, 10, tag,
        allowedIds = docs.filter(col("doc_id") % 3 === 0).select("doc_id"))
    },
    Some(graft.operators.Retrieval.bm25FilteredOracleSql(
      Bm25QueriesB, 10, "doc_id % 3 = 0")))

  /** Token-budget corpus selection (Curation.budgetFill): fill a fixed
    * token budget with the highest-quality documents — quality here is
    * fixed-point type-token ratio, (1000·distinct)/tokens in integer
    * division, so both engines score bit-identically. Semantically one
    * corpus-wide cumulative sum ordered by (quality DESC, doc_id); the
    * implementation is the banded exact rewrite — per-quality-class
    * totals, boundary class found on that tiny frame, whole classes
    * above the boundary by broadcast threshold, residual filled from
    * the boundary class alone — so no window ever orders the corpus on
    * one task. The oracle IS the naive cumulative sum. */
  val txtBudgetFill = Q(
    "txt_budget_fill",
    (s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("ts"))
        .select(col("doc_id"), size(col("ts")).cast("long").as("n_tok"),
          size(array_distinct(col("ts"))).cast("long").as("n_dis"))
        .withColumn("q", expr("(1000 * n_dis) div n_tok"))
      graft.operators.Curation.budgetFill(toks, "doc_id", "q", "n_tok",
          budget = 12000L)
        .orderBy(col("quality").desc, col("doc_id"))
    },
    Some("""WITH t AS (
        SELECT doc_id,
          string_split_regex(lower(trim(text)), '\s+') AS ts
        FROM documents),
      d AS (
        SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
          CAST(len(list_distinct(ts)) AS BIGINT) AS n_dis FROM t),
      s AS (SELECT doc_id, n_tok, (1000 * n_dis) // n_tok AS q FROM d),
      c AS (SELECT doc_id, q, n_tok,
          sum(n_tok) OVER (ORDER BY q DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM s)
      SELECT doc_id, q AS quality, n_tok FROM c WHERE cum <= 12000
      ORDER BY quality DESC, doc_id"""))

  /** DSIR importance weighting (Curation.dsirWeights): score every
    * non-English document by how much its hashed unigram+bigram profile
    * resembles the English slice (the "target corpus"), keep the top
    * 100 — the Xie et al. 2023 data-selection recipe with the English
    * docs standing in for the high-quality target. Hashing is the
    * repo-wide md5-derived hash56; the per-bucket log-ratio goes
    * through PortableLn into 1e-9 fixed point, so both engines sum the
    * identical BIGINTs. */
  val txtDsir = Q(
    "txt_dsir",
    (s, dir) => graft.operators.Curation.dsirWeights(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 1024)
      .orderBy(col("logw9").desc, col("doc_id")).limit(100),
    Some {
      import graft.functions.PortableLn
      s"""WITH d AS (
          SELECT doc_id, lang = 'en' AS tgt,
            string_split_regex(lower(trim(text)), '\\s+') AS t
          FROM documents),
        uni AS (SELECT doc_id, tgt, unnest(t) AS f FROM d),
        bi AS (
          SELECT doc_id, tgt, unnest(list_transform(
            generate_series(1, len(t) - 1),
            i -> t[i] || ' ' || t[i + 1])) AS f
          FROM d WHERE len(t) >= 2),
        feats AS (
          SELECT doc_id, tgt, ${h56("f")} % 1024 AS b
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        cnt AS (
          SELECT b,
            CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
            CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cs
          FROM feats GROUP BY 1),
        tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
            CAST(sum(cs) AS BIGINT) AS ns FROM cnt),
        g0 AS (
          SELECT b,
            (CAST(ct + 1 AS DOUBLE) * CAST(ns + 1024 AS DOUBLE)) /
            (CAST(cs + 1 AS DOUBLE) * CAST(nt + 1024 AS DOUBLE)) AS r
          FROM cnt CROSS JOIN tot),
        ${PortableLn.cteChainSql("g0", "r", "lnr", "g")},
        lr AS (SELECT b, CAST(floor(lnr * 1.0e9) AS BIGINT) AS lr9
          FROM ${PortableLn.cteChainOut("g")})
        SELECT doc_id, n_feats, logw9 FROM (
          SELECT f.doc_id, count(*) AS n_feats,
            CAST(sum(l.lr9) AS BIGINT) AS logw9
          FROM feats f JOIN lr l USING (b) WHERE NOT f.tgt GROUP BY 1)
        ORDER BY logw9 DESC, doc_id LIMIT 100"""
    })

  /** The full index-maintenance cycle the round-7 verdict flagged as
    * missing, as one oracle-exact query: build the stored BM25 index
    * over the corpus, RETRACT every doc_id%10==3 (tombstones), RE-INDEX
    * every doc_id%10==7 with changed text (upsert = tombstone old gen +
    * append new gen), COMPACT (physically drop suppressed rows, merge
    * small files), then retract doc_id%10==9 post-compaction so serving
    * also exercises live tombstones over a compacted store. The serve
    * must equal a from-scratch build over the mutated corpus — which is
    * exactly what the oracle computes, making retraction correctness a
    * hash-checked property, not a unit assertion. */
  val txtBm25Upsert = Q(
    "txt_bm25_upsert",
    (s, dir) => {
      import graft.operators.Retrieval
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_up"
      graft.sources.Bucketing.ensureOnce(s"bm25upsert@$tag") {
        val docs = Tables.load(s, dir, "documents")
        Retrieval.buildIndex(s, docs, "doc_id", "text", tag)
        Retrieval.deleteFromIndex(s,
          docs.filter(col("doc_id") % 10 === 3).select("doc_id"),
          "doc_id", tag)
        Retrieval.upsertIntoIndex(s,
          docs.filter(col("doc_id") % 10 === 7)
            .select(col("doc_id"),
              concat(col("text"), lit(" upd")).as("text")),
          "doc_id", "text", tag)
        Retrieval.compactIndex(s, tag, "doc_id")
        Retrieval.deleteFromIndex(s,
          docs.filter(col("doc_id") % 10 === 9).select("doc_id"),
          "doc_id", tag)
      }
      Retrieval.serveIndex(s, "doc_id", Bm25Queries, 10, tag)
    },
    Some {
      val mutated = "SELECT doc_id, CASE WHEN doc_id % 10 = 7 " +
        "THEN text || ' upd' ELSE text END AS text " +
        "FROM documents WHERE doc_id % 10 NOT IN (3, 9)"
      s"""WITH ${graft.operators.Retrieval.bm25Ctes(
          Bm25Queries, corpusSql = Some(mutated))}
        SELECT query_id, rank, doc_id, score_fp FROM bm25_ranked
        WHERE rank <= 10"""
    })

  /** The instrument behind round 8's scorer fix: per query, how far
    * the TRUE log-idf BM25 ranking (idfMode "log", the default) moved
    * from round 7's log-free odds-ratio ranking (idfMode "odds").
    * n_common = top-10 set overlap, n_same_pos = positions unchanged,
    * footrule = Σ|Δrank| over the common docs (Spearman's footrule on
    * the intersection). A nonzero footrule/sub-10 n_same_pos is the
    * measured proof the odds-ratio scorer was NOT ranking like the
    * algorithm it was named for; both chains share one postings build
    * and one stats frame. */
  val txtBm25Rankshift = Q(
    "txt_bm25_rankshift",
    (s, dir) => {
      import graft.operators.Retrieval
      val post = graft.operators.Scratch.register(Retrieval.postings(
        Tables.load(s, dir, "documents"), "doc_id", "text").cache())
      val stats = post.groupBy(col("doc_id")).agg(max("dl").as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      val ln = Retrieval.bm25Serve(post, stats, "doc_id", Bm25Queries, 10)
        .select(col("query_id"), col("doc_id"), col("rank").as("rank_ln"))
      val od = Retrieval.bm25Serve(post, stats, "doc_id", Bm25Queries, 10,
          idfMode = "odds")
        .select(col("query_id"), col("doc_id"), col("rank").as("rank_od"))
      ln.join(od, Seq("query_id", "doc_id"), "left_outer")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_ln"),
          count(col("rank_od")).as("n_common"),
          sum(when(col("rank_ln") === col("rank_od"), 1L).otherwise(0L))
            .as("n_same_pos"),
          coalesce(sum(abs(col("rank_ln") - col("rank_od"))), lit(0L))
            .as("footrule"))
        .orderBy("query_id")
    },
    Some {
      s"""WITH ${graft.operators.Retrieval.bm25Ctes(
          Bm25Queries, idfMode = "log", pre = "ln_")},
        ${graft.operators.Retrieval.bm25Ctes(
          Bm25Queries, idfMode = "odds", pre = "od_")},
        lnk AS (SELECT query_id, doc_id, rank AS rank_ln
          FROM ln_bm25_ranked WHERE rank <= 10),
        odk AS (SELECT query_id, doc_id, rank AS rank_od
          FROM od_bm25_ranked WHERE rank <= 10),
        j AS (SELECT l.query_id, l.rank_ln, o.rank_od
          FROM lnk l LEFT JOIN odk o USING (query_id, doc_id))
        SELECT query_id, count(*) AS n_ln,
          count(rank_od) AS n_common,
          CAST(coalesce(sum(CASE WHEN rank_ln = rank_od THEN 1 ELSE 0 END),
            0) AS BIGINT) AS n_same_pos,
          CAST(coalesce(sum(abs(rank_ln - rank_od)), 0) AS BIGINT)
            AS footrule
        FROM j GROUP BY query_id ORDER BY query_id"""
    })

  /** FEATURE HASHING (TextAnalysis.hashFeatures): docs 0..19 as
    * 64-bucket signed hashed-unigram count vectors — the
    * vocabulary-free featurizer (one token scan, no dictionary, no
    * OOV) that classifiers and cheap quality models run on at corpus
    * scale. Exact integers end to end; the oracle replays the bucket
    * and sign hashes and densifies through a generate_series left
    * join. */
  val txtHashFeatures = Q(
    "txt_hash_features",
    (s, dir) => graft.operators.TextAnalysis.hashFeatures(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 20),
        "doc_id", "text", dims = 64)
      .orderBy("doc_id"),
    Some {
      val m56 = graft.operators.Dedup.M56
      s"""WITH d AS (
        SELECT doc_id,
          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents WHERE doc_id < 20),
      h AS (
        SELECT doc_id,
          ((md5_number_lower(tok) % $m56)::BIGINT) % 64 AS idx,
          CASE WHEN ((md5_number_lower(tok || ':s') % $m56)::BIGINT) % 2 = 0
            THEN 1 ELSE -1 END AS sgn
        FROM d),
      c AS (SELECT doc_id, idx, CAST(sum(sgn) AS BIGINT) AS v
        FROM h GROUP BY 1, 2),
      g AS (
        SELECT i.doc_id, gs.i AS idx, coalesce(c.v, 0) AS v
        FROM (SELECT DISTINCT doc_id FROM d) i
        CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) gs
        LEFT JOIN c ON c.doc_id = i.doc_id AND c.idx = gs.i)
      SELECT doc_id,
        string_agg(CAST(v AS VARCHAR), ',' ORDER BY idx) AS features
      FROM g GROUP BY 1 ORDER BY 1"""
    })

  /** ZIPF RANK-FREQUENCY FIT (Zipf 1949; the log-log slope every
    * corpus-statistics report leads with — natural language sits near
    * −1, and a corpus drifting toward 0 or −2 signals boilerplate
    * flooding or vocabulary collapse): OLS of ln(freq) on ln(rank)
    * over the top-100 tokens. Exactness end to end: top-100 is a
    * bounded TakeOrdered; ranks come from
    * [[graft.operators.Align.zipWithGlobalIndex]] (no window); both
    * logs are [[graft.functions.PortableLn]] chains (bit-identical
    * IEEE in both engines) floored to 1e-9 fixed point, so the OLS
    * moments are INTEGER sums (order-independent) and the slope is
    * one shared-text division of exact DECIMAL/HUGEINT numerators.
    * Shape: token count combine → 100-row tail; the ln chain runs on
    * 100 rows, never the corpus. */
  val txtZipfFit: Q = {
    val slopeT = "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
    // mean terms divide by the ACTUAL row count n, not the top-100
    // limit: the corpus vocabulary can be (and is) smaller than 100,
    // and ȳ = Σy/n — a hardcoded /100 scales the intercept by n/100.
    // Shared expression text, so both engines evaluate identically.
    val interT = s"(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) - ($slopeT)" +
      " * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 1.0e9"
    Q(
      "txt_zipf_fit",
      (s, dir) => {
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.types.DecimalType
        def d(c: Column) = c.cast(DecimalType(38, 0))
        val cnt = Tables.load(s, dir, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+"))
            .as("token"))
          .groupBy("token").agg(count(lit(1)).as("cnt"))
        val top = cnt.orderBy(col("cnt").desc, col("token")).limit(100)
        val ranked = graft.operators.Align.zipWithGlobalIndex(
          top, "rank", col("cnt").desc, col("token"))
          .withColumn("rd", col("rank").cast("double"))
          .withColumn("cd", col("cnt").cast("double"))
        val lnBoth = graft.functions.PortableLn.withLn(
          graft.functions.PortableLn.withLn(ranked, "rd", "lnr"),
          "cd", "lnc")
        lnBoth
          .select(floor(col("lnr") * lit(1.0e9)).cast("long").as("x9"),
            floor(col("lnc") * lit(1.0e9)).cast("long").as("y9"))
          .agg(count(lit(1)).as("n"),
            sum(d(col("x9"))).as("sx"), sum(d(col("y9"))).as("sy"),
            sum(d(col("x9")) * d(col("y9"))).as("sxy"),
            sum(d(col("x9")) * d(col("x9")))
              .as("sxx"))
          .select(col("n"),
            (d(col("n")) * col("sxy") - col("sx") * col("sy")).as("num"),
            (d(col("n")) * col("sxx") - col("sx") * col("sx")).as("den"),
            col("sx"), col("sy"))
          .select(col("n").cast("long").as("n"),
            expr(slopeT).as("slope"), expr(interT).as("ln_c0"))
      },
      Some(s"""WITH tok AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
            AS token
          FROM documents),
        cnt AS (
          SELECT token, CAST(count(*) AS BIGINT) AS cnt
          FROM tok GROUP BY 1),
        top AS (SELECT token, cnt FROM cnt
          ORDER BY cnt DESC, token LIMIT 100),
        rk AS (
          SELECT cnt,
            CAST(row_number() OVER (ORDER BY cnt DESC, token) AS DOUBLE)
              AS rd,
            CAST(cnt AS DOUBLE) AS cd
          FROM top),
        ${graft.functions.PortableLn.cteChainSql("rk", "rd", "lnr", "zr")},
        ${graft.functions.PortableLn.cteChainSql(
          graft.functions.PortableLn.cteChainOut("zr"), "cd", "lnc", "zc")},
        f AS (
          SELECT CAST(floor(lnr * 1.0e9) AS BIGINT) AS x9,
            CAST(floor(lnc * 1.0e9) AS BIGINT) AS y9
          FROM ${graft.functions.PortableLn.cteChainOut("zc")}),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
            sum(CAST(x9 AS HUGEINT)) AS sx, sum(CAST(y9 AS HUGEINT)) AS sy,
            sum(CAST(x9 AS HUGEINT) * y9) AS sxy,
            sum(CAST(x9 AS HUGEINT) * x9) AS sxx
          FROM f),
        a AS (
          SELECT n, sx, sy,
            n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
          FROM m)
        SELECT n, $slopeT AS slope, $interT AS ln_c0
        FROM a"""))
  }

  /** HEAPS' LAW FIT (Heaps 1978; Herdan 1960) — the vocabulary-growth
    * exponent: V(n) ≈ K·n^β, natural text sits at β ≈ 0.4–0.6.
    * The Zipf fit reads the HEAD of the frequency distribution; this
    * reads the TAIL's growth — a corpus whose β collapses toward 0 has
    * stopped contributing new vocabulary (template flooding), one near
    * 1 is noise. Ten prefix checkpoints over the doc_id order: V(k) =
    * tokens whose FIRST document lands before cutoff n_k = ⌊k·N/10⌋ —
    * one min-per-token combine, ten conditional sums decided by the
    * exact integer cross-multiplication fd·10 < N·k (no division
    * anywhere near the predicate), then the txt_zipf_fit machinery:
    * PortableLn on 10 rows, OLS moments as 1e-9 fixed-point integer
    * sums, β = one shared-text division. The checkpoint frame rides a
    * 1-row broadcast (whitelisted). Measured corpus truth: this
    * synthetic corpus's 31-token vocabulary saturates inside the
    * first decile, so β = 0.0 exactly — the degenerate case IS the
    * flag the operator exists to raise. */
  /** HILL TAIL-INDEX ESTIMATOR (Hill 1975) — the heavy-tail exponent
    * read directly off the top ORDER STATISTICS, the third leg of the
    * corpus-statistics tripod: Zipf fits the head's rank-frequency
    * slope, Heaps fits vocabulary growth, Hill measures how heavy the
    * frequency tail itself is (α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)); a
    * small α means a few tokens dominate the corpus — the boilerplate
    * signal). Exactness: the k+1 top counts are one bounded
    * TakeOrdered; ranks from zipWithGlobalIndex (no window); each
    * ln(x_i/x_ref) is the bit-portable chain on a ≤k-row spine floored
    * to 1e-9 fixed point, so the sum is an integer and α̂ is one
    * shared-text division. k = 20 (the corpus vocabulary is ~31). */
  val txtHillTail: Q = {
    val k = 20
    val alphaT = s"(CAST($k AS DOUBLE) * 1.0e9 / CAST(s9 AS DOUBLE))"
    Q(
      "txt_hill_tail",
      (s, dir) => {
        val cnt = Tables.load(s, dir, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+"))
            .as("token"))
          .groupBy("token").agg(count(lit(1)).as("cnt"))
        val top = cnt.orderBy(col("cnt").desc, col("token")).limit(k + 1)
        val ranked = graft.operators.Align.zipWithGlobalIndex(
          top, "rank", col("cnt").desc, col("token"))
        val ref = ranked.filter(col("rank") === (k + 1))
          .select(col("cnt").as("cref"))
        val g0 = ranked.filter(col("rank") <= k)
          .crossJoin(broadcast(ref))
          .withColumn("r",
            col("cnt").cast("double") / col("cref").cast("double"))
        graft.functions.PortableLn.withLn(g0, "r", "lnr")
          .select(floor(col("lnr") * lit(1.0e9)).cast("long").as("t9"))
          .agg(count(lit(1)).cast("long").as("k"),
            sum("t9").as("s9"))
          .select(col("k"), col("s9").cast("long").as("s9"),
            expr(alphaT).as("alpha_hill"))
      },
      Some {
        import graft.functions.PortableLn
        s"""WITH tok AS (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
            AS token
          FROM documents),
        cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
          FROM tok GROUP BY 1),
        top AS (SELECT token, cnt FROM cnt
          ORDER BY cnt DESC, token LIMIT ${k + 1}),
        rk AS (
          SELECT cnt, CAST(row_number()
            OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
          FROM top),
        ref AS (SELECT cnt AS cref FROM rk WHERE rank = ${k + 1}),
        g0 AS (
          SELECT CAST(cnt AS DOUBLE) / CAST(cref AS DOUBLE) AS r
          FROM rk CROSS JOIN ref WHERE rank <= $k),
        ${PortableLn.cteChainSql("g0", "r", "lnr", "gh")},
        t AS (SELECT CAST(floor(lnr * 1.0e9) AS BIGINT) AS t9
          FROM ${PortableLn.cteChainOut("gh")})
        SELECT CAST(count(*) AS BIGINT) AS k,
          CAST(sum(t9) AS BIGINT) AS s9, $alphaT AS alpha_hill
        FROM t"""
      })
  }

  val txtHeapsFit: Q = {
    val slopeT = "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
    val interT = s"(CAST(sy AS DOUBLE) / 1.0e1 - ($slopeT)" +
      " * CAST(sx AS DOUBLE) / 1.0e1) / 1.0e9"
    Q(
      "txt_heaps_fit",
      (s, dir) => {
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.types.DecimalType
        def d(c: Column) = c.cast(DecimalType(38, 0))
        val docs = Tables.load(s, dir, "documents")
        val first = docs
          .select(col("doc_id"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
          .groupBy("token").agg(min("doc_id").as("fd"))
        val nd = docs.agg((max("doc_id") + 1).as("nd"))
        val vAggs = (1 to 10).map(k =>
          sum(when(col("fd") * 10 < col("nd") * k, 1L).otherwise(0L))
            .as(s"v$k")) :+ max("nd").as("nd2")
        val pts = first.crossJoin(broadcast(nd))
          .agg(vAggs.head, vAggs.tail: _*)
          .select(explode(array((1 to 10).map(k =>
            struct(expr(s"CAST(nd2 * $k div 10 AS DOUBLE)").as("rd"),
              col(s"v$k").cast("double").as("cd"))): _*)).as("p"))
          .select(col("p.rd").as("rd"), col("p.cd").as("cd"))
        val lnBoth = graft.functions.PortableLn.withLn(
          graft.functions.PortableLn.withLn(pts, "rd", "lnr"), "cd", "lnc")
        lnBoth
          .select(floor(col("lnr") * lit(1.0e9)).cast("long").as("x9"),
            floor(col("lnc") * lit(1.0e9)).cast("long").as("y9"))
          .agg(count(lit(1)).as("n"),
            sum(d(col("x9"))).as("sx"), sum(d(col("y9"))).as("sy"),
            sum(d(col("x9")) * d(col("y9"))).as("sxy"),
            sum(d(col("x9")) * d(col("x9")))
              .as("sxx"))
          .select(col("n"),
            (d(col("n")) * col("sxy") - col("sx") * col("sy")).as("num"),
            (d(col("n")) * col("sxx") - col("sx") * col("sx")).as("den"),
            col("sx"), col("sy"))
          .select(col("n").cast("long").as("n"),
            expr(slopeT).as("beta"), expr(interT).as("ln_k0"))
      },
      Some(s"""WITH tok AS (
          SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
          FROM documents),
        f AS (SELECT token, min(doc_id) AS fd FROM tok GROUP BY 1),
        ndt AS (SELECT max(doc_id) + 1 AS nd FROM documents),
        v AS (
          SELECT
            ${(1 to 10).map(k =>
              s"CAST(sum(CASE WHEN fd * 10 < nd * $k THEN 1 ELSE 0 END) AS BIGINT) AS v$k")
              .mkString(",\n            ")},
            max(nd) AS nd2
          FROM f CROSS JOIN ndt),
        p AS (
          ${(1 to 10).map(k =>
            s"SELECT CAST(nd2 * $k // 10 AS DOUBLE) AS rd, CAST(v$k AS DOUBLE) AS cd FROM v")
            .mkString("\n          UNION ALL ")}),
        ${graft.functions.PortableLn.cteChainSql("p", "rd", "lnr", "hr")},
        ${graft.functions.PortableLn.cteChainSql(
          graft.functions.PortableLn.cteChainOut("hr"), "cd", "lnc", "hc")},
        ff AS (
          SELECT CAST(floor(lnr * 1.0e9) AS BIGINT) AS x9,
            CAST(floor(lnc * 1.0e9) AS BIGINT) AS y9
          FROM ${graft.functions.PortableLn.cteChainOut("hc")}),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
            sum(CAST(x9 AS HUGEINT)) AS sx, sum(CAST(y9 AS HUGEINT)) AS sy,
            sum(CAST(x9 AS HUGEINT) * y9) AS sxy,
            sum(CAST(x9 AS HUGEINT) * x9) AS sxx
          FROM ff),
        a AS (
          SELECT n, sx, sy,
            n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
          FROM m)
        SELECT n, $slopeT AS beta, $interT AS ln_k0
        FROM a"""))
  }

  val all: Seq[Q] = Seq(txtZipfFit, txtHeapsFit, txtHillTail, txtPii, txtRepetition, txtGopher, txtC4, txtVocab, txtEncode,
    txtSample, txtChunks, txtDecontam, txtPack, txtEpochPack, txtTfidf,
    txtMix, txtMixDivergence, txtSplit,
    txtBpe, txtBpeIds, txtBpeRoundtrip, txtBpeBatched, txtFertility,
    txtBigramScore, txtCollocations, txtEntropy, txtShuffle, txtDecontamRatio, txtGroupCap, txtBm25,
    txtBm25Stored, txtBm25Filtered, txtBudgetFill, txtDsir, txtRagPack,
    txtBm25Rankshift, txtBm25Upsert, txtPhrase,
    txtPhraseStored, txtPhraseUpsert, txtPhraseRank, txtPhraseLong,
    txtMixTemperature,
    txtWeightedSample, txtWeightedStratified, txtHeavyTokens, txtHeavyByLang,
    txtHashFeatures)
}
