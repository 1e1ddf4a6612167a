package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: deterministic train (greedy merge of the
  * most frequent adjacent symbol pair, repeated) + encode — the real
  * pretraining tokenization shape that txt_encode's word-vocab join
  * approximates (reference tokenizes with a fixed external vocab,
  * app.py's CSV ingest normalizers; a corpus engine must TRAIN the vocab
  * from the corpus itself).
  *
  * Representation: a word's symbol sequence is a string with every symbol
  * PREFIXED by '^' ("abc" → "^a^b^c"). Prefix markers make a literal
  * `replace(r, "^x^y", "^xy")` exactly the greedy left-to-right
  * non-overlapping merge pass of classic BPE — consecutive occurrences
  * don't share boundary characters (the trailing-delimiter ambiguity a
  * space-joined form suffers), and multi-char symbols can't false-match
  * inside neighbors. Both Spark and DuckDB scan left-to-right and resume
  * AFTER each replacement, which is precisely "a symbol merged this
  * iteration can't merge again this iteration".
  *
  * Determinism: the winning pair is argmax by (count DESC, x ASC, y ASC)
  * — total order, so the oracle replays training exactly with one
  * pair-count + argmax + replace CTE triple per iteration (the same
  * unrolling kmeansFixed uses). A literal '^' inside a corpus token would
  * make the representation ambiguous — both engines misparse it the SAME
  * way (oracle parity holds), but strip or remap the marker at ingest if
  * the corpus can contain it.
  *
  * Character-set contract: BMP text only. Java regex `(.)` matches UTF-16
  * code units, so a supplementary-plane character (emoji, rare CJK) is
  * split into its two surrogates while DuckDB's RE2 matches whole code
  * points — oracle parity breaks outside the BMP. Normalize or strip
  * supplementary characters at ingest if the corpus can contain them
  * (the '^' marker caveat above applies the same way). Within the BMP,
  * symbol-id assignment ([[encodeIds]]) sorts by UTF-8 bytes, which
  * equals code-point order — the collation DuckDB's ORDER BY uses.
  *
  * Scale shape: state is the DISTINCT-word table (vocab-sized, tiny
  * relative to the corpus — Heaps' law) weighted by corpus frequency, so
  * each iteration is a map over vocab rows + one map-side-combined
  * groupBy; the corpus itself is scanned once to build frequencies and
  * once to encode. The per-iteration argmax is a 1-row collect — the
  * same bounded driver round-trip as the k-means codebook.
  *
  * Iteration-count contract: each merge costs one Spark job over the
  * vocab table plus a 1-row collect, so `iters` IS the job count — sized
  * for analytic vocabularies (iters ≲ 100). Training a full 32k-merge
  * production vocab wants merge batching (apply all pairwise-disjoint
  * top pairs per round) or a specialized single-pass trainer; at that
  * point tokenizer training is a build artifact, not a query. */
object Bpe {

  /** (word, f) corpus frequency table over whitespace tokens. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.rawTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** Adjacent-symbol pair counts of the current representation,
    * corpus-frequency weighted: (x, y, c). */
  private def pairCounts(enc: DataFrame): DataFrame =
    enc.withColumn("ss", split(col("r"), "\\^"))
      .filter(size(col("ss")) >= 3) // [""] ++ symbols — need ≥2 symbols
      .select(col("f"), explode(expr(
        """transform(sequence(2, size(ss) - 1),
           i -> struct(element_at(ss, i) AS x, element_at(ss, i + 1) AS y))"""))
        .as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum("f").as("c"))

  /** '^'-prefixed single-character symbol split of the word column. */
  private def charInit(words: DataFrame): DataFrame =
    words.withColumn("r", regexp_replace(col("word"), "(.)", "\\^$1"))

  private def withNsym(enc: DataFrame): DataFrame =
    enc.withColumn("n_sym",
      (size(split(col("r"), "\\^")) - 1).cast("long"))

  /** Train `iters` merges (or until no adjacent pair remains — a corpus
    * of single-symbol words exhausts before `iters`); returns the vocab
    * table with the fully-merged representation: (word, f, r, n_sym). */
  def train(words: DataFrame, iters: Int): DataFrame = {
    var enc = charInit(words).cache()
    var it = 0
    var exhausted = false
    while (it < iters && !exhausted) {
      pairCounts(enc).orderBy(col("c").desc, col("x").asc, col("y").asc)
        .limit(1).collect().headOption match {
        case None => exhausted = true // every word is one symbol already
        case Some(best) =>
          val (x, y) = (best.getString(0), best.getString(1))
          val prev = enc
          // literal-args replace (not an expr string): corpus symbols can
          // contain quotes ("it's") that would break SQL-text interpolation
          enc = prev.withColumn("r",
            replace(col("r"), lit(s"^$x^$y"), lit(s"^$x$y"))).cache()
          enc.count()
          prev.unpersist()
      }
      it += 1
    }
    // vocab table ∝ distinct words: materialize, release the last
    // round's cache (the loop released every earlier round's)
    val out = withNsym(enc).localCheckpoint()
    enc.unpersist()
    out
  }

  /** Batched train — the job-count fix for production-sized vocabs
    * ([[train]]'s contract is iters ≲ 100 because every merge is one
    * Spark job): each ROUND counts pairs once, keeps up to `window` top
    * pairs whose symbols are disjoint from every higher-ranked
    * candidate, and applies the kept merges in rank order in ONE pass —
    * so a round costs what a single merge costs but performs ~window/2
    * merges of it.
    *
    * Fidelity trade, stated exactly: classic BPE recounts after every
    * merge; a batch reuses the round's counts for all its merges (the
    * standard concession parallel tokenizer trainers make). The keep
    * rule — symbols disjoint from every higher-ranked CANDIDATE, kept
    * or dropped — is deliberately non-recursive so an external engine
    * replays selection with one self-anti-join instead of a sequential
    * scan. The chained replace applies kept merges in rank order inside
    * the single pass, so later merges see earlier ones' text effects
    * (e.g. a freshly-formed symbol can feed a later kept pair) — that
    * order is part of the operator's definition and of its oracle.
    * With window = 1 every round keeps exactly the argmax: batched
    * training degenerates to [[train]] (pinned in OperatorsSpec). */
  def trainBatched(words: DataFrame, rounds: Int, window: Int): DataFrame = {
    require(rounds >= 1 && window >= 1, s"bad geometry rounds=$rounds window=$window")
    var enc = charInit(words).cache()
    var rd = 0
    var exhausted = false
    while (rd < rounds && !exhausted) {
      val cand = pairCounts(enc)
        .orderBy(col("c").desc, col("x").asc, col("y").asc)
        .limit(window).collect()
      if (cand.isEmpty) exhausted = true
      else {
        val kept = cand.indices.flatMap { i =>
          val (x, y) = (cand(i).getString(0), cand(i).getString(1))
          val clash = cand.take(i).exists { h =>
            val (hx, hy) = (h.getString(0), h.getString(1))
            hx == x || hx == y || hy == x || hy == y
          }
          if (clash) None else Some((x, y))
        }
        val prev = enc
        val merged = kept.foldLeft(col("r")) { case (acc, (x, y)) =>
          replace(acc, lit(s"^$x^$y"), lit(s"^$x$y"))
        }
        enc = prev.withColumn("r", merged).cache()
        enc.count()
        prev.unpersist()
      }
      rd += 1
    }
    val out = withNsym(enc).localCheckpoint()
    enc.unpersist()
    out
  }

  /** Encode: per-doc word and BPE-symbol counts through the trained
    * vocab — a broadcast-able join (the vocab table is tiny). */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.rawTokens(col(textCol))).as("word"))
      .join(broadcast(vocab.select("word", "n_sym")), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_bpe"))

  /** Encode to ACTUAL token ids — what a trainer consumes. Symbol id =
    * UTF-8-byte lexicographic rank in the final symbol set (= code-point
    * order, the collation DuckDB's ORDER BY uses — Scala's default
    * String ordering compares UTF-16 code units, which diverges on
    * supplementary-plane symbols); output is (doc_id, ids) with the
    * document's full id stream comma-joined in token order.
    *
    * Scale shape: the symbol set is alphabet + one symbol per merge —
    * collected once and shipped as a map literal; per-word id strings are
    * a map over the vocab table; documents broadcast-join the vocab and
    * re-assemble in order with one groupBy over (doc, position). */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.rawTokens(col(textCol))).as(Seq("pos", "word")))
      .join(broadcast(wordIdsTable(vocab)), "word")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("word_ids")))),
          x => x.getField("word_ids")), ",").as("ids"))

  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      if (x(i) != y(i)) return (x(i) & 0xff) < (y(i) & 0xff)
      i += 1
    }
    x.length < y.length
  }

  private val symArr = expr("filter(split(r, '\\\\^'), x -> x != '')")

  /** The trained symbol set in id order (UTF-8-byte rank — see
    * [[encodeIds]]): one bounded collect, alphabet + one symbol per
    * merge. */
  private def symbolSet(vocab: DataFrame): Array[String] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    vocab.select(explode(symArr).as("s"))
      .distinct().as[String].collect().sortWith(utf8Less)
  }

  /** (word, word_ids) — each vocab word's comma-joined symbol-id string
    * under the [[symbolSet]] id assignment. */
  def wordIdsTable(vocab: DataFrame): DataFrame = {
    val idMap = typedLit(symbolSet(vocab).zipWithIndex.toMap)
    vocab.select(col("word"),
      array_join(transform(symArr, s => element_at(idMap, s).cast("string")), ",")
        .as("word_ids"))
  }

  /** The round-trip that makes a tokenizer trustworthy:
    * decode(encode(word)) for every corpus token, through the id map
    * BOTH ways — encode via [[wordIdsTable]], decode via the inverse
    * id→symbol map — and the document reassembled in token order.
    * Returns (doc_id, text_rt, n_words, n_mismatch): text_rt must equal
    * the whitespace-normalized token stream and n_mismatch must be 0
    * whenever the id assignment is a true bijection (BMP contract —
    * see the object docstring); a colliding or dropped symbol id shows
    * up as a non-zero n_mismatch, which is exactly what this operator
    * exists to catch.
    *
    * Scale shape: identical to [[encodeIds]] — decode happens on the
    * vocab-sized word table BEFORE the broadcast join, so the per-token
    * work is one hash probe; the only wide op is the per-doc
    * reassembly groupBy. */
  def roundTrip(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val invMap = typedLit(symbolSet(vocab).zipWithIndex
      .map { case (s, i) => (i.toString, s) }.toMap)
    val decoded = wordIdsTable(vocab).withColumn("decoded",
      concat_ws("", transform(split(col("word_ids"), ","),
        i => element_at(invMap, i))))
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.rawTokens(col(textCol))).as(Seq("pos", "word")))
      .join(broadcast(decoded), "word")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("decoded")))),
          x => x.getField("decoded")), " ").as("text_rt"),
        count(lit(1)).cast("long").as("n_words"),
        sum(when(col("decoded") =!= col("word"), 1).otherwise(0))
          .cast("long").as("n_mismatch"))
  }
}
