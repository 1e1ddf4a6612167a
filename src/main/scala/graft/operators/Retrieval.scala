package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over an inverted-index shape — the keyword
  * half of a corpus-curation / retrieval stack (the reference's search
  * screens rank hits by relevance server-side; reference:
  * DatabaseConverter/api_clients.py search bodies). Okapi BM25
  * (Robertson & Walker 1994) with the standard k1/b parameterization.
  *
  * Exactness strategy (same family as txt_tfidf / txt_bigram_score): no
  * transcendental functions anywhere. The classic idf uses ln(); rank
  * order does not need it for fixed query terms, so we keep the raw
  * Robertson–Spärck Jones odds ratio as an exact rational,
  * (N − df + ½)/(df + ½) = (2N − 2df + 1)/(2df + 1) — integer-valued
  * numerator and denominator, one IEEE double division that both Spark
  * and DuckDB evaluate bit-identically. Each per-term contribution is
  * then floored into 1e-6 fixed point BEFORE summation, so the per-doc
  * score is an exact BIGINT sum — invariant to aggregation order across
  * partitions and engines.
  *
  * Scale shape: the postings build is ONE map-side-combined shuffle
  * keyed (doc, term) — the inverted index. Query terms broadcast; df
  * re-aggregates only the matched postings (a per-term count, tiny);
  * corpus stats are a 1-row broadcast. The final top-k per query uses
  * the partial TopK aggregator, so a query matching half the corpus
  * still caps shuffle volume at queries×k — no window ever holds a
  * query's full posting list on one task.
  */
object Retrieval {

  /** BM25 constants — baked into both the plan and the generated oracle
    * SQL (always emitted as CAST(.. AS DOUBLE): DuckDB parses bare
    * decimal literals as DECIMAL and would do decimal, not double,
    * arithmetic). */
  val K1 = 1.2
  val B = 0.75
  val ScoreScale = 1000000L

  /** Inverted-index postings: one row per (doc, term) with the term
    * frequency and the document's token length. One shuffle, partially
    * aggregated map-side; dl rides along as max() since it is constant
    * per doc. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.rawTokens(col(textCol))
    docs
      .select(col(idCol), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
  }

  /** 1-row corpus stats frame; avgdl = exact-integer sum /
    * exact-integer count, a single double division. */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame = {
    val toks = TextAnalysis.rawTokens(col(textCol))
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("sum_dl"))
  }

  /** Top-k docs per query by BM25. `queries` is the (queryId, terms)
    * batch — a handful of rows, broadcast. Output: one row per
    * (query_id, rank) with the doc, its fixed-point score, and how many
    * query terms matched.
    *
    * The postings are cached: the scoring plan references them three
    * times (match pruning, df, stats), and uncached each reference
    * re-tokenizes the whole corpus — measured 3.1 s → ~1 s at
    * sf0.1. Stats derive FROM the postings (count/sum over one row per
    * doc — `split` emits the empty-string token for empty text on both
    * engines, so no doc ever lacks postings and the derivation is
    * exactly [[corpusStats]]). The per-batch-rebuild path is the
    * baseline; real serving is [[bm25TopKStored]]. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    val post = postings(docs, idCol, textCol).cache()
    val stats = post.groupBy(col(idCol)).agg(max("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    bm25Serve(post, stats, idCol, queries, k)
  }

  /** [[bm25TopK]] against an ALREADY-BUILT index: score a query batch
    * from a postings table + 1-row stats frame. This is the serving
    * half — index once, query many; nothing here touches document
    * text. */
  def bm25Serve(post: DataFrame, stats: DataFrame, idCol: String,
      queries: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    val spark = post.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "term")
    // Matched postings only: the broadcast semi-join prunes the index
    // to query terms before any further aggregation.
    val matched = post.join(
      broadcast(qterms.select("term").distinct()), "term")
    // df per term counts over ALL documents (postings are unique per
    // (doc, term)), computed after the prune so only query terms pay.
    val dfreq = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf =
      (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)).cast("double") /
        (lit(2L) * col("df") + lit(1L)).cast("double")
    val tfnorm = (col("tf").cast("double") * lit(K1 + 1.0)) /
      (col("tf").cast("double") +
        lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / avgdl))
    val contrib =
      floor(lit(ScoreScale.toDouble) * idf * tfnorm).cast("long")
    val scored = matched
      .join(broadcast(dfreq), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol),
        contrib.as("contrib"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("contrib").as("score_fp"))
    // Partial top-k: shuffle volume is queries×k however skewed the
    // match distribution is. score_fp < ~1e10 « 2^53, so the double
    // round-trip through the aggregator is exact.
    val topk = TopK.topK(k)
    scored
      .groupBy("query_id")
      .agg(topk(col("score_fp").cast("double"), col(idCol)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.score").cast("long").as("score_fp"))
  }

  /** [[bm25TopK]] with the index MATERIALIZED: the postings land once
    * as a term-bucketed stored table (plus the 1-row stats table), and
    * every query batch after the first serves purely from the store —
    * the `docs` thunk is never forced again (same stored-table contract
    * as Dedup.incrementalNearDupsStored). At 100 TB this is the only
    * sane shape: tokenizing the corpus is the dominant cost and is paid
    * exactly once per index build, not per query. */
  def bm25TopKStored(spark: org.apache.spark.sql.SparkSession,
      docs: => DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int, tag: String,
      buckets: Int = 8): DataFrame = {
    val postTable = s"g_bm25_post_$tag"
    val statsTable = s"g_bm25_stats_$tag"
    val base = s"${graft.sources.Bucketing.processRoot}/bm25_$tag"
    graft.sources.Bucketing.ensureOnce(s"bm25@$tag#$buckets") {
      // the ONLY place the corpus is read: one forced pass feeds both
      // stored tables
      val d = docs.cache()
      graft.sources.Bucketing.writeBucketed(
        postings(d, idCol, textCol), postTable, s"$base/post",
        "term", buckets)
      corpusStats(d, textCol).write
        .option("path", s"$base/stats").mode("overwrite")
        .format("parquet").saveAsTable(statsTable)
      d.unpersist()
    }
    bm25Serve(spark.table(postTable), spark.table(statsTable),
      idCol, queries, k)
  }

  /** The INGEST half of the live index: append a document batch's
    * postings to the stored table (same bucket spec — reads stay
    * term-bucketed) and roll the batch's token counts into the stats
    * row. After this, [[bm25TopKStored]] serves WITH the new docs: df,
    * n_docs, and avgdl all reflect the append, so results equal a full
    * rebuild over the grown corpus (pinned in OperatorsSpec). Together
    * with bm25TopKStored this is the index-maintenance cycle a live
    * search tier runs per ingest batch — tokenize the BATCH, never the
    * corpus.
    *
    * The stats update is a driver-side read-modify-write of ONE row —
    * bounded by construction. Caller contract (same as the dedup
    * store): a doc id is appended at most once; re-sending a batch
    * double-counts it. */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String, tag: String,
      buckets: Int = 8): Unit = {
    val postTable = s"g_bm25_post_$tag"
    val statsTable = s"g_bm25_stats_$tag"
    require(spark.catalog.tableExists(postTable) &&
        spark.catalog.tableExists(statsTable),
      s"index '$tag' must be initialized by bm25TopKStored first")
    val b = batch.cache()
    postings(b, idCol, textCol).write.mode("append")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(postTable)
    val add = corpusStats(b, textCol).collect().head
    b.unpersist()
    // 1-row read-modify-write; the row is collected BEFORE the
    // overwrite, and the location is derived from the tag exactly as
    // the build derived it
    val cur = spark.table(statsTable).collect().head
    import spark.implicits._
    Seq((cur.getLong(0) + add.getLong(0), cur.getLong(1) + add.getLong(1)))
      .toDF("n_docs", "sum_dl")
      .write.mode("overwrite")
      .option("path", s"${graft.sources.Bucketing.processRoot}/bm25_$tag/stats")
      .format("parquet").saveAsTable(statsTable)
    // invalidate cached relations/file listings in EVERY session sharing
    // the catalog: a foreachBatch append runs in a micro-batch session
    // clone, and without this the outer session kept serving the
    // pre-append listing (observed: df from a fraction of the corpus)
    spark.catalog.refreshTable(postTable)
    spark.catalog.refreshTable(statsTable)
  }

  /** RRF constants — Cormack et al. 2009's k=60, and a 1e9 fixed-point
    * scale so every reciprocal is an exact integer division. */
  val RrfK = 60L
  val RrfScale = 1000000000L

  /** Reciprocal-rank fusion of two rankings — hybrid retrieval's
    * standard combiner (Cormack, Clarke & Buettcher 2009): documents
    * found by BOTH a sparse (BM25) and a dense (embedding) ranker beat
    * documents found by one. Score = Σ_r SCALE div (60 + rank_r), an
    * integer per list entry, so the fused score is an exact BIGINT sum
    * no matter which engine or order computes it — no min-max score
    * normalization (the reason RRF wins in practice: ranks compose
    * across scorers whose scores don't). Inputs: (query_id, id, rank)
    * each; an id absent from one list contributes 0 from it. Output
    * top-k per query via the partial TopK aggregator. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val l = a.select(col("query_id"), col("id"),
      col("rank").cast("long").as("rank_a"))
    val r = b.select(col("query_id"), col("id"),
      col("rank").cast("long").as("rank_b"))
    val fused = l.join(r, Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"),
        (coalesce(expr(s"$RrfScale div ($RrfK + rank_a)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($RrfK + rank_b)"), lit(0L)))
          .as("rrf_fp"))
    val topk = TopK.topK(k)
    fused.groupBy("query_id")
      .agg(topk(col("rrf_fp").cast("double"), col("id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"),
        col("col.score").cast("long").as("rrf_fp"))
  }

  /** [[appendToIndex]] made REDELIVERY-PROOF: drop batch docs whose id
    * the index already holds (one anti-join against the stored doc
    * ids), then append the remainder. This is the foreachBatch body for
    * a live-indexing stream — an at-least-once source can re-send a
    * batch and the index neither double-counts postings nor inflates
    * the stats (the StreamingSpec twin pins it). */
  def ingestNewDocs(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String, tag: String,
      buckets: Int = 8): Unit = {
    val known = spark.table(s"g_bm25_post_$tag").select(col(idCol)).distinct()
    // localCheckpoint (eager), NOT cache: the anti-join reads the very
    // table the append below mutates, and a lazily-cached plan re-reads
    // the POST-append file listing for any partition the guard didn't
    // materialize — the batch's own rows then look "known" and vanish
    // mid-ingest (observed as a null stats sum). Truncating the lineage
    // pins the pre-append snapshot.
    val fresh = batch.join(known, Seq(idCol), "left_anti").localCheckpoint()
    if (fresh.limit(1).count() > 0)
      appendToIndex(spark, fresh, idCol, textCol, tag, buckets)
  }

  /** The [[bm25TopK]] oracle as a reusable CTE chain (final CTE
    * `bm25_ranked(query_id, doc_id, score_fp, rank)` holds ALL ranked
    * matches — callers apply their own rank cutoff). `docWhere` filters
    * the corpus (e.g. "WHERE doc_id >= 10"); generated from the same
    * constants as the Spark plan so the two can never drift. */
  def bm25Ctes(queries: Seq[(Long, Seq[String])],
      docWhere: String = ""): String = {
    val qrows = queries
      .flatMap { case (qid, ts) =>
        ts.map(t => s"(CAST($qid AS BIGINT), '$t')")
      }
      .mkString(", ")
    s"""q(query_id, term) AS (VALUES $qrows),
      corpus AS (SELECT * FROM documents $docWhere),
      toks AS (
        SELECT doc_id,
          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM corpus),
      dl AS (
        SELECT doc_id,
          len(string_split_regex(lower(trim(text)), '\\s+')) AS dl
        FROM corpus),
      post AS (
        SELECT t.doc_id, t.term, count(*) AS tf, max(d.dl) AS dl
        FROM toks t JOIN dl d USING (doc_id)
        WHERE t.term IN (SELECT DISTINCT term FROM q)
        GROUP BY 1, 2),
      stats AS (
        SELECT count(*) AS n_docs,
          sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS sum_dl
        FROM corpus),
      dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      contrib AS (
        SELECT q.query_id, p.doc_id,
          CAST(floor(CAST($ScoreScale AS DOUBLE)
            * (CAST(2 * s.n_docs - 2 * f.df + 1 AS DOUBLE)
               / CAST(2 * f.df + 1 AS DOUBLE))
            * ((CAST(p.tf AS DOUBLE) * CAST(${K1 + 1.0} AS DOUBLE))
               / (CAST(p.tf AS DOUBLE)
                  + CAST($K1 AS DOUBLE)
                    * (CAST(${1.0 - B} AS DOUBLE)
                       + CAST($B AS DOUBLE) * CAST(p.dl AS DOUBLE)
                         / (CAST(s.sum_dl AS DOUBLE)
                            / CAST(s.n_docs AS DOUBLE)))))) AS BIGINT)
            AS contrib
        FROM post p JOIN dfreq f USING (term) JOIN q USING (term), stats s),
      bm25_scored AS (
        SELECT query_id, doc_id, CAST(sum(contrib) AS BIGINT) AS score_fp
        FROM contrib GROUP BY 1, 2),
      bm25_ranked AS (
        SELECT query_id, doc_id, score_fp,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score_fp DESC, doc_id) AS BIGINT) AS rank
        FROM bm25_scored)"""
  }

  /** Oracle SQL for [[bm25TopK]] over `documents`, generated from the
    * same constants so the two can never drift. */
  def bm25OracleSql(queries: Seq[(Long, Seq[String])], k: Int): String =
    s"""WITH ${bm25Ctes(queries)}
      SELECT query_id, rank, doc_id, score_fp FROM bm25_ranked
      WHERE rank <= $k"""
}
