package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STORED ANN serving index — the vector half of the serving story the
  * retrieval stack already has (BM25: Retrieval; phrase: PhraseIndex).
  * [[Similarity.ivfMultiprobeTopK]] re-assigns every candidate vector to
  * its cells on EVERY query batch; at 100 TB that per-batch corpus pass
  * is the cost a vector service cannot pay, so the IVF layout is
  * materialized once and served many times:
  *
  *  - centroids: the small coarse-quantizer table (one row per cell),
  *    broadcast at serve time;
  *  - postings: (cell, cand_id, cv, gen) with each vector replicated
  *    into its `spill` nearest cells (the SPANN boundary-duplication
  *    trade, Chen et al. 2021), written BUCKETED BY cell — a probe is a
  *    bucket-pruned read, never a corpus shuffle;
  *  - tombstones: (cand_id, upto_gen) retract a vector's postings up to
  *    that generation — merge-on-read, broadcast at serve, physically
  *    dropped by [[compactIndex]]'s atomic era swap ([[IndexStore]]).
  *
  * Append uses the STORED centroids — the geometry is frozen between
  * rebuilds (exactly how IVF services run: assignment must match the
  * layout on disk; re-clustering is a compaction-time decision, not an
  * ingest-time one). That frozen geometry is also what makes the
  * lifecycle oracle-able: as long as the build set contains every
  * centroid id, serve-after-append/delete equals the from-scratch
  * computation over the surviving corpus, row for row.
  *
  * Citations: reference repo has no vector serving at all (its search is
  * the ES bool-query client, api_clients.py:677-728) — this is part of
  * the beyond-reference training-data surface. */
object AnnIndex {

  private def postTable(tag: String) = s"g_ann_post_$tag"
  private def centTable(tag: String) = s"g_ann_cent_$tag"
  private def tombTable(tag: String) = s"g_ann_tomb_$tag"
  private def metaTable(tag: String) = s"g_ann_meta_$tag"
  private def indexBase(tag: String) =
    s"${graft.sources.Bucketing.processRoot}/ann_$tag"

  private def centDir(base: String, era: Long) = s"$base/cent_e$era"
  private def metaDir(base: String, era: Long) = s"$base/meta_e$era"

  private def registerTables(spark: org.apache.spark.sql.SparkSession,
      tag: String, era: Long, buckets: Int): Unit = {
    val base = indexBase(tag)
    IndexStore.registerBucketed(spark, postTable(tag),
      IndexStore.postDir(base, era), "cell", buckets)
    IndexStore.registerParquet(spark, centTable(tag), centDir(base, era))
    IndexStore.registerParquet(spark, tombTable(tag),
      IndexStore.tombDir(base, era))
    IndexStore.registerParquet(spark, metaTable(tag), metaDir(base, era))
  }

  /** Recover an index built by a previous session (or after a crash):
    * re-derive the catalog entries from the newest COMMITTED era's
    * directories — markers are the only truth, so a crash mid-compaction
    * (era N+1 staged, no marker) recovers to the complete era N. */
  def openIndex(spark: org.apache.spark.sql.SparkSession, tag: String,
      buckets: Int = 8): Unit = {
    val era = IndexStore.readEra(spark, indexBase(tag)).getOrElse(
      sys.error(s"ANN index '$tag' has no committed era"))
    registerTables(spark, tag, era, buckets)
  }

  /** Cell assignment against a given centroid table: each row of `df`
    * lands in its `keep` highest-cosine cells (ties to the smaller
    * cell id — total order, oracle-replayable). */
  private def assignCells(cents: DataFrame, df: DataFrame, id: String,
      v: String, keep: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(id).orderBy(col("cos_c").desc, col("cent_id"))
    df.crossJoin(broadcast(cents))
      .withColumn("cos_c", Similarity.cosine(col(v), col("cent_v")))
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= keep)
      .select(col(id), col(v), col("cent_id").as("cell"))
  }

  /** Build once per (tag, geometry): centroids = the id-stride coarse
    * quantizer over the build corpus, postings spill-replicated and
    * bucketed by cell, empty tombstones, gen-0 meta — staged under era
    * 0, committed with one marker create. */
  def buildIndex(spark: org.apache.spark.sql.SparkSession,
      candidates: => DataFrame, idCol: String, vecCol: String, tag: String,
      seedStride: Int, spill: Int, buckets: Int = 8): Unit =
    graft.sources.Bucketing.ensureOnce(s"ann@$tag#$seedStride#$spill#$buckets") {
      val base = indexBase(tag)
      val c = candidates.select(col(idCol).as("cand_id"),
        col(vecCol).as("cv")).cache()
      val cents = c.filter(col("cand_id") % seedStride === 0)
        .select(col("cand_id").as("cent_id"), col("cv").as("cent_v"))
      IndexStore.stagePlain(cents, centDir(base, 0L))
      val post = assignCells(cents, c, "cand_id", "cv", keep = spill)
        .select(col("cell"), col("cand_id"), col("cv"), lit(0L).as("gen"))
      IndexStore.stageBucketed(post, IndexStore.postDir(base, 0L),
        "cell", buckets)
      IndexStore.stagePlain(
        post.select(col("cand_id"), col("gen").as("upto_gen")).limit(0),
        IndexStore.tombDir(base, 0L))
      IndexStore.stagePlain(
        spark.range(1).select(lit(0L).as("gen")), metaDir(base, 0L))
      c.unpersist()
      IndexStore.commitEra(spark, base, 0L)
      registerTables(spark, tag, 0L, buckets)
    }

  /** Live postings through the tombstones: a posting row serves unless
    * a tombstone covers its generation. Tombstone side broadcast —
    * bounded by deletes since compaction. */
  private def livePostings(spark: org.apache.spark.sql.SparkSession,
      tag: String): DataFrame = {
    val post = spark.table(postTable(tag))
    val tomb = spark.table(tombTable(tag))
      .groupBy("cand_id").agg(max("upto_gen").as("upto_gen"))
    post.join(broadcast(tomb), Seq("cand_id"), "left_outer")
      .filter(col("upto_gen").isNull || col("gen") > col("upto_gen"))
      .select("cell", "cand_id", "cv", "gen")
  }

  /** Serve a query batch from the stored index: queries assign to their
    * `nprobe` cells against the broadcast centroid table, probe the
    * cell-bucketed postings with one equi-join, dedupe spill collisions,
    * exact-rerank, top-k. The corpus is never re-assigned. */
  def serveTopK(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int, tag: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(spark.catalog.tableExists(postTable(tag)),
      s"ANN index '$tag' must be built/opened first")
    val cents = spark.table(centTable(tag))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cellQ = assignCells(cents, q, "query_id", "qv", keep = nprobe)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    // ONE postings pass: the probe join carries cv along, and the spill
    // dedup keeps any replica (they are byte-identical per cand_id)
    livePostings(spark, tag)
      .join(broadcast(cellQ.select("cell", "query_id", "qv")), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .dropDuplicates("query_id", "cand_id")
      .withColumn("cos", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cos")
  }

  /** Ingest a batch: assign against the STORED centroids (frozen
    * geometry — see object doc), append postings at the next
    * generation. Re-added ids out-generation their tombstones, so a
    * delete→re-add cycle serves the new vector.
    *
    * Crash window, stated honestly: the meta generation is written
    * in-place AFTER the postings append (the BM25 stats shape). A crash
    * between the two leaves gen stale, so the NEXT append reuses the
    * generation number for a different batch — results stay correct
    * (serving filters on gen STRICTLY greater than a tombstone's
    * upto_gen, and tombstones are cut from live rows), but the
    * generation audit trail blurs; unlike BM25 there is no restateable
    * stats row to repair, because the index keeps no corpus stats. */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, vecCol: String, tag: String,
      spill: Int, buckets: Int = 8): Unit = {
    require(spark.catalog.tableExists(postTable(tag)),
      s"ANN index '$tag' must be built/opened first")
    val gen = spark.table(metaTable(tag)).collect().head.getLong(0) + 1
    val cents = spark.table(centTable(tag))
    val post = assignCells(cents,
        batch.select(col(idCol).as("cand_id"), col(vecCol).as("cv")),
        "cand_id", "cv", keep = spill)
      .select(col("cell"), col("cand_id"), col("cv"), lit(gen).as("gen"))
    post.write.mode("append").bucketBy(buckets, "cell").sortBy("cell")
      .format("parquet").saveAsTable(postTable(tag))
    IndexStore.stagePlain(spark.range(1).select(lit(gen).as("gen")),
      metaDir(indexBase(tag), IndexStore.readEra(spark, indexBase(tag)).get))
    spark.catalog.refreshTable(postTable(tag))
    spark.catalog.refreshTable(metaTable(tag))
  }

  /** Streaming-ingest guard (the foreachBatch body, mirroring
    * Retrieval.ingestNewDocs): drop vectors the index already holds —
    * at-least-once redelivery — and intra-batch duplicates, then append
    * the remainder. The known-ids anti-join reads the table the append
    * mutates, so the fresh set is pinned with a localCheckpoint (the
    * lazily-cached variant re-reads the post-append listing and eats
    * the batch — the bug Retrieval documents). Tombstoned ids count as
    * known: an intentional re-add is an upsert decision, not an ingest
    * side-effect. */
  def ingestNewVectors(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, vecCol: String, tag: String,
      spill: Int, buckets: Int = 8): Unit = {
    val known = spark.table(postTable(tag))
      .select(col("cand_id").as(idCol)).distinct()
    val fresh = batch.dropDuplicates(Seq(idCol))
      .join(known, Seq(idCol), "left_anti").localCheckpoint()
    if (fresh.limit(1).count() > 0)
      appendToIndex(spark, fresh, idCol, vecCol, tag, spill, buckets)
  }

  /** Retract ids: tombstone each doomed vector at its CURRENT live
    * generation (computed from the pre-delete snapshot, pinned with a
    * localCheckpoint because the tombstone table is about to grow).
    * The serve-time broadcast bound is enforced the Retrieval way:
    * past `maxTombstones`, auto-compact. */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession,
      ids: DataFrame, idCol: String, tag: String,
      maxTombstones: Long = Retrieval.DefaultMaxTombstones,
      buckets: Int = 8): Unit = {
    require(spark.catalog.tableExists(postTable(tag)),
      s"ANN index '$tag' must be built/opened first")
    val doomed = livePostings(spark, tag)
      .join(ids.select(col(idCol).as("cand_id")).distinct(), Seq("cand_id"))
      .groupBy("cand_id").agg(max("gen").as("upto_gen"))
      .localCheckpoint()
    if (doomed.limit(1).count() > 0) {
      doomed.write.mode("append").format("parquet")
        .saveAsTable(tombTable(tag))
      spark.catalog.refreshTable(tombTable(tag))
      if (spark.table(tombTable(tag)).count() > maxTombstones)
        compactIndex(spark, tag, buckets)
    }
  }

  /** Physically drop tombstoned postings: stage the filtered postings,
    * centroids, empty tombstones, and meta under era N+1, commit with
    * one marker create, re-register — a crash mid-compaction leaves era
    * N complete and servable (the IndexStore contract). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, tag: String,
      buckets: Int = 8): Unit = {
    val base = indexBase(tag)
    val era = IndexStore.readEra(spark, base).get
    val next = era + 1
    val live = livePostings(spark, tag).localCheckpoint()
    val gen = spark.table(metaTable(tag)).collect().head.getLong(0)
    IndexStore.stageBucketed(live, IndexStore.postDir(base, next),
      "cell", buckets)
    IndexStore.stagePlain(spark.table(centTable(tag)), centDir(base, next))
    IndexStore.stagePlain(
      live.select(col("cand_id"), col("gen").as("upto_gen")).limit(0),
      IndexStore.tombDir(base, next))
    IndexStore.stagePlain(spark.range(1).select(lit(gen).as("gen")),
      metaDir(base, next))
    IndexStore.commitEra(spark, base, next)
    registerTables(spark, tag, next, buckets)
  }
}
