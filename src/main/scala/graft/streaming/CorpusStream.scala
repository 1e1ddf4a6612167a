package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.{Dedup, TextAnalysis}

/** The curation funnel as a CONTINUOUS ingest — Curation.stages for a
  * corpus that grows batch by batch (the reference's weekly harvest
  * loop, weekly_scheduler.py:253-425, upgraded from exact-key dedup to
  * the full curation semantics).
  *
  * Per micro-batch, in the same cheap-to-expensive order as the batch
  * funnel: row-local filters (language, quality) → within-batch exact
  * collapse (order-invariant fingerprint, lowest doc_id survives) →
  * exact check against the STORED corpus (fingerprint anti-join) →
  * near-dup check against the stored corpus
  * (Dedup.incrementalNearDups — candidates only across the
  * batch/corpus split, so per-batch cost scales with the batch) →
  * survivors appended. Append-only sink + deterministic survivor rule
  * means checkpoint replay of a batch adds nothing: each stage drops
  * redelivered rows against the rows their first delivery stored. */
object CorpusStream {

  final case class IngestStats(batch_id: Long, arrived: Long,
      dropped_filter: Long, dropped_exact: Long, dropped_near: Long,
      kept: Long)

  /** Curate one batch of (doc_id, text) against the corpus at
    * `corpusDir`, append survivors, return the funnel stats. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, corpusDir: String,
      batchId: Long, lang: String = "en", minQuality: Double = 0.0,
      threshold: Double = 0.5): IngestStats = {
    val arrived = batch.count()
    val clean = batch
      .filter(TextAnalysis.langId(col("text")) === lang &&
        TextAnalysis.qualityScore(col("text")) >= minQuality)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .cache()
    val nClean = clean.count()

    // within-batch exact collapse, then against the stored corpus: both
    // on the order-invariant fingerprint, lowest doc_id survives
    val wFp = Window.partitionBy("fp")
    val batchExact = clean
      .withColumn("keep_id", min("doc_id").over(wFp))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
    val fs = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(new org.apache.hadoop.fs.Path(corpusDir)))
        Some(spark.read.parquet(corpusDir).cache())
      else None
    val exact = existing match {
      case Some(ex) => batchExact.join(ex.select("fp"), Seq("fp"), "left_anti")
      case None => batchExact
    }
    val exactKept = exact.cache()
    val nExact = exactKept.count()

    // near-dup: batch survivors vs the stored corpus only — existing ×
    // existing pairs were settled when those docs were ingested
    val kept = existing match {
      case Some(ex) =>
        val losers = Dedup.incrementalNearDups(ex, exactKept,
            "doc_id", "text", threshold = threshold)
          .select(col("new_id").as("doc_id")).distinct()
        exactKept.join(losers, Seq("doc_id"), "left_anti")
      case None => exactKept
    }
    val keptC = kept.cache()
    val nKept = keptC.count()
    keptC.select("doc_id", "text", "fp")
      .write.mode(SaveMode.Append).parquet(corpusDir)

    Seq(clean, exactKept, keptC).foreach(_.unpersist())
    existing.foreach(_.unpersist())
    IngestStats(batchId, arrived, arrived - nClean, nClean - nExact,
      nExact - nKept, nKept)
  }

  /** Streaming writer: drain a (doc_id, text) stream through the funnel
    * into `corpusDir`. Caller starts it with its own checkpoint/trigger;
    * `onStats` receives each batch's funnel record (the T5 stats sink). */
  def writer(stream: DataFrame, corpusDir: String,
      lang: String = "en", minQuality: Double = 0.0,
      threshold: Double = 0.5,
      onStats: IngestStats => Unit = _ => ()): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          onStats(ingestBatch(batch.sparkSession, batch, corpusDir, id,
            lang, minQuality, threshold))
      }
}
