package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Audio

/** LIVE snippet identification against the stored fingerprint index —
  * the streaming member of the audio family (the Shazam serving loop:
  * the library index is built at ingest, queries arrive as a stream).
  *
  * Shape: the constellation extraction runs as the per-record KERNEL
  * form ([[Audio.fingerprintsKernel]] — lag/lead windows don't exist
  * on an unbounded stream, a map kernel runs on one unchanged), and
  * each micro-batch's fingerprints resolve through the same
  * [[Audio.lookupStored]] argmax the batch queries use — identical
  * match semantics per batch IS the contract, like the text family's
  * live index ingest. foreachBatch rather than a streaming aggregate:
  * the histogram + argmax groups by (query, candidate, offset), and a
  * snippet's fingerprints all arrive IN ITS OWN RECORD, so per-batch
  * resolution is complete-by-construction — no watermark, no
  * cross-batch state to carry. */
object AudioMatchStream {

  /** Start matching `mediaStream` (a streaming MediaRow frame) against
    * the index under `tag`; each resolved micro-batch is handed to
    * `onMatches` as (query_id, matched_doc, offset, n_matches). */
  def start(spark: SparkSession, mediaStream: DataFrame, tag: String,
      minMatches: Int, checkpoint: String)(
      onMatches: DataFrame => Unit): StreamingQuery =
    mediaStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onMatches(Audio.lookupStored(spark,
          Audio.fingerprintsKernel(spark, batch), tag, minMatches))
      }
      .start()
}
