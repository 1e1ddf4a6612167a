package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.ApplicantPipeline
import graft.sources.TableStore

/** T6 — the webhook applicant stream drained into the catalog through the
  * SAME composed pipeline as the batch path (reference
  * webhook_handler.py:56-128 per-request → here per micro-batch).
  *
  * foreachBatch + runWithStore: each micro-batch is validated, normalized,
  * deduped, matched, and merged on business keys. Because every persist
  * step is an idempotent business-key merge, redelivered rows (webhook
  * retries, checkpoint replay after crash) change nothing — the streaming
  * path inherits exactly-once table state from the batch semantics
  * without any extra bookkeeping. */
object ApplicantStream {

  /** Wire a raw applicant stream (ordinalCol/prefCol/nameCol columns)
    * into `store`. Caller starts the returned writer with its own
    * checkpointLocation/trigger. */
  def writer(store: TableStore, stream: DataFrame,
      ordinalCol: String, prefCol: String, nameCol: String,
      borough: String, companies: DataFrame,
      minConfidence: Double = 0.7, topK: Int = 3,
      commonTokens: Seq[String] = Nil): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // unpersist per batch: the pipeline caches its hot stages, and a
          // long-lived stream would otherwise accrete one cache per batch
          ApplicantPipeline.runWithStore(store, batch,
            ordinalCol, prefCol, nameCol, borough, companies,
            minConfidence, topK, commonTokens).unpersist()
          ()
        }
      }
}
