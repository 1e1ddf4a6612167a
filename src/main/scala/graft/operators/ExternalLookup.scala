package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types.{StringType, StructType}

/** Lookup join against an external service (SURVEY.md §2.1 S12, §2.3
  * J10; reference contact_enrichment.py:189-268, api_clients.py fetchers).
  *
  * The reference fans out with a 3-thread pool and a 0.5 s/request sleep
  * (api_clients.py:118-119, app.py:419); the Spark restatement runs the
  * calls inside mapPartitions — executor parallelism replaces the thread
  * pool, and each partition paces itself with a token-interval so the
  * aggregate rate is bounded by partitions × (1/minIntervalMs). Retries
  * with progressive backoff mirror the 429 policy
  * (api_clients.py:132-146). Partition count IS the rate knob: at 1000
  * executors, repartition the key set down to the service budget first.
  */
object ExternalLookup {

  /** Append `lookup_value` (nullable string) by calling `fn` per row,
    * rate-limited per partition.
    *
    * @param fn external call — must be serializable and thread-safe
    * @param minIntervalMs minimum spacing between calls in one partition
    * @param maxRetries re-attempts on exception, with linear backoff
    */
  def lookupJoin(df: DataFrame, keyCol: String, fn: String => Option[String],
      minIntervalMs: Long = 0L, maxRetries: Int = 2): DataFrame = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val outSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("lookup_value", StringType, nullable = true))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      var lastCall = 0L
      it.map { r =>
        val wait = lastCall + minIntervalMs - System.currentTimeMillis()
        if (wait > 0) Thread.sleep(wait)
        lastCall = System.currentTimeMillis()
        var attempt = 0
        var result: Option[String] = None
        var done = false
        while (!done) {
          try { result = fn(r.getString(keyIdx)); done = true }
          catch {
            case e: Exception =>
              attempt += 1
              if (attempt > maxRetries) throw e
              Thread.sleep(minIntervalMs.max(1L) * attempt)
          }
        }
        Row.fromSeq(r.toSeq :+ result.orNull)
      }
    }
  }
}
