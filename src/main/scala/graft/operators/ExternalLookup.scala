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
  * pool, and each partition paces itself with a [[TokenBucket]] so the
  * aggregate rate is bounded by partitions × callsPerSec. Retries honor
  * the service's Retry-After on 429 ([[RetryAfter]]) and back off
  * linearly on transport faults, mirroring api_clients.py:132-146.
  * Partition count IS the fleet-wide rate knob: at 1000 executors,
  * repartition the key set down to the service budget first.
  */
object ExternalLookup {

  /** Service said "slow down": the 429 contract. `retryAfterMs` is the
    * server-specified delay (the `Retry-After` header) — honored verbatim
    * instead of the local backoff schedule (api_clients.py:132-139 sleeps
    * exactly what the service asks). */
  final case class RetryAfter(retryAfterMs: Long)
    extends RuntimeException(s"retry after ${retryAfterMs}ms")

  /** Serializable token bucket: `capacity` tokens of burst, refilled at
    * `refillPerSec`. One instance per PARTITION (it rides inside the
    * mapPartitions closure), so the aggregate budget is
    * partitions × refillPerSec — partition count stays the fleet-wide
    * rate knob, but within a partition bursts are absorbed instead of
    * hard-spaced (a fixed inter-call sleep wastes the budget a bursty
    * service window would have allowed). */
  final class TokenBucket(capacity: Double, refillPerSec: Double,
      clockMs: () => Long = () => System.currentTimeMillis())
      extends Serializable {
    require(capacity >= 1 && refillPerSec > 0)
    private var tokens = capacity
    private var last = clockMs()
    private def refill(): Unit = {
      val now = clockMs()
      tokens = math.min(capacity, tokens + (now - last) * refillPerSec / 1000.0)
      last = now
    }
    /** Milliseconds the caller must wait before the call may proceed —
      * 0 when a token is available now. Consumes the token. */
    def acquireDelayMs(): Long = synchronized {
      refill()
      if (tokens >= 1.0) { tokens -= 1.0; 0L }
      else {
        val waitMs = math.ceil((1.0 - tokens) * 1000.0 / refillPerSec).toLong
        tokens -= 1.0 // the token being waited for
        waitMs
      }
    }
  }

  /** Append `lookup_value` (nullable string) by calling `fn` per row,
    * token-bucket rate-limited per partition.
    *
    * Retry policy mirrors the reference 429 handling
    * (api_clients.py:132-146): a [[RetryAfter]] from `fn` sleeps the
    * service-specified delay WITHOUT consuming a retry attempt budget
    * beyond `maxRetries` total; any other exception backs off linearly.
    * The honored delay is capped at `maxRetryAfterMs` — the reference
    * bounds it the same way (api_clients.py: min(int(retry_after), 10)),
    * because a buggy or hostile service returning a huge Retry-After
    * would otherwise stall an executor task (and its whole stage)
    * indefinitely.
    *
    * @param fn external call — must be serializable and thread-safe
    * @param callsPerSec sustained per-partition budget (burst = `burst`)
    * @param maxRetries re-attempts on failure
    * @param maxRetryAfterMs upper bound on a single honored Retry-After
    */
  def lookupJoin(df: DataFrame, keyCol: String, fn: String => Option[String],
      callsPerSec: Double = 1000.0, burst: Double = 10.0,
      maxRetries: Int = 2, maxRetryAfterMs: Long = 10000L): DataFrame = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val outSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("lookup_value", StringType, nullable = true))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      val bucket = new TokenBucket(burst, callsPerSec)
      it.map { r =>
        var attempt = 0
        var result: Option[String] = None
        var done = false
        while (!done) {
          val d = bucket.acquireDelayMs()
          if (d > 0) Thread.sleep(d)
          try { result = fn(r.getString(keyIdx)); done = true }
          catch {
            case RetryAfter(ms) =>
              attempt += 1
              if (attempt > maxRetries) throw RetryAfter(ms)
              // the service's number, not ours — but bounded (a rogue
              // Retry-After must not pin a task forever)
              Thread.sleep(math.min(math.max(ms, 0L), maxRetryAfterMs))
            case e: Exception =>
              attempt += 1
              if (attempt > maxRetries) throw e
              Thread.sleep(50L * attempt)
          }
        }
        Row.fromSeq(r.toSeq :+ result.orNull)
      }
    }
  }
}
