package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Merge

/** One event as fed by the webhook/scheduler sources (SURVEY.md §2.10). */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user running state for the stateful connection tracker (T6-shape:
  * webhook events folded into per-entity status). */
final case class UserState(user_id: Long, n_events: Long, total_value: Double,
    last_type: String, last_ts: java.sql.Timestamp)

/** One open per-user session held in the state store. */
final case class OpenSession(start: java.sql.Timestamp,
    end: java.sql.Timestamp, n: Long)

/** A session emitted once closed (by gap or by event-time timeout). */
final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

/** Structured-Streaming restatement of the reference's incremental
  * semantics (weekly_scheduler.py / webhook_handler.py):
  *
  *  - T2/T7: event-time windowed rollups with watermarks
  *  - T3/U3: exactly-once-per-key ingest via stream-static anti-join
  *  - T5/T6: foreachBatch merge into a keyed sink table
  *  - stateful per-key tracking via mapGroupsWithState
  *
  * Every transform takes/returns DataFrames so the same code runs on a
  * batch frame (Trigger.AvailableNow shape) or a readStream source. At
  * cluster scale, state stores partition by the group key and watermarks
  * bound state size — nothing here holds unbounded driver state.
  */
object EventPipeline {

  /** T7: tumbling event-time daily rollup with a watermark bounding
    * late-data state (automation_monitoring.py:237-292). */
  def dailyRollup(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"),
        col("sum_value"))

  /** T12: hopping (sliding) event-time rollup — 1 h windows every
    * 30 min, each event in 2 overlapping windows; watermark bounds the
    * number of open windows to (watermark + length) / slide per type. */
  def hoppingRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** T3: drop events whose business key already exists in the sink
    * (stream-static anti-join; weekly_scheduler.py:586-609). */
  def newOnly(incoming: DataFrame, existing: DataFrame): DataFrame =
    Merge.newOnly(incoming, existing, Seq("event_id"))

  /** Malformed-payload QUARANTINE split — the reference's
    * validate-or-400 gate (webhook_handler.py rejects bad payloads at
    * the door) restated as a dataflow fork: raw JSON payload lines
    * parse against the Event schema; rows that fail to parse or lack a
    * required field route to the quarantine channel with a reason,
    * never poisoning the typed stream. Both branches are pure row-local
    * transforms, so the same split runs on a readStream source
    * (dead-letter sink) or a batch frame. A dropped-on-the-floor bad
    * payload is the silent-data-loss failure mode; a crashed stream is
    * the availability one — the quarantine channel avoids both.
    * Returns (typed events, quarantine(payload, reason)). */
  def parseWithQuarantine(raw: DataFrame, jsonCol: String)
      : (DataFrame, DataFrame) = {
    // PERMISSIVE from_json yields an all-null struct (not a null) for
    // garbage input, so "couldn't parse" is only distinguishable from
    // "parsed but fields missing" via the corrupt-record channel
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    def reason = when(col("__e").isNull ||
        col("__e._corrupt_record").isNotNull, "malformed_json")
      .when(col("__e.event_id").isNull, "missing_event_id")
      .when(col("__e.ts").isNull, "missing_ts")
      .when(col("__e.user_id").isNull, "missing_user_id")
      .when(col("__e.event_type").isNull, "missing_event_type")
    val parsed = raw.withColumn("__e", from_json(col(jsonCol), schema,
      Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
    val good = parsed.filter(reason.isNull)
      .select(col("__e.*")).drop("_corrupt_record")
    val bad = parsed.filter(reason.isNotNull)
      .select(col(jsonCol).as("payload"), reason.as("reason"))
    (good, bad)
  }

  /** T5/T6: micro-batch upsert into a versioned parquet sink keyed by
    * event_id — the foreachBatch body. Idempotent per key, so
    * at-least-once batch delivery still yields exactly-once table
    * contents. The sink is a [[graft.sources.VersionedStore]]: the
    * merged snapshot stages in full, ONE marker create commits it, and
    * the previous version is retained — the old delete-then-rename swap
    * had a window with no servable table at all (and a crash inside it
    * lost the sink). Read the current table with
    * `VersionedStore.readLatest(spark, tableDir)`. */
  def mergeIntoTable(spark: SparkSession, batch: DataFrame, tableDir: String): Unit = {
    import graft.sources.VersionedStore
    val merged = VersionedStore.latest(spark, tableDir) match {
      case Some(v) =>
        Merge.upsert(VersionedStore.read(spark, tableDir, v), batch,
          Seq("event_id"))
      case None => batch
    }
    val v = VersionedStore.commit(spark, tableDir, merged)
    VersionedStore.retainFrom(spark, tableDir, v - 1)
  }

  /** Streaming exact dedup with BOUNDED state: duplicates of an
    * event_id arriving within the watermark delay are dropped, and each
    * key's dedup state is EVICTED once the watermark passes it — so the
    * state store holds ∝ keys-per-window, where a plain streaming
    * dropDuplicates accumulates every key ever seen and grows without
    * bound (the reason it cannot run on an unbounded webhook feed; the
    * reference dedups by re-querying its SQLite sink per event,
    * database.py upsert guards). Contract stated honestly: a duplicate
    * arriving AFTER its key was evicted re-emits — the window is the
    * producer's maximum redelivery lag, which is exactly the
    * at-least-once guarantee webhook/queue producers document. */
  def dedupWithinWatermark(events: DataFrame, delayMinutes: Int): DataFrame =
    events.withWatermark("ts", s"$delayMinutes minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stateful per-user tracker (mapGroupsWithState): running count/sum and
    * last event seen. Update-mode output, one row per touched user per
    * micro-batch. */
  def trackUsers(spark: SparkSession, events: Dataset[Event]): Dataset[UserState] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserState]) =>
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val prev = state.getOption.getOrElse(UserState(uid, 0L, 0.0, "", null))
          val next = evs.foldLeft(prev) { (acc, e) =>
            UserState(uid, acc.n_events + 1, acc.total_value + e.value,
              e.event_type, e.ts)
          }
          state.update(next)
          next
      }
  }

  /** Streaming gap-based sessionization: flatMapGroupsWithState keyed by
    * user, one open session per key; an arriving event past the gap
    * closes-and-emits the previous session, and an event-time timeout
    * (watermark-driven) flushes sessions that never see another event.
    * Append-mode twin of [[sessionize]]. */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
      gapMinutes: Int, watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (!it.hasNext && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.start, s.end, s.n))
          } else {
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var open = state.getOption
            evs.foreach { e =>
              open match {
                case Some(s) if e.ts.getTime - s.end.getTime > gapMs =>
                  closed += ClosedSession(uid, s.start, s.end, s.n)
                  open = Some(OpenSession(e.ts, e.ts, 1L))
                case Some(s) =>
                  // max(ts): an out-of-order event above the watermark must
                  // not move the session end (and its timeout) backwards —
                  // keeps parity with the batch twin's max(ts) aggregation
                  open = Some(OpenSession(s.start,
                    if (e.ts.after(s.end)) e.ts else s.end, s.n + 1))
                case None =>
                  open = Some(OpenSession(e.ts, e.ts, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end.getTime + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Stream-stream interval join: each left event correlated with the
    * same user's right events landing in [left.ts, left.ts + within] —
    * the click→error attribution shape (T-series; the reference's
    * monitoring correlates trigger events with failures that follow).
    *
    * On streaming inputs pass `watermark`: both sides are watermarked
    * and the time bound lives IN the join condition, which is what lets
    * the state store evict — a buffered left row dies once the right
    * watermark passes left_ts + within, a right row once the left
    * watermark passes right_ts; state is bounded by (watermark + within)
    * of traffic per side regardless of stream age. Late rows below the
    * watermark are dropped, never matched (pinned in StreamingSpec).
    * With watermark = None the identical plan runs on batch frames —
    * the oracle-checkable twin (t13_interval_join): an equi-join on
    * user_id with a range predicate, never a cartesian.
    */
  /** `joinType` "left_outer" keeps unmatched left rows: in streaming
    * they emit (with null right) only once the watermark passes
    * left_ts + interval — i.e. when a match is provably impossible —
    * which is the attribution pipeline's "click never converted" row.
    * State on both sides stays bounded by watermark + interval either
    * way; the outer form costs nothing extra, it just reports the
    * evictions instead of discarding them. */
  def correlateWithin(left: DataFrame, right: DataFrame, withinMinutes: Int,
      watermark: Option[String] = None,
      joinType: String = "inner"): DataFrame = {
    val l0 = left.select(col("user_id"), col("event_id").as("left_id"),
      col("ts").as("left_ts"))
    val r0 = right.select(col("user_id").as("__ru"),
      col("event_id").as("right_id"), col("ts").as("right_ts"))
    val l = watermark.fold(l0)(w => l0.withWatermark("left_ts", w))
    val r = watermark.fold(r0)(w => r0.withWatermark("right_ts", w))
    l.join(r,
        col("user_id") === col("__ru") &&
          col("right_ts") >= col("left_ts") &&
          col("right_ts") <= col("left_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
        joinType)
      .select("user_id", "left_id", "left_ts", "right_id", "right_ts")
  }

  /** Gap-based sessionization, batch form: a new session starts after
    * `gapMinutes` of per-user silence. Pure window functions — the
    * streaming twin is [[sessionizeStream]]; the batch form is what the
    * oracle can verify. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }
}
