package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventPipeline

/** Batch twins of the streaming semantics (SURVEY.md §2.10) — the same
  * EventPipeline code paths, run on static frames so the DuckDB oracle
  * can check them. */
object Streaming {

  /** T8: gap-based sessionization (4h silence starts a new session). */
  val t8Sessionize = Q(
    "t8_sessionize",
    (s, dir) => EventPipeline.sessionize(
      Tables.load(s, dir, "events"), gapMinutes = 240),
    Some("""WITH g AS (
        SELECT user_id, ts, event_id,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events),
      m AS (
        SELECT user_id, ts, event_id,
          CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 14400000000
               THEN 1 ELSE 0 END AS new_session
        FROM g),
      x AS (
        SELECT user_id, ts,
          CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM m)
      SELECT user_id, session_seq, count(*) AS n_events,
        min(ts) AS session_start, max(ts) AS session_end
      FROM x GROUP BY 1, 2"""))

  /** T8 via the NATIVE operator: session_window merges events closer
    * than the gap — the relation t8 builds with lag/cumsum windows,
    * produced here by Spark's built-in session grouping (the batch twin
    * of the streaming session_window aggregation, which keeps per-key
    * state bounded by open sessions). Spark opens a new session when an
    * event lands AT the previous session's end (diff >= gap) — the
    * oracle mirrors that exact break rule. */
  val t10SessionWindow = Q(
    "t10_session_window",
    (s, dir) => Tables.load(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events")),
    Some("""WITH g AS (
        SELECT user_id, ts,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        FROM events),
      m AS (
        SELECT user_id, ts,
          CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 1800000000
               THEN 1 ELSE 0 END AS brk
        FROM g),
      x AS (
        SELECT user_id, ts,
          CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
        FROM m)
      SELECT user_id, min(ts) AS session_start,
        max(ts) + INTERVAL 30 MINUTE AS session_end,
        count(*) AS n_events
      FROM x GROUP BY user_id, sess"""))

  /** T3: exactly-once-per-key ingest — the stream-static anti-join run on
    * static frames (odd events are "already ingested"). */
  val t3NewOnly = Q(
    "t3_new_only",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select("event_id", "user_id", "event_type")
      EventPipeline.newOnly(e, e.filter(col("event_id") % 2 === 1))
    },
    Some("""SELECT event_id, user_id, event_type FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM events x
        WHERE x.event_id % 2 = 1 AND x.event_id = e.event_id)"""))

  /** T12: hopping (sliding) window aggregation — 1 h windows advancing
    * every 30 min, so each event lands in exactly 2 overlapping windows.
    * The overlap is what tumbling t7 can't express; in the streaming
    * form the same `window(ts, len, slide)` group drives watermarked
    * state. The oracle materializes both member windows per event with
    * exact integer microsecond arithmetic (epoch_us, no doubles). */
  val t12HoppingWindow = Q(
    "t12_hopping_window",
    (s, dir) => Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Q.dsum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value")),
    Some("""WITH hop AS (
        SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
                 - k.k * 1800000000) AS win_start,
          event_type, value
        FROM events, range(2) k(k))
      SELECT win_start, event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM hop GROUP BY 1, 2"""))

  /** T13: stream-stream interval join, batch twin — every click
    * correlated with the same user's errors inside the following
    * 30 minutes (the click→error attribution shape). The streaming form
    * is the same code path with watermarks on BOTH sides and the time
    * bound in the join condition, so state evicts at
    * watermark + interval (StreamingSpec drives it through two
    * MemoryStreams and pins batch parity + late-row drop). Plan shape:
    * equi-join on user_id with a range predicate — never a cartesian. */
  val t13IntervalJoin = Q(
    "t13_interval_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      EventPipeline.correlateWithin(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "error"),
        withinMinutes = 30)
    },
    Some("""SELECT c.user_id, c.event_id AS left_id, c.ts AS left_ts,
        e.event_id AS right_id, e.ts AS right_ts
      FROM events c JOIN events e
        ON c.event_type = 'click' AND e.event_type = 'error'
        AND c.user_id = e.user_id
        AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 30 MINUTE"""))

  /** T21: the LEFT-OUTER form of the stream-stream interval correlate
    * (t13's inner twin) — unmatched clicks survive with a NULL error
    * side, which is the attribution pipeline's "click never converted"
    * row (in streaming those emit exactly when the watermark proves a
    * match impossible; StreamingSpec pins that). Oracle note: the left
    * side's own filters live in WHERE, not the join's ON — predicates
    * on the PRESERVED side of an outer join only control matching, they
    * never drop rows. Plan: equi-join on user_id, range as a
    * post-condition, never a product. */
  val t21OuterCorrelate = Q(
    "t21_outer_correlate",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      EventPipeline.correlateWithin(
        e.filter(col("event_type") === "click" && col("user_id") % 5 === 0),
        e.filter(col("event_type") === "error"),
        withinMinutes = 30, joinType = "left_outer")
    },
    Some("""SELECT c.user_id, c.event_id AS left_id, c.ts AS left_ts,
        e.event_id AS right_id, e.ts AS right_ts
      FROM events c LEFT JOIN events e
        ON e.event_type = 'error' AND c.user_id = e.user_id
        AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 30 MINUTE
      WHERE c.event_type = 'click' AND c.user_id % 5 = 0"""))

  /** T26: top session PATHS — "the most common user journeys": t8's
    * session assignment (gap 4h, (ts, event_id) tie order), each
    * session's first-5 event types joined into a path string, top-20
    * paths by frequency (count DESC, path ASC). Deterministic
    * everywhere a parallel engine could wobble: in-session order comes
    * from sort_array over (rn, type) structs — collect_list alone has
    * no order — and the 5-event cap bounds the carried payload. One
    * user-keyed shuffle drives both windows and the session collapse;
    * the path count is map-side combined; top-20 via TakeOrdered. */
  val t26SessionPaths = Q(
    "t26_session_paths",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 240L * 60L * 1000000L
      val inSession = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_session"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "session_seq")
            .orderBy("ts", "event_id")))
        .filter(col("rn") <= 5)
      inSession.groupBy("user_id", "session_seq")
        .agg(expr(
          """array_join(transform(
               sort_array(collect_list(struct(rn, event_type))),
               p -> p.event_type), '>')""").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    },
    Some("""WITH g AS (
        SELECT user_id, ts, event_id, event_type,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events),
      m AS (
        SELECT user_id, ts, event_id, event_type,
          CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 14400000000
               THEN 1 ELSE 0 END AS new_session
        FROM g),
      x AS (
        SELECT user_id, ts, event_id, event_type,
          CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM m),
      r AS (
        SELECT user_id, session_seq, event_type,
          row_number() OVER (PARTITION BY user_id, session_seq
                             ORDER BY ts, event_id) AS rn
        FROM x QUALIFY rn <= 5),
      paths AS (
        SELECT user_id, session_seq,
          string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r GROUP BY 1, 2)
      SELECT path, count(*) AS n FROM paths
      GROUP BY path ORDER BY n DESC, path LIMIT 20"""))

  val all: Seq[Q] = Seq(t8Sessionize, t10SessionWindow, t3NewOnly,
    t12HoppingWindow, t13IntervalJoin, t21OuterCorrelate, t26SessionPaths)
}
