package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Temporal

/** As-of and range joins over the events stream, oracle-checked against
  * DuckDB's native ASOF JOIN and a plain BETWEEN join respectively. */
object TemporalQueries {

  /** T9: each non-error event annotated with the latest error the same
    * user had seen at that moment ("state in force at event time").
    * DuckDB's built-in ASOF JOIN is the oracle for the union+window
    * rewrite in Temporal.asofJoin. */
  val t9Asof = Q(
    "t9_asof_join",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val left = ev.filter(col("event_type") =!= "error")
        .select("event_id", "user_id", "ts")
      val errs = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts").as("err_ts"))
        .agg(max("value").as("err_value"))
      Temporal.asofJoin(left, errs, Seq("user_id"),
        leftTs = "ts", rightTs = "err_ts", payload = Seq("err_value"))
    },
    Some("""WITH l AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type <> 'error'),
      r AS (
        SELECT user_id, ts AS err_ts, max(value) AS err_value
        FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id, l.ts, r.err_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.err_ts"""))

  /** J11: interval containment — count the events landing inside each
    * incident window (error ts ± 30 min, sampled users). The Spark plan
    * is a bin-bucketed equi-join (Temporal.rangeJoin), never a
    * nested-loop product; the oracle is the straightforward BETWEEN
    * join. */
  val j11Range = Q(
    "j11_range_join",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val incidents = ev
        .filter(col("event_type") === "error" && col("user_id") % 50 === 0)
        .select(col("event_id").as("incident_id"),
          (col("ts") - expr("INTERVAL 30 MINUTES")).as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      val points = ev.select(col("event_id"), col("ts"))
      Temporal.rangeJoin(points, "ts", incidents, "w_start", "w_end",
        binSeconds = 3600)
        .groupBy("incident_id")
        .agg(count(lit(1)).as("n_events"))
    },
    Some("""WITH w AS (
        SELECT event_id AS incident_id,
          ts - INTERVAL 30 MINUTE AS w_start,
          ts + INTERVAL 30 MINUTE AS w_end
        FROM events WHERE event_type = 'error' AND user_id % 50 = 0)
      SELECT w.incident_id, count(*) AS n_events
      FROM w JOIN events e ON e.ts BETWEEN w.w_start AND w.w_end
      GROUP BY 1"""))

  /** T14: calendar gap-fill — each sampled user's daily activity as a
    * CONTINUOUS series (zero rows on silent days, last known day_sum
    * carried forward) via [[Temporal.gapFillDaily]]. The oracle rebuilds
    * the spine with generate_series and the carry with an IGNORE NULLS
    * running window; day_sum goes through the DECIMAL(18,2) contract so
    * the doubles hash identically. */
  val t14Gapfill = Q(
    "t14_gapfill",
    (s, dir) => {
      import Q._
      val daily = Tables.load(s, dir, "events")
        .filter(col("user_id") % 97 === 0)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"), dsum("value").as("day_sum"))
      Temporal.gapFillDaily(daily, "user_id", "day",
        zeroFill = Seq("n_events"), ffill = Seq("day_sum"))
        .orderBy("user_id", "day")
    },
    Some("""WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_sum
        FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2),
      spine AS (
        SELECT user_id,
          CAST(unnest(generate_series(CAST(min_d AS TIMESTAMP),
            CAST(max_d AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT user_id, min(day) AS min_d, max(day) AS max_d
          FROM d GROUP BY 1))
      SELECT s.user_id, s.day,
        coalesce(d.n_events, 0) AS n_events, d.day_sum,
        last_value(d.day_sum IGNORE NULLS) OVER (
          PARTITION BY s.user_id ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_sum_filled
      FROM spine s LEFT JOIN d USING (user_id, day)
      ORDER BY user_id, day"""))

  /** J18: interval-OVERLAP join (Temporal.overlapJoin) — per-user daily
    * activity spans × 2-hour incident windows, the interval×interval
    * sibling of j11's points-in-intervals. Both sides explode into 2 h
    * bins and meet in an equi-join; each overlapping pair survives only
    * in the first shared bin (row-local predicate — no distinct pass),
    * so the plan has ONE exchange and no nested-loop product where the
    * naive `ON a.start <= b.end AND b.start <= a.end` join is
    * Cartesian. overlap_us is the exact integer overlap extent. */
  val j18Overlap = Q(
    "j18_interval_overlap",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val spans = e.groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(min(col("ts")).as("a_start"), max(col("ts")).as("a_end"))
      val inc = e.filter(col("event_type") === "error" && col("event_id") % 50 === 0)
        .select(col("event_id"), col("ts").as("i_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("i_end"))
      Temporal.overlapJoin(spans, "a_start", "a_end", inc, "i_start", "i_end",
        binSeconds = 7200L)
        .select(col("user_id"), col("day"), col("event_id"),
          (unix_micros(least(col("a_end"), col("i_end"))) -
            unix_micros(greatest(col("a_start"), col("i_start"))))
            .as("overlap_us"))
    },
    Some("""WITH spans AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          min(ts) AS a_start, max(ts) AS a_end
        FROM events GROUP BY 1, 2),
      inc AS (
        SELECT event_id, ts AS i_start, ts + INTERVAL 2 HOUR AS i_end
        FROM events WHERE event_type = 'error' AND event_id % 50 = 0)
      SELECT s.user_id, s.day, i.event_id,
        epoch_us(least(s.a_end, i.i_end)) -
          epoch_us(greatest(s.a_start, i.i_start)) AS overlap_us
      FROM spans s JOIN inc i
        ON s.a_start <= i.i_end AND i.i_start <= s.a_end"""))

  /** T17: LAST-TOUCH ATTRIBUTION — each purchase credited to the user's
    * latest preceding click within a 1-day window (null if none): the
    * marketing-analytics classic, and the second consumer of
    * [[Temporal.asofJoin]] (t9 is the rates shape). Clicks dedupe to
    * one per (user, ts) keeping the max event_id — asof requires a
    * unique right key, and the oracle's ORDER BY ts DESC, event_id DESC
    * picks the same row. The window bound is a post-filter on the
    * carried payload: asof attaches the latest click ≤ ts, and "latest
    * ≤ ts but older than the window" implies NO click is in the window
    * (the window is a suffix constraint), so the filter is exact. */
  val t17Attribution = Q(
    "t17_attribution",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("c_ts"))
        .agg(max(col("event_id")).as("c_event_id"))
      Temporal.asofJoin(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "c_ts", payload = Seq("c_ts", "c_event_id"))
        .select(col("event_id"),
          when(col("c_ts").isNotNull &&
              col("c_ts") >= col("ts") - expr("INTERVAL 1 DAY"),
            col("c_event_id")).as("click_id"),
          col("value"))
    },
    Some("""SELECT p.event_id,
        (SELECT c.event_id FROM events c
         WHERE c.event_type = 'click' AND c.user_id = p.user_id
           AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY
         ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id,
        p.value
      FROM events p WHERE p.event_type = 'purchase'"""))

  /** T27: FIRST-touch attribution — t17's complement: credit the
    * EARLIEST click inside the 1-day lookback, not the latest. Same
    * one-shuffle asof window machinery, run on the shifted-and-negated
    * micros axis ("latest −c_ts ≤ −(ts−1d)" IS "earliest c_ts ≥
    * ts−1d"), then the in-window upper-bound check row-locally; among
    * same-instant clicks the max event id (the clicks are
    * pre-aggregated unique per (user, ts), t17's precondition). */
  val t27FirstTouch = Q(
    "t27_first_touch",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("__lneg",
          -(unix_micros(col("ts")) - lit(86400000000L)))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("c_ts"))
        .agg(max(col("event_id")).as("c_event_id"))
        .withColumn("__rneg", -unix_micros(col("c_ts")))
      Temporal.asofJoin(purchases, clicks, Seq("user_id"),
          leftTs = "__lneg", rightTs = "__rneg",
          payload = Seq("c_ts", "c_event_id"))
        .select(col("event_id"),
          when(col("c_ts").isNotNull && col("c_ts") <= col("ts"),
            col("c_event_id")).as("first_click_id"),
          col("value"))
    },
    Some("""SELECT p.event_id,
        (SELECT c.event_id FROM events c
         WHERE c.event_type = 'click' AND c.user_id = p.user_id
           AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY
         ORDER BY c.ts ASC, c.event_id DESC LIMIT 1) AS first_click_id,
        p.value
      FROM events p WHERE p.event_type = 'purchase'"""))

  /** T19: time-RANGE window frame — each sampled user's 7-day TRAILING
    * purchase total at day grain. RANGE, not ROWS: activity is sparse,
    * so "the previous 6 rows" silently reaches back months for a
    * dormant user — the frame must be value-bounded on the day number
    * (`rangeBetween(-6, 0)` over an integer day index; DuckDB's RANGE 6
    * PRECEDING is the oracle). Day sums stay DECIMAL through the window
    * so the frame totals hash identically. One shuffle on user_id does
    * both the rollup and the window. */
  val t19RangeFrame = Q(
    "t19_range_frame",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("user_id") % 25 === 0)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(Q.dec("value")).as("day_val"))
        .withColumn("day_num",
          datediff(col("day"), lit("1970-01-01").cast("timestamp")))
      val w = Window.partitionBy("user_id").orderBy("day_num")
        .rangeBetween(-6, 0)
      d.select(col("user_id"), col("day"),
          col("day_val").cast("double").as("day_val"),
          sum(col("day_val")).over(w).cast("double").as("trailing_7d"))
        .orderBy("user_id", "day")
    },
    Some("""WITH d AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          sum(CAST(value AS DECIMAL(18,2))) AS day_val
        FROM events WHERE event_type = 'purchase' AND user_id % 25 = 0
        GROUP BY 1, 2)
      SELECT user_id, day, CAST(day_val AS DOUBLE) AS day_val,
        CAST(sum(day_val) OVER (PARTITION BY user_id
          ORDER BY DATEDIFF('day', DATE '1970-01-01', day)
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS trailing_7d
      FROM d ORDER BY user_id, day"""))

  /** T20: cumulative distinct users per day — "total audience to date".
    * The naive COUNT(DISTINCT) OVER (ORDER BY day) is unsupported in
    * Spark and O(days × users) anywhere; the exact scalable rewrite
    * counts each user once on their FIRST-ever day (one groupBy), rolls
    * new users up per day, and runs a cumulative sum over the day
    * spine. The only window runs over the spine — rows ∝ calendar days,
    * never ∝ data — which is why the global window is whitelisted in
    * the plan audit. */
  val t20CumulativeDistinct = Q(
    "t20_cumulative_distinct",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val newPerDay = e.groupBy("user_id").agg(min("day").as("d0"))
        .groupBy(col("d0").as("day"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.select("day").distinct()
        .join(newPerDay, Seq("day"), "left_outer")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_users", sum("new_users").over(w))
        .orderBy("day")
    },
    Some("""WITH e AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events),
      f AS (SELECT user_id, min(day) AS d0 FROM e GROUP BY 1),
      nd AS (SELECT d0 AS day, count(*) AS new_users FROM f GROUP BY 1),
      spine AS (SELECT DISTINCT day FROM e)
      SELECT s.day, coalesce(nd.new_users, 0) AS new_users,
        CAST(sum(coalesce(nd.new_users, 0)) OVER (ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_users
      FROM spine s LEFT JOIN nd ON s.day = nd.day
      ORDER BY s.day"""))

  /** T22: trailing-baseline SPIKE detection — the ops-monitoring rule
    * "alert when today's volume is more than 2× the trailing week's
    * daily average", in pure integers so the oracle replays it exactly:
    * spike ⇔ cnt · n_prior > 2 · trailing_sum (the cross-multiplied
    * form of cnt > 2·mean — no division, no doubles). The trailing
    * frame is value-bounded on the day number (RANGE 7..1 PRECEDING,
    * t19's sparse-day discipline) and needs ≥3 prior days before it may
    * fire (cold-start suppression). One shuffle on event_type does the
    * rollup and the window. */
  val t22SpikeDetect = Q(
    "t22_spike_detect",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("day_num",
          datediff(col("day"), lit("1970-01-01").cast("timestamp")))
      val w = Window.partitionBy("event_type").orderBy("day_num")
        .rangeBetween(-7, -1)
      d.select(col("event_type"), col("day"), col("cnt"),
          coalesce(sum(col("cnt")).over(w), lit(0L)).as("trailing_sum"),
          count(col("cnt")).over(w).as("n_prior"))
        .withColumn("is_spike",
          col("n_prior") >= 3 && col("cnt") * col("n_prior") > col("trailing_sum") * 2)
        .orderBy("event_type", "day")
    },
    Some("""WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          count(*) AS cnt
        FROM events GROUP BY 1, 2)
      SELECT event_type, day, cnt,
        CAST(coalesce(sum(cnt) OVER w, 0) AS BIGINT) AS trailing_sum,
        count(cnt) OVER w AS n_prior,
        (count(cnt) OVER w >= 3 AND
         cnt * count(cnt) OVER w > coalesce(sum(cnt) OVER w, 0) * 2) AS is_spike
      FROM d
      WINDOW w AS (PARTITION BY event_type
        ORDER BY DATEDIFF('day', DATE '1970-01-01', day)
        RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
      ORDER BY event_type, day"""))

  /** T23: SLIDING distinct — trailing-7-day unique users per day
    * ("weekly active users at day grain"). COUNT(DISTINCT) OVER a
    * sliding frame is unsupported in Spark and O(days × users)
    * anywhere; the exact scalable rewrite inverts the window: each
    * distinct (user, active day) CONTRIBUTES to the 7 days it covers
    * (one in-row sequence explode, ≤7× the user-day pairs), a second
    * distinct collapses overlapping coverage from nearby active days,
    * and a plain groupBy counts — shuffles ∝ user-days, never days ×
    * users. Coverage is reported only for OBSERVED days (semi-join on
    * the day spine), matching the oracle's range join, which emits no
    * row for an event-less day. */
  val t23SlidingDistinct = Q(
    "t23_sliding_distinct",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"),
          datediff(date_trunc("day", col("ts")),
            lit("1970-01-01").cast("timestamp")).as("d"))
        .distinct()
      val spine = e.select(col("d").as("day_num")).distinct()
      e.select(col("user_id"),
          explode(expr("sequence(d, d + 6)")).as("day_num"))
        .distinct()
        .join(spine, Seq("day_num"), "left_semi")
        .groupBy("day_num")
        .agg(count(lit(1)).as("wau"))
        .select(
          to_timestamp(date_add(lit("1970-01-01").cast("date"),
            col("day_num").cast("int"))).as("day"),
          col("wau"))
        .orderBy("day")
    },
    Some("""WITH e AS (
        SELECT DISTINCT user_id,
          DATEDIFF('day', DATE '1970-01-01',
                   CAST(date_trunc('day', ts) AS DATE)) AS d
        FROM events),
      spine AS (SELECT DISTINCT d FROM e)
      SELECT CAST(DATE '1970-01-01' + INTERVAL (s.d) DAY AS TIMESTAMP) AS day,
        count(DISTINCT e.user_id) AS wau
      FROM spine s JOIN e ON e.d BETWEEN s.d - 6 AND s.d
      GROUP BY s.d ORDER BY day"""))

  /** T24: NEAREST-event join (Temporal.nearestJoin) — each purchase
    * attached to the temporally CLOSEST click of the same user, either
    * side of it (t9's asof is backward-only), ties to the backward
    * side, among same-timestamp clicks the max event id. Two one-shuffle
    * asof window passes (the forward one on the negated micros axis) +
    * a row-local integer arbitration; the oracle is the textbook
    * correlated LATERAL ORDER BY |Δt| LIMIT 1. */
  val t24NearestJoin = Q(
    "t24_nearest_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("c_ts"))
        .agg(max(col("event_id")).as("c_event_id"))
      val nn = Temporal.nearestJoin(purchases, clicks, Seq("user_id"),
        "ts", "c_ts", Seq("c_ts", "c_event_id"))
      val backNearer =
        Temporal.nearerBackward(col("ts"), col("b_c_ts"), col("f_c_ts"))
      nn.select(col("event_id"),
          when(backNearer, col("b_c_event_id"))
            .otherwise(col("f_c_event_id")).as("nearest_click"),
          when(backNearer, unix_micros(col("ts")) - unix_micros(col("b_c_ts")))
            .otherwise(unix_micros(col("f_c_ts")) - unix_micros(col("ts")))
            .as("delta_us"))
        .orderBy("event_id")
    },
    Some("""SELECT p.event_id, n.c_event_id AS nearest_click, n.delta_us
      FROM events p LEFT JOIN LATERAL (
        SELECT c.event_id AS c_event_id,
          abs(epoch_us(c.ts) - epoch_us(p.ts)) AS delta_us
        FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
        ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
          CASE WHEN c.ts > p.ts THEN 1 ELSE 0 END, c.event_id DESC
        LIMIT 1) n ON TRUE
      WHERE p.event_type = 'purchase'
      ORDER BY event_id"""))

  /** T25: event TRANSITION matrix (first-order Markov over each user's
    * journey): next event via lead() ordered by (ts, event_id) — the
    * deterministic tie rule — transition counts per (from, to) plus the
    * row-conditional probability in 1e-6 fixed point (cnt·10⁶ DIV
    * row total, exact both engines). One shuffle on user for the lead,
    * one map-side-combined count — the "where do users go next"
    * product-analytics staple. */
  val t25Transitions = Q(
    "t25_transitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cnt = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTot = cnt.groupBy("from_type").agg(sum("n").as("n_from"))
      cnt.join(fromTot, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          expr("(n * 1000000) DIV n_from").as("p6"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH nx AS (
        SELECT event_type,
          lead(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS next_type
        FROM events),
      cnt AS (
        SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        FROM cnt GROUP BY 1)
      SELECT from_type, to_type, n, (n * 1000000) // n_from AS p6
      FROM cnt JOIN tot USING (from_type)
      ORDER BY from_type, to_type"""))

  /** T28: SEASONAL-PROFILE outliers — each event judged against the
    * mean±2σ of ITS OWN (type, weekday, hour) cell, so a Tuesday-3am
    * value is never compared to the Saturday-noon regime (the
    * de-seasonalized twin of t22's global spike detector). Calendar
    * cells come from pure epoch integer arithmetic (micros div day,
    * +3 mod 7 for a Monday=0 weekday; div hour mod 24) — no dayofweek/
    * hour builtins whose conventions and timezones differ between
    * engines (the d8 lesson). The 2σ test never touches a double:
    * |v − s/n| > 2σ_pop cross-multiplies to (v·n − s)² > 4(n·ssq − s²)
    * with both sides DECIMAL(38,0)/HUGEINT over exact cent values —
    * bit-free-of-tolerance by construction. Shape at 100 TB: one
    * map-side-combined aggregate to ~type·168 cells, cells BROADCAST
    * back (bounded by the calendar, never by rows), one residual pass
    * — no window, no second shuffle of the fact. */
  val t28SeasonalOutliers = Q(
    "t28_seasonal_outliers",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      def d(c: Column) = c.cast(DecimalType(38, 0))
      val e = Tables.load(s, dir, "events").select(col("event_type"),
        expr("((unix_micros(ts) div 86400000000) + 3) % 7").as("dow"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hr"),
        (Q.dec("value") * 100).cast("long").as("v"))
      val cells = e.groupBy("event_type", "dow", "hr")
        .agg(count(lit(1)).as("cn"), sum(d(col("v"))).as("cs"),
          sum(d(col("v")) * d(col("v"))).as("cssq"))
      e.join(broadcast(cells), Seq("event_type", "dow", "hr"))
        .withColumn("lhs",
          (d(col("v")) * col("cn") - col("cs")) *
            (d(col("v")) * col("cn") - col("cs")))
        .withColumn("rhs",
          lit(4) * (col("cn") * col("cssq") - col("cs") * col("cs")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("lhs") > col("rhs"), 1L).otherwise(0L))
            .as("n_anomalies"),
          countDistinct(col("dow") * 100 + col("hr")).as("n_cells"))
        .withColumn("anomaly_pm",
          expr("(1000 * n_anomalies) div n"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
        SELECT event_type,
          ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
          (epoch_us(ts) // 3600000000) % 24 AS hr,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events),
      cells AS (
        SELECT event_type, dow, hr, count(*) AS cn,
          sum(CAST(v AS HUGEINT)) AS cs,
          sum(CAST(v AS HUGEINT) * v) AS cssq
        FROM e GROUP BY 1, 2, 3),
      j AS (
        SELECT e.event_type, e.dow, e.hr, v, cn, cs, cssq,
          (v*cn - cs) * (v*cn - cs) AS lhs,
          4 * (cn*cssq - cs*cs) AS rhs
        FROM e JOIN cells USING (event_type, dow, hr))
      SELECT event_type, count(*) AS n,
        CAST(sum(CASE WHEN lhs > rhs THEN 1 ELSE 0 END) AS BIGINT)
          AS n_anomalies,
        CAST(count(DISTINCT dow * 100 + hr) AS BIGINT) AS n_cells,
        (1000 * CAST(sum(CASE WHEN lhs > rhs THEN 1 ELSE 0 END) AS BIGINT))
          // count(*) AS anomaly_pm
      FROM j GROUP BY 1 ORDER BY 1"""))

  /** T29: SURVIVAL ANALYSIS — the Nelson–Aalen cumulative-hazard
    * estimator (Aalen 1978) over signup→first-purchase conversion,
    * with users who never convert RIGHT-CENSORED at the observation
    * end (dropping them would bias conversion fast — censoring is the
    * whole discipline of survival analysis; H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ,
    * and S(t) ≈ exp(−H(t)) is the Kaplan–Meier reading). Exactness:
    * event times bucket to whole days since signup, each day's hazard
    * increment is the pure integer division dᵢ·10¹² div nᵢ, and the
    * running sum is a window over the DAY SPINE — rows ∝ distinct
    * conversion days (calendar-bounded, the t20 class), never ∝ users.
    * The at-risk count nᵢ derives from exits-per-day (conversion or
    * censoring) via one cumulative count, so no per-user×per-day
    * blow-up exists anywhere: two user-keyed aggregates, one day
    * groupBy, one spine window. */
  val t29Survival = Q(
    "t29_survival",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("s_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("us").as("p_us"))
      val endF = ev.agg(max("us").as("end_us"))
      val users = su.join(pu, Seq("user_id"), "left_outer")
        .crossJoin(broadcast(endF))
        .select(
          when(col("p_us") > col("s_us"),
            expr("(p_us - s_us) div 86400000000")).as("conv_day"),
          when(col("p_us").isNull || col("p_us") <= col("s_us"),
            expr("(end_us - s_us) div 86400000000"))
            .otherwise(expr("(p_us - s_us) div 86400000000")).as("exit_day"))
      val total = users.agg(count(lit(1)).as("n_total"))
      // exits per day feed the at-risk count; conversions per day feed
      // the hazard numerator — both frames ∝ distinct days
      val byDay = users
        .groupBy(col("exit_day").as("day"))
        .agg(count(lit(1)).as("n_exit"),
          sum(when(col("conv_day") === col("exit_day"), 1L).otherwise(0L))
            .as("d_conv"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDay.crossJoin(broadcast(total))
        // at risk on day d = everyone who has not exited BEFORE d
        .withColumn("n_risk",
          col("n_total") - (sum("n_exit").over(w) - col("n_exit")))
        .filter(col("d_conv") > 0)
        .withColumn("h12", expr("(d_conv * 1000000000000) div n_risk"))
        .withColumn("cum_h12", sum("h12").over(w))
        .select(col("day"), col("n_risk"), col("d_conv"),
          (col("h12").cast("double") / lit(1.0e12)).as("hazard"),
          (col("cum_h12").cast("double") / lit(1.0e12)).as("cum_hazard"))
        .orderBy("day")
    },
    Some("""WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      su AS (SELECT user_id, min(us) AS s_us FROM ev
        WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT user_id, min(us) AS p_us FROM ev
        WHERE event_type = 'purchase' GROUP BY 1),
      endf AS (SELECT max(us) AS end_us FROM ev),
      users AS (
        SELECT
          CASE WHEN p_us > s_us THEN (p_us - s_us) // 86400000000 END
            AS conv_day,
          CASE WHEN p_us IS NULL OR p_us <= s_us
            THEN (end_us - s_us) // 86400000000
            ELSE (p_us - s_us) // 86400000000 END AS exit_day
        FROM su LEFT JOIN pu USING (user_id) CROSS JOIN endf),
      total AS (SELECT count(*) AS n_total FROM users),
      byday AS (
        SELECT exit_day AS day, count(*) AS n_exit,
          CAST(sum(CASE WHEN conv_day = exit_day THEN 1 ELSE 0 END)
            AS BIGINT) AS d_conv
        FROM users GROUP BY 1),
      risk AS (
        SELECT day, d_conv,
          CAST(n_total - (sum(n_exit) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_exit)
            AS BIGINT) AS n_risk
        FROM byday CROSS JOIN total),
      hz AS (
        SELECT day, n_risk, d_conv,
          (d_conv * 1000000000000) // n_risk AS h12
        FROM risk WHERE d_conv > 0)
      SELECT day, n_risk, d_conv,
        CAST(h12 AS DOUBLE) / 1.0e12 AS hazard,
        CAST(sum(h12) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / 1.0e12 AS cum_hazard
      FROM hz ORDER BY day"""))

  /** T30: CUSUM DRIFT DETECTION (Page 1954) per event type — the
    * sequential change-point statistic that catches a persistent small
    * shift long before any single-day spike test fires (t22's
    * complement: spike = one bad day; CUSUM = many slightly-bad days).
    * The textbook recursion S_d = max(0, S_{d−1} + dev_d) is not
    * window-expressible, but its closed form is: S_d = C_d − min_{j≤d}
    * C_j over the plain cumulative sum C — ONE running sum + ONE
    * running min, both windows PARTITIONED by type over the day spine.
    * Exactness: deviations scale through ×D (days) so dev'_d = s_d·D −
    * S_total is a pure integer in cents·days; no division anywhere
    * until the reported statistic. The spine is OBSERVED days (a day
    * with zero events contributes no row — compose with t14's gap-fill
    * first if silent days should count as full negative deviations).
    * Output: each type's worst positive drift run (max CUSUM), its
    * day, and the alarm flag at 3× the average |daily total|. */
  val t30Cusum = Q(
    "t30_cusum",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum((Q.dec("value") * 100).cast("long")).as("s_cents"))
      val tot = daily.groupBy("event_type")
        .agg(sum("s_cents").as("total_cents"), count(lit(1)).as("n_days"))
      val spine = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cusum = daily.join(broadcast(tot), "event_type")
        .withColumn("dev", col("s_cents") * col("n_days") - col("total_cents"))
        .withColumn("c", sum("dev").over(spine))
        .withColumn("s", col("c") - min("c").over(spine))
      val w = Window.partitionBy("event_type")
        .orderBy(col("s").desc, col("day"))
      cusum.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("day").as("worst_day"),
          expr("s div n_days").as("cusum_cents"),
          (col("s") > col("total_cents").cast("decimal(38,0)") * 3)
            .as("alarm"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS s_cents
        FROM events GROUP BY 1, 2),
      tot AS (
        SELECT event_type, CAST(sum(s_cents) AS BIGINT) AS total_cents,
          count(*) AS n_days
        FROM daily GROUP BY 1),
      c AS (
        SELECT d.event_type, day, n_days, total_cents,
          sum(s_cents * n_days - total_cents) OVER (
            PARTITION BY d.event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM daily d JOIN tot USING (event_type)),
      s AS (
        SELECT event_type, day, n_days, total_cents,
          c - min(c) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM c),
      r AS (
        SELECT event_type, day, n_days, total_cents, s,
          row_number() OVER (PARTITION BY event_type
                             ORDER BY s DESC, day) AS rk
        FROM s)
      SELECT event_type, day AS worst_day,
        CAST(s // n_days AS BIGINT) AS cusum_cents,
        s > total_cents * 3 AS alarm
      FROM r WHERE rk = 1 ORDER BY event_type"""))

  /** T31: TIME-EMBARGOED train/test split — the leakage control the
    * dd-family's connected-component split applies on the ENTITY axis,
    * here applied on TIME (the backtesting rule from quantitative
    * model validation, e.g. de Prado 2018 ch. 7): everything from the
    * cutoff on is test; a user who appears in test additionally
    * FORFEITS their train events inside the embargo window just before
    * the cutoff (their near-boundary behavior is what the test set
    * evaluates — keeping it in train leaks it), while users never seen
    * in test keep those days. The dropped class is SURFACED as its own
    * split value — the no-silent-caps discipline: an auditor sees
    * exactly how many rows the embargo cost, per type.
    *
    * Scale shape: one distinct on test users (map-side combined), one
    * equi-join back on the high-cardinality user key (no broadcast —
    * users grow with the data), one grouped count. Day arithmetic in
    * date_trunc space, matching the t22 convention. */
  val t31EmbargoSplit = Q(
    "t31_embargo_split",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_trunc("day", col("ts")).as("day"))
      val cutoff = lit("2024-01-22").cast("timestamp")
      val embargoFrom = lit("2024-01-19").cast("timestamp")
      val testUsers = e.filter(col("day") >= cutoff)
        .select("user_id").distinct().withColumn("__in_test", lit(1))
      e.join(testUsers, Seq("user_id"), "left_outer")
        .withColumn("split",
          when(col("day") >= cutoff, "test")
            .when(col("__in_test").isNotNull && col("day") >= embargoFrom,
              "embargo_dropped")
            .otherwise("train"))
        .groupBy("split", "event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"))
        .orderBy("split", "event_type")
    },
    Some("""WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events),
      tu AS (
        SELECT DISTINCT user_id FROM e
        WHERE day >= TIMESTAMP '2024-01-22'),
      t AS (
        SELECT e.event_type, e.user_id,
          CASE WHEN e.day >= TIMESTAMP '2024-01-22' THEN 'test'
               WHEN tu.user_id IS NOT NULL
                 AND e.day >= TIMESTAMP '2024-01-19' THEN 'embargo_dropped'
               ELSE 'train' END AS split
        FROM e LEFT JOIN tu ON e.user_id = tu.user_id)
      SELECT split, event_type, count(*) AS n,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM t GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[Q] = Seq(t9Asof, j11Range, t14Gapfill, j18Overlap,
    t17Attribution, t19RangeFrame, t20CumulativeDistinct, t22SpikeDetect,
    t23SlidingDistinct, t24NearestJoin, t25Transitions, t27FirstTouch,
    t28SeasonalOutliers, t29Survival, t30Cusum, t31EmbargoSplit)
}
