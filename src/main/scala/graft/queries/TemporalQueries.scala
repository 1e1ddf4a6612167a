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

  val all: Seq[Q] = Seq(t9Asof, j11Range)
}
