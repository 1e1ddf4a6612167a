package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Merge
import Q._

/** Set operations, dedup, and upsert/merge semantics (SURVEY.md §2.7,
  * §2.9) — each restated as a pure query so the DuckDB oracle can check
  * the merged relation. */
object SetMerge {

  /** U1: union of overlapping partitioned scans, distinct by id (reference
    * api_clients.py:957-1095 seen_ids harvest). Rows for the same key are
    * identical, so dropDuplicates is deterministic. */
  val u1UnionDedup = Q(
    "u1_union_dedup",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
      o.filter(col("o_totalprice") > 300000)
        .union(o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")))
        .dropDuplicates("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE o_totalprice > 300000
      UNION
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'"""))

  /** U2: composite-key dedup keeping the lowest id — deterministic
    * survivor via window, unlike bare dropDuplicates (reference
    * applicant_processor.py:317-336 dedup by (ref, normalized name)). */
  val u2DedupComposite = Q(
    "u2_dedup_composite",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang", "source").orderBy("doc_id")
      Tables.load(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("lang", "source", "doc_id", "n_chars")
    },
    Some("""SELECT lang, source, doc_id, n_chars FROM (
        SELECT lang, source, doc_id, n_chars,
          row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1"""))

  /** U4: id-set union + distinct (reference applicant_pipeline.py:441-463). */
  val u4UnionDistinct = Q(
    "u4_union_distinct",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      e.filter(col("event_type") === "click").select("user_id")
        .union(e.filter(col("event_type") === "view").select("user_id"))
        .distinct()
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'click'
      UNION SELECT user_id FROM events WHERE event_type = 'view'"""))

  /** M1: MERGE/upsert on a business key via graft.operators.Merge —
    * updates win, unmatched base rows pass through (reference
    * database.py:255-290 ON CONFLICT DO UPDATE). */
  val m1Upsert = Q(
    "m1_upsert",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      val base = c.filter(col("c_custkey") < 1000)
      val updates = c.filter(col("c_custkey") >= 500 && col("c_custkey") < 1200)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
      Merge.upsert(base, updates, Seq("c_custkey"))
    },
    Some("""WITH base AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey < 1000),
      updates AS (
        SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal FROM customer
        WHERE c_custkey >= 500 AND c_custkey < 1200)
      SELECT * FROM updates
      UNION ALL
      SELECT b.* FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = b.c_custkey)"""))

  /** M12: upsert with SCHEMA EVOLUTION (Merge.upsertEvolving) — the
    * updates batch carries a column the base table lacks (the reference
    * adds columns to live tables via migrations and backfills NULL);
    * surviving base rows null-fill it, update rows win on the key. */
  val m12UpsertEvolving = Q(
    "m12_upsert_evolving",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      val base = c.filter(col("c_custkey") < 1000)
      val updates = c.filter(col("c_custkey") >= 500 && col("c_custkey") < 1200)
        .withColumn("c_acctbal", col("c_acctbal") * 2)
        .withColumn("review_status", lit("reviewed"))
      Merge.upsertEvolving(base, updates, Seq("c_custkey"))
    },
    Some("""WITH base AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey < 1000),
      updates AS (
        SELECT c_custkey, c_name, c_acctbal * 2 AS c_acctbal,
          'reviewed' AS review_status
        FROM customer WHERE c_custkey >= 500 AND c_custkey < 1200)
      SELECT * FROM updates
      UNION ALL
      SELECT b.c_custkey, b.c_name, b.c_acctbal, NULL AS review_status
      FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = b.c_custkey)"""))

  /** M7: keyed column update from an import file, zero-padded key
    * (reference app.py:2077-2111 — lpad(num, 8, '0') CSV update). */
  val m7KeyedUpdate = Q(
    "m7_keyed_update",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .withColumn("key", lpad(col("c_custkey").cast("string"), 8, "0"))
        .select("key", "c_name", "c_acctbal")
      val updates = c.filter(col("key") < "00000100")
        .withColumn("c_acctbal", col("c_acctbal") * 2)
        .select("key", "c_acctbal")
      Merge.updateColumns(c, updates, Seq("key"), Seq("c_acctbal"))
    },
    Some("""WITH c AS (
        SELECT lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key, c_name, c_acctbal
        FROM customer),
      u AS (SELECT key, c_acctbal * 2 AS new_bal FROM c WHERE key < '00000100')
      SELECT c.key, c.c_name,
        CASE WHEN u.key IS NOT NULL THEN u.new_bal ELSE c.c_acctbal END AS c_acctbal
      FROM c LEFT JOIN u USING (key)"""))

  /** M10/T3: insert-only-if-new — exactly-once-per-key ingest (reference
    * weekly_scheduler.py:833-946; stream-static anti-join shape). */
  val m10InsertIfAbsent = Q(
    "m10_insert_if_absent",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val existing = o.filter(col("o_orderkey") % 3 === 0)
      val incoming = o.filter(col("o_orderkey") < 5000)
      Merge.insertIfAbsent(existing, incoming, Seq("o_orderkey"))
    },
    Some("""WITH existing AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0),
      incoming AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey < 5000)
      SELECT * FROM existing
      UNION ALL
      SELECT i.* FROM incoming i
      WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.o_orderkey = i.o_orderkey)"""))

  /** U6: proper INTERSECT / EXCEPT (absent from the reference; the
    * natural completion of its id-set algebra — SURVEY §2.7). */
  val u6IntersectExcept = Q(
    "u6_intersect_except",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val clickers = e.filter(col("event_type") === "click").select("user_id")
      val buyers = e.filter(col("event_type") === "purchase").select("user_id")
      clickers.intersect(buyers).withColumn("set_op", lit("both"))
        .unionByName(clickers.except(buyers).withColumn("set_op", lit("click_only")))
    },
    Some("""SELECT user_id, 'both' AS set_op FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase')
      UNION ALL
      SELECT user_id, 'click_only' AS set_op FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase')"""))

  /** M6: contact upsert on the 3-column composite key (entity, type,
    * value-slot) — the reference dedups the incoming batch on the
    * composite key FIRST, then upserts (database.py:1014-1094). The
    * within-batch survivor is the lowest event_id: a deterministic total
    * order, where the reference inherits dict-iteration order. */
  val m6ContactUpsert = Q(
    "m6_contact_upsert",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val keys = Seq("entity_id", "contact_type", "contact_value")
      def dedupBatch(df: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(keys.map(col): _*).orderBy("event_id")
        df.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      }
      val e = Tables.load(s, dir, "events").select(
        col("user_id").as("entity_id"),
        col("event_type").as("contact_type"),
        floor(col("value")).as("contact_value"),
        col("event_id"), col("value"))
      val base = dedupBatch(e.filter(col("event_id") % 2 === 0))
      val incoming = dedupBatch(e.filter(col("event_id") % 3 === 0))
      Merge.upsert(base, incoming, keys)
    },
    Some("""WITH e AS (
        SELECT user_id AS entity_id, event_type AS contact_type,
          CAST(floor(value) AS BIGINT) AS contact_value, event_id, value
        FROM events),
      base AS (
        SELECT entity_id, contact_type, contact_value, event_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY entity_id, contact_type,
            contact_value ORDER BY event_id) AS rn
          FROM e WHERE event_id % 2 = 0) WHERE rn = 1),
      incoming AS (
        SELECT entity_id, contact_type, contact_value, event_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY entity_id, contact_type,
            contact_value ORDER BY event_id) AS rn
          FROM e WHERE event_id % 3 = 0) WHERE rn = 1)
      SELECT * FROM incoming
      UNION ALL
      SELECT b.* FROM base b WHERE NOT EXISTS (
        SELECT 1 FROM incoming i WHERE i.entity_id = b.entity_id
          AND i.contact_type = b.contact_type
          AND i.contact_value = b.contact_value)"""))

  /** M9: predicate delete as complement-overwrite (reference
    * database.py:724-729). */
  val m9Delete = Q(
    "m9_delete_where",
    (s, dir) => Merge.deleteWhere(
      Tables.load(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal"),
      col("c_acctbal") < 0),
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE NOT (c_acctbal < 0) OR (c_acctbal < 0) IS NULL"""))

  /** M11: SCD type-2 merge — every 7th order gets a status change 30
    * days after its order date; changed keys produce a closed history
    * row plus a new current row, P-status updates are no-ops. */
  val m11Scd2 = Q(
    "m11_scd2",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val current = o.select(col("o_orderkey"),
        col("o_orderstatus").as("status"),
        col("o_orderdate").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val updates = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", "P").otherwise("X").as("status"),
          expr("o_orderdate + INTERVAL 30 DAY").as("eff"))
      Merge.scd2(current, updates, Seq("o_orderkey"), Seq("status"), "eff")
        .withColumn("is_current", col("valid_to").isNull)
    },
    Some("""WITH cur AS (
        SELECT o_orderkey, o_orderstatus AS status,
          o_orderdate AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        FROM orders),
      u AS (
        SELECT o_orderkey,
          CASE WHEN o_orderstatus = 'P' THEN 'P' ELSE 'X' END AS ustatus,
          o_orderdate + INTERVAL 30 DAY AS eff
        FROM orders WHERE o_orderkey % 7 = 0),
      j AS (
        SELECT c.o_orderkey, c.status, c.valid_from, c.valid_to, u.ustatus, u.eff
        FROM cur c LEFT JOIN u USING (o_orderkey)),
      changed AS (
        SELECT * FROM j
        WHERE eff IS NOT NULL AND ustatus IS DISTINCT FROM status)
      SELECT o_orderkey, status, valid_from, eff AS valid_to,
        false AS is_current FROM changed
      UNION ALL
      SELECT o_orderkey, ustatus AS status, eff AS valid_from,
        CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current FROM changed
      UNION ALL
      SELECT o_orderkey, status, valid_from, CAST(NULL AS TIMESTAMP),
        true FROM j WHERE eff IS NULL OR ustatus IS NOT DISTINCT FROM status"""))

  /** M13: snapshot diff — the CDC view between two keyed versions of
    * orders (operators.Merge.snapshotDiff: one full-outer key join +
    * row-local verdict; unchanged rows dropped). The "new" snapshot is
    * derived deterministically from the same table — keys %97 deleted,
    * prices bumped on %31, %89 re-keyed high as inserts — so the oracle
    * replays both sides and the classification exactly. */
  val m13SnapshotDiff = Q(
    "m13_snapshot_diff",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val newer = orders
        .filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 31 === 0, col("o_totalprice") + lit(10.0))
            .otherwise(col("o_totalprice")))
        .unionByName(orders.filter(col("o_orderkey") % 89 === 0)
          .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
            col("o_totalprice"), lit("N").as("o_orderstatus")))
      graft.operators.Merge.snapshotDiff(orders, newer,
          Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
        .orderBy("o_orderkey")
    },
    Some("""WITH older AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      newer AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 10.0
            ELSE o_totalprice END AS o_totalprice,
          o_orderstatus
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice, 'N'
        FROM orders WHERE o_orderkey % 89 = 0)
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        CASE WHEN o.o_orderkey IS NULL THEN 'added'
          WHEN n.o_orderkey IS NULL THEN 'removed'
          ELSE 'changed' END AS change,
        o.o_totalprice AS old_o_totalprice,
        n.o_totalprice AS new_o_totalprice,
        o.o_orderstatus AS old_o_orderstatus,
        n.o_orderstatus AS new_o_orderstatus
      FROM older o FULL OUTER JOIN newer n ON o.o_orderkey = n.o_orderkey
      WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
      ORDER BY o_orderkey"""))

  /** M14: incremental materialized-view maintenance
    * (operators.MatView) — a per-(event_type, day) count/sum rollup is
    * built over 80% of the stream, then brought current by DELTA
    * MERGES alone: one insert batch (the remaining 20%) and one
    * retraction batch (every event_id%5==0, sign −1, e.g. a bad
    * producer's rows being clawed back). The final view must equal a
    * from-scratch groupBy over the corrected stream — which is exactly
    * what the oracle computes, so "maintenance == recompute" is a
    * hash-checked property. Refresh cost is ∝ |delta| + |view|; the
    * base rows are never re-read after the initial build. */
  val m14IncrementalMv = Q(
    "m14_incremental_mv",
    (s, dir) => {
      import graft.operators.MatView
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          date_trunc("day", col("ts")).as("day"), col("value"))
      val keys = Seq("event_type", "day")
      val mv0 = MatView.build(e.filter(col("event_id") % 10 < 8), keys, "value")
      val ins = e.filter(col("event_id") % 10 >= 8).withColumn("sign", lit(1))
      val mv1 = MatView.applyDelta(mv0, ins, keys, "value", "sign")
      val ret = e.filter(col("event_id") % 5 === 0).withColumn("sign", lit(-1))
      MatView.applyDelta(mv1, ret, keys, "value", "sign")
        .select(col("event_type"), col("day"), col("cnt"),
          col("total").cast("double").as("total"))
    },
    Some("""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        CAST(count(*) AS BIGINT) AS cnt,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
          AS total
      FROM events WHERE event_id % 5 != 0
      GROUP BY 1, 2"""))

  /** M15: min/max view maintenance under retraction — m14's view
    * widened with vmin/vmax, the aggregates a delta CANNOT always
    * maintain from the view alone (retracting the row holding the
    * extremum forces a group-local recompute; inserts fold in
    * monotonically). Same insert-then-retract interleaving as m14; the
    * recompute reads the updated base only for groups whose retraction
    * touched an extremum, semi-join-pruned. The oracle is the full
    * rebuild — maintained == recomputed, bit-equal through the
    * DECIMAL(18,2) contract. */
  val m15MinMaxMv = Q(
    "m15_minmax_mv",
    (s, dir) => {
      import graft.operators.MatView
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          date_trunc("day", col("ts")).as("day"), col("value"))
      val keys = Seq("event_type", "day")
      val mv0 = MatView.buildMinMax(e.filter(col("event_id") % 10 < 8), keys, "value")
      val ins = e.filter(col("event_id") % 10 >= 8).withColumn("sign", lit(1))
      val mv1 = MatView.applyDeltaMinMax(mv0, ins, e, keys, "value", "sign")
      val ret = e.filter(col("event_id") % 5 === 0).withColumn("sign", lit(-1))
      val base2 = e.filter(col("event_id") % 5 =!= 0)
      MatView.applyDeltaMinMax(mv1, ret, base2, keys, "value", "sign")
        .select(col("event_type"), col("day"), col("cnt"),
          col("total").cast("double").as("total"),
          col("vmin").cast("double").as("vmin"),
          col("vmax").cast("double").as("vmax"))
    },
    Some("""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        CAST(count(*) AS BIGINT) AS cnt,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
          AS total,
        CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vmin,
        CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vmax
      FROM events WHERE event_id % 5 != 0
      GROUP BY 1, 2"""))

  /** M16: avg/variance view maintenance — the moments view. Unlike
    * min/max (m15), Σv² is a signed sum, so retraction is pure delta
    * propagation with no recompute path; avg/var_pop derive at read
    * time from (cnt, total, total_sq) in an explicit double-expression
    * order the oracle replays verbatim. Same interleaving as m14/m15;
    * maintained == rebuilt bit-equal through DECIMAL(18,2)/(38,4). */
  val m16MomentsMv = Q(
    "m16_moments_mv",
    (s, dir) => {
      import graft.operators.MatView
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          date_trunc("day", col("ts")).as("day"), col("value"))
      val keys = Seq("event_type", "day")
      val mv0 = MatView.buildMoments(e.filter(col("event_id") % 10 < 8), keys, "value")
      val ins = e.filter(col("event_id") % 10 >= 8).withColumn("sign", lit(1))
      val mv1 = MatView.applyDeltaMoments(mv0, ins, keys, "value", "sign")
      val ret = e.filter(col("event_id") % 5 === 0).withColumn("sign", lit(-1))
      val mv2 = MatView.applyDeltaMoments(mv1, ret, keys, "value", "sign")
      MatView.momentsReadModel(mv2, keys)
        .select(col("event_type"), col("day"), col("cnt"), col("total"),
          col("avg_v"), col("var_pop"))
    },
    Some("""WITH g AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          CAST(count(*) AS BIGINT) AS cnt,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
          CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) *
                        CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4)))
               AS DECIMAL(38,4)) AS total_sq
        FROM events WHERE event_id % 5 != 0
        GROUP BY 1, 2)
      SELECT event_type, day, cnt, CAST(total AS DOUBLE) AS total,
        CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE) AS avg_v,
        greatest(
          CAST(total_sq AS DOUBLE) / CAST(cnt AS DOUBLE) -
            (CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE)) *
            (CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE)),
          0.0) AS var_pop
      FROM g"""))

  /** M17: TIME-TRAVEL reads over versioned snapshots
    * (sources.VersionedStore): three table versions — base orders, a
    * keyed price update, a predicate delete — each committed as a full
    * snapshot directory with a marker-file atomic commit, then every
    * HISTORICAL version read back and aggregated from its stored bytes.
    * The reproducibility primitive a training pipeline needs ("the
    * corpus as of the v1 training run"), and the m13 CDC diff's storage
    * half: m13 diffs two live frames, this keeps every version
    * readable. The oracle recomputes each version's stats from the base
    * table, so a commit that corrupted or mixed versions hash-fails.
    * Build is once per (JVM, sfDir); re-runs only read. */
  val m17TimeTravel = Q(
    "m17_time_travel",
    (s, dir) => {
      import graft.sources.VersionedStore
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.sources.Bucketing.processRoot}/tt_orders_$tag"
      if (VersionedStore.latest(s, base).isEmpty) {
        val orders = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        VersionedStore.commit(s, base, orders)
        val v1 = orders.withColumn("o_totalprice",
          when(col("o_orderkey") % 31 === 0, col("o_totalprice") + lit(10.0))
            .otherwise(col("o_totalprice")))
        VersionedStore.commit(s, base, v1)
        VersionedStore.commit(s, base, v1.filter(col("o_orderstatus") =!= "F"))
      }
      graft.sources.VersionedStore.versions(s, base).map { v =>
        VersionedStore.read(s, base, v)
          .agg(count(lit(1)).as("n_rows"), dsum("o_totalprice").as("sum_total"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_total"))
      }.reduce(_ unionByName _).orderBy("version")
    },
    Some("""WITH v1 AS (
        SELECT CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 10.0
            ELSE o_totalprice END AS o_totalprice,
          o_orderstatus
        FROM orders)
      SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM orders
      UNION ALL
      SELECT CAST(1 AS BIGINT), count(*),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM v1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM v1 WHERE o_orderstatus <> 'F'
      ORDER BY version"""))

  /** M18: incremental SKETCH maintenance — the non-linear member of the
    * view-maintenance family (m14 count/sum, m15 min/max, m16 moments):
    * a per-group KMV distinct-user sketch maintained by MERGING the
    * batch's own sketch into the stored state (kmvUnion = k smallest of
    * the combined hash sets), so batch cost is sketch-the-batch +
    * a groups-sized merge — the corpus is never re-scanned. The oracle
    * is the full REBUILD over all events (a26's formula), which is
    * exact because kmv(A) ⊎ kmv(B) == kmv(A ∪ B) identically — the
    * mergeability that makes sketches warehouse state. Honest limit:
    * sketch state is INSERT-ONLY — there is no Z-set retraction for a
    * k-min set (you can't know what the k-th value would have been);
    * deletion needs windowed sketch rotation (the a33 rollup pattern)
    * or a rebuild. */
  val m18SketchMv = Q(
    "m18_sketch_mv",
    (s, dir) => {
      import graft.operators.{Dedup, Sketches}
      val k = 64
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          Dedup.hash56(col("user_id").cast("string")).as("h"))
      def sketchOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type").agg(Sketches.kmv(k)(col("h")).as("kmv"))
      val stored = sketchOf(e.filter(col("event_id") % 10 < 8))
      val batch = sketchOf(e.filter(col("event_id") % 10 >= 8))
      val empty = array().cast("array<bigint>")
      stored.select(col("event_type"), col("kmv").as("a"))
        .join(batch.select(col("event_type"), col("kmv").as("b")),
          Seq("event_type"), "full_outer")
        .select(col("event_type"),
          Sketches.kmvUnion(coalesce(col("a"), empty),
            coalesce(col("b"), empty), k).as("kmv"))
        .select(col("event_type"), Sketches.estimate("kmv", k).as("kmv_users"))
        .orderBy("event_type")
    },
    Some(s"""WITH h AS (
        SELECT DISTINCT event_type,
          ((md5_number_lower(CAST(user_id AS VARCHAR)) % ${graft.operators.Dedup.M56})::BIGINT) AS hv
        FROM events),
      r AS (
        SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h)
      SELECT event_type,
        CASE WHEN count(*) < 64 THEN count(*)
             ELSE ${63L * graft.operators.Dedup.M56} // max(hv) END AS kmv_users
      FROM r WHERE rn <= 64
      GROUP BY event_type ORDER BY event_type"""))

  /** M19: OPTIMIZE — small-file compaction on the versioned store
    * (sources.VersionedStore.optimize). The first commit lands as 64
    * accreted small files (the per-batch-file shape streaming
    * foreachBatch maintenance produces); optimize rewrites them
    * SHUFFLE-FREE (coalesce of read splits) into target-sized files as a
    * NEW committed version — time travel to the pre-compaction snapshot
    * keeps working, the staged extra rides along, and a crash
    * mid-rewrite would leave the old version latest. The oracle
    * aggregates the ORIGINAL table, so the compaction is proven
    * content-identical through the rewrite; the in-query requires pin
    * what SQL can't see (file count shrank, extras carried). */
  val m19Optimize = Q(
    "m19_optimize",
    (s, dir) => {
      import graft.sources.VersionedStore
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.sources.Bucketing.processRoot}/opt_orders_$tag"
      if (VersionedStore.latest(s, base).isEmpty) {
        val orders = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        VersionedStore.commit(s, base, orders.repartition(64),
          extras = Map("_batch" -> "b42"))
        val nv = VersionedStore.optimize(s, base, targetBytes = 1L << 30)
        require(nv.contains(1L), "optimize must commit a new version")
        require(VersionedStore.fileStats(s, base, 1L)._1 <
          VersionedStore.fileStats(s, base, 0L)._1,
          "optimize must reduce the file count")
        require(
          VersionedStore.readExtra(s, base, 1L, "_batch").contains("b42"),
          "staged extras must survive the compaction")
      }
      VersionedStore.readLatest(s, base)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum("o_totalprice").as("sum_total"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** M20: CDC between committed versions
    * (sources.VersionedStore.changesBetween) — m13's change feed
    * computed from STORED snapshots instead of live frames: v0 and v1
    * are committed through the marker discipline, then diffed from
    * their bytes. Same mutation recipe and the same oracle as m13, so
    * "stored-bytes CDC == live-frame CDC" is a hash-checked property —
    * a commit that corrupted either snapshot fails here. */
  val m20CdcVersions = Q(
    "m20_cdc_versions",
    (s, dir) => {
      import graft.sources.VersionedStore
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.sources.Bucketing.processRoot}/cdc_orders_$tag"
      if (VersionedStore.latest(s, base).isEmpty) {
        val orders = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        val newer = orders
          .filter(col("o_orderkey") % 97 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 31 === 0, col("o_totalprice") + lit(10.0))
              .otherwise(col("o_totalprice")))
          .unionByName(orders.filter(col("o_orderkey") % 89 === 0)
            .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
              col("o_totalprice"), lit("N").as("o_orderstatus")))
        VersionedStore.commit(s, base, orders)
        VersionedStore.commit(s, base, newer)
      }
      VersionedStore.changesBetween(s, base, 0L, 1L,
          Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
        .orderBy("o_orderkey")
    },
    Some("""WITH older AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      newer AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 10.0
            ELSE o_totalprice END AS o_totalprice,
          o_orderstatus
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice, 'N'
        FROM orders WHERE o_orderkey % 89 = 0)
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        CASE WHEN o.o_orderkey IS NULL THEN 'added'
          WHEN n.o_orderkey IS NULL THEN 'removed'
          ELSE 'changed' END AS change,
        o.o_totalprice AS old_o_totalprice,
        n.o_totalprice AS new_o_totalprice,
        o.o_orderstatus AS old_o_orderstatus,
        n.o_orderstatus AS new_o_orderstatus
      FROM older o FULL OUTER JOIN newer n ON o.o_orderkey = n.o_orderkey
      WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
      ORDER BY o_orderkey"""))

  /** M21: zone-map DATA SKIPPING on the versioned store
    * (sources.VersionedStore.commitWithStats / readSkipping) — the
    * plan-time file pruning every warehouse table format performs.
    * The commit range-partitions orders by key into 16 files (each file
    * a tight key range) and stages per-file min/max stats INSIDE the
    * snapshot under the same single commit marker; the skipping scan
    * consults the stats table (∝ file count, never rows) and reads ONLY
    * the files whose range can intersect the predicate — at 100 TB the
    * difference between scheduling 16 tasks and 2. The oracle runs the
    * same range filter over the ORIGINAL table, so "pruned scan ==
    * full scan + filter" is hash-checked; the in-query requires pin
    * what SQL can't see (files actually skipped). */
  val m21DataSkipping = Q(
    "m21_data_skipping",
    (s, dir) => {
      import graft.sources.VersionedStore
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.sources.Bucketing.processRoot}/skip_orders_$tag"
      if (VersionedStore.latest(s, base).isEmpty) {
        val orders = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        VersionedStore.commitWithStats(s, base,
          orders.repartitionByRange(16, col("o_orderkey")),
          statsCols = Seq("o_orderkey"))
      }
      val (kept, total) =
        VersionedStore.filesInRange(s, base, 0L, "o_orderkey", 1000L, 2999L)
      require(kept.nonEmpty && kept.size < total,
        s"zone map must prune files (kept ${kept.size} of $total)")
      VersionedStore.readSkipping(s, base, 0L, "o_orderkey", 1000L, 2999L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum("o_totalprice").as("sum_total"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
      GROUP BY 1 ORDER BY 1"""))

  /** M22: per-file BLOOM skipping — the point-lookup complement of
    * m21's zone maps. Hash-partitioned files have useless min/max
    * ranges (every file spans the whole key domain), but each file's
    * key-SET bloom prunes a point probe to the one owning file plus
    * false positives — parquet bloom filters / Delta's bloom index as
    * an explicit, oracle-checked operator. Three point lookups run
    * through readPoint; the in-query requires pin that each probe kept
    * strictly fewer files than the snapshot holds; the oracle is the
    * plain IN-list filter, so "bloom-pruned scan == full scan" is
    * hash-checked (false positives only ever ADD files, never rows —
    * the residual equality filter restores exactness). */
  val m22BloomSkipping = Q(
    "m22_bloom_skipping",
    (s, dir) => {
      import graft.sources.VersionedStore
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.sources.Bucketing.processRoot}/bloom_orders_$tag"
      if (VersionedStore.latest(s, base).isEmpty) {
        val orders = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        VersionedStore.commitWithStats(s, base,
          orders.repartition(16, col("o_orderkey")),
          statsCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
      }
      val keys = Seq(42L, 4242L, 7777L)
      keys.map { key =>
        val (kept, total) =
          VersionedStore.filesMaybeContaining(s, base, 0L, "o_orderkey", key)
        // an ABSENT key legally keeps zero files — maximum pruning
        require(kept.size < total,
          s"bloom must prune files for key $key (kept ${kept.size} of $total)")
        VersionedStore.readPoint(s, base, 0L, "o_orderkey", key)
      }.reduce(_.unionByName(_))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey IN (42, 4242, 7777)
      ORDER BY o_orderkey"""))

  /** M23: Z-ORDER MULTI-DIMENSIONAL skipping — m21 range-clusters on
    * ONE column, so only that column's predicates prune; this commit
    * lays the same table out on the Morton interleave of TWO dimensions
    * (sources.Layout.zValue over the order-day ordinal and a 128-dollar
    * price bucket, both scaled to 12-bit domains so neither dominates
    * the curve) and stages zone maps for BOTH. Each file then covers a
    * small day×price hyper-rectangle, and the SAME filesInRange call
    * prunes on EITHER dimension — Delta/Iceberg's `OPTIMIZE ZORDER BY`,
    * oracle-checked: one day-range arm and one price-range arm, each
    * required in-query to have skipped files, each hash-equal to the
    * plain filter over the original table. At 100 TB this is the
    * difference between one clustered column and every dashboard
    * filter being a partial scan. */
  val m23ZorderSkipping = Q(
    "m23_zorder_skipping",
    (s, dir) => {
      import graft.sources.{Layout, VersionedStore}
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.sources.Bucketing.processRoot}/zorder_orders_$tag"
      if (VersionedStore.latest(s, base).isEmpty) {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
            expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT)")
              .as("o_day"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
              " div 12800").as("o_price_b"))
        val cols = o.columns.toSeq
        val shaped = o
          .withColumn("__z",
            Layout.zValue(Seq(col("o_day"), col("o_price_b")), bits = 12))
          .repartitionByRange(32, col("__z"))
          .sortWithinPartitions("__z")
          .select(cols.map(col): _*)
        VersionedStore.commitWithStats(s, base, shaped,
          statsCols = Seq("o_day", "o_price_b"))
      }
      def arm(label: String, statCol: String, lo: Long, hi: Long) = {
        val (kept, total) =
          VersionedStore.filesInRange(s, base, 0L, statCol, lo, hi)
        require(kept.nonEmpty && kept.size < total,
          s"z-order zone map must prune on $statCol (kept ${kept.size} of $total)")
        VersionedStore.readSkipping(s, base, 0L, statCol, lo, hi)
          .agg(count(lit(1)).as("n_rows"), dsum("o_totalprice").as("sum_total"))
          .select(lit(label).as("dim"), col("n_rows"), col("sum_total"))
      }
      arm("day_slice", "o_day", 365L, 729L)
        .unionByName(arm("price_slice", "o_price_b", 100L, 300L))
        .orderBy("dim")
    },
    Some("""WITH o AS (
        SELECT o_totalprice,
          CAST(date_diff('day', DATE '1995-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS o_day,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 12800
            AS o_price_b
        FROM orders)
      SELECT 'day_slice' AS dim, count(*) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM o WHERE o_day BETWEEN 365 AND 729
      UNION ALL
      SELECT 'price_slice' AS dim, count(*) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM o WHERE o_price_b BETWEEN 100 AND 300
      ORDER BY dim"""))

  /** M24: HILBERT-CURVE skipping — m23's Morton twin on the BETTER
    * curve. The Morton interleave jumps across the grid at power-of-two
    * boundaries (cell 0b0111→0b1000 crosses half the key space), so a
    * range-partitioned file can straddle a jump and inherit a min/max
    * box covering both sides; the Hilbert walk
    * ([[graft.plans.HilbertIndex2]]) moves to a grid NEIGHBOR at every
    * step, so each file's curve range stays one compact blob and the
    * same zone-map probe keeps fewer files (the layout Databricks
    * liquid clustering adopted over Z-order). Identical commit/probe
    * machinery and slices as m23 — the oracle is the plain filter, so
    * the curve is pure layout: it can only change WHICH files are
    * read, never the rows. Both arms require in-query that files were
    * skipped; the measured Morton-vs-Hilbert kept-file counts are
    * recorded in BUILD_NOTES. */
  val m24HilbertSkipping = Q(
    "m24_hilbert_skipping",
    (s, dir) => {
      import graft.sources.VersionedStore
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.sources.Bucketing.processRoot}/hilbert_orders_$tag"
      if (VersionedStore.latest(s, base).isEmpty) {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
            expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT)")
              .as("o_day"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
              " div 12800").as("o_price_b"))
        val cols = o.columns.toSeq
        val shaped = o
          .withColumn("__h", graft.plans.HilbertIndex2.hilbert2(
            col("o_day"), col("o_price_b"), bits = 12))
          .repartitionByRange(32, col("__h"))
          .sortWithinPartitions("__h")
          .select(cols.map(col): _*)
        VersionedStore.commitWithStats(s, base, shaped,
          statsCols = Seq("o_day", "o_price_b"))
      }
      def arm(label: String, statCol: String, lo: Long, hi: Long) = {
        val (kept, total) =
          VersionedStore.filesInRange(s, base, 0L, statCol, lo, hi)
        require(kept.nonEmpty && kept.size < total,
          s"hilbert zone map must prune on $statCol (kept ${kept.size} of $total)")
        VersionedStore.readSkipping(s, base, 0L, statCol, lo, hi)
          .agg(count(lit(1)).as("n_rows"), dsum("o_totalprice").as("sum_total"))
          .select(lit(label).as("dim"), col("n_rows"), col("sum_total"))
      }
      arm("day_slice", "o_day", 365L, 729L)
        .unionByName(arm("price_slice", "o_price_b", 100L, 300L))
        .orderBy("dim")
    },
    Some("""WITH o AS (
        SELECT o_totalprice,
          CAST(date_diff('day', DATE '1995-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS o_day,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 12800
            AS o_price_b
        FROM orders)
      SELECT 'day_slice' AS dim, count(*) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM o WHERE o_day BETWEEN 365 AND 729
      UNION ALL
      SELECT 'price_slice' AS dim, count(*) AS n_rows,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      FROM o WHERE o_price_b BETWEEN 100 AND 300
      ORDER BY dim"""))

  val all: Seq[Q] = Seq(u1UnionDedup, u2DedupComposite, u4UnionDistinct,
    m1Upsert, m6ContactUpsert, m7KeyedUpdate, m10InsertIfAbsent,
    u6IntersectExcept, m9Delete, m11Scd2, m12UpsertEvolving,
    m13SnapshotDiff, m14IncrementalMv, m15MinMaxMv, m16MomentsMv,
    m17TimeTravel, m18SketchMv, m19Optimize, m20CdcVersions,
    m21DataSkipping, m22BloomSkipping, m23ZorderSkipping,
    m24HilbertSkipping)
}
