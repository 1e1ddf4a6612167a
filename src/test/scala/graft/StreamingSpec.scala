package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{ClosedSession, Event, EventPipeline}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
    Event(2, ts("2024-01-01 00:10:00"), 1, "view", 2.0),
    Event(3, ts("2024-01-01 00:20:00"), 2, "click", 3.0))
  private val batch2 = Seq(
    Event(4, ts("2024-01-02 09:00:00"), 1, "error", 4.0),
    Event(5, ts("2024-01-02 09:30:00"), 2, "click", 5.0))

  test("streaming daily rollup over MemoryStream matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventPipeline.dailyRollup(mem.toDF())
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*)
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("rollup_out")
        .orderBy("day", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventPipeline.dailyRollup((batch1 ++ batch2).toDF())
        .orderBy("day", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(streamed == batch)
      assert(streamed.map(_._3).sum == 5)
    } finally q.stop()
  }

  test("streaming hopping rollup matches batch; events hit 2 windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventPipeline.hoppingRollup(mem.toDF())
      .writeStream.format("memory").queryName("hop_out")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*)
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("hop_out")
        .orderBy("win_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventPipeline.hoppingRollup((batch1 ++ batch2).toDF())
        .orderBy("win_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(streamed == batch)
      // 5 events × 2 overlapping windows each
      assert(streamed.map(_._3).sum == 10)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDF()
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      // re-deliver batch1 (at-least-once upstream) plus new events
      mem.addData(batch1: _*)
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L, 4L, 5L), s"duplicates survived: $ids")
    } finally q.stop()
  }

  test("stateful trackUsers accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventPipeline.trackUsers(spark, mem.toDS())
      .writeStream.format("memory").queryName("track_out")
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // last update per user wins
      val last = spark.table("track_out")
        .groupBy("user_id").agg(max(struct("n_events", "total_value", "last_type")).as("s"))
        .select("user_id", "s.*")
        .as[(Long, Long, Double, String)].collect()
        .map { case (u, n, v, t) => u -> ((n, v, t)) }.toMap
      assert(last(1L) == ((3L, 7.0, "error")))
      assert(last(2L) == ((2L, 8.0, "click")))
    } finally q.stop()
  }

  test("stream-static newOnly drops already-ingested keys") {
    implicit val sqlCtx = spark.sqlContext
    val existing = batch1.toDF()
    val mem = MemoryStream[Event]
    val q = EventPipeline.newOnly(mem.toDF(), existing)
      .writeStream.format("memory").queryName("newonly_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1 ++ batch2: _*) // batch1 keys already exist
      q.processAllAvailable()
      val got = spark.table("newonly_out").select("event_id")
        .as[Long].collect().toSet
      assert(got == Set(4L, 5L))
    } finally q.stop()
  }

  test("foreachBatch mergeIntoTable is idempotent per key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        EventPipeline.mergeIntoTable(spark, df, dir)
      }.start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch1: _*) // replay same keys — upsert, not duplicate
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = graft.sources.VersionedStore.readLatest(spark, dir)
      assert(got.count() == 5)
      assert(got.select("event_id").distinct().count() == 5)
    } finally q.stop()
  }

  test("MatView.maintainBatch maintains the view across micro-batches incl. retractions") {
    import graft.operators.MatView
    val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString + "/v"
    implicit val sqlCtx = spark.sqlContext
    // signed delta stream: (event_type, value, sign)
    val mem = MemoryStream[(String, Double, Int)]
    val q = mem.toDF().toDF("event_type", "value", "sign").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        MatView.maintainBatch(spark, df, dir, Seq("event_type"), "value", "sign")
      }.start()
    try {
      mem.addData(("click", 1.0, 1), ("click", 2.0, 1), ("view", 3.0, 1))
      q.processAllAvailable()
      mem.addData(("click", 2.0, -1), ("view", 4.0, 1)) // retract a click
      q.processAllAvailable()
      mem.addData(("view", 3.0, -1), ("view", 4.0, -1)) // view → zero, leaves
      q.processAllAvailable()
      val got = graft.sources.VersionedStore.readLatest(spark, dir)
        .select("event_type", "cnt", "total")
        .as[(String, Long, java.math.BigDecimal)].collect()
        .map(t => t._1 -> (t._2, t._3.doubleValue)).toMap
      // surviving multiset: click ×1 (value 1.0) — view retracted to zero
      assert(got == Map("click" -> (1L, 1.0)), s"view state was $got")
    } finally q.stop()
  }

  test("maintainBatchIdempotent: a redelivered batchId is a no-op") {
    import graft.operators.MatView
    val dir = java.nio.file.Files.createTempDirectory("graft_mvi").toString + "/v"
    val b0 = Seq(("click", 1.0, 1), ("click", 2.0, 1))
      .toDF("event_type", "value", "sign")
    val b1 = Seq(("click", 2.0, -1), ("view", 4.0, 1))
      .toDF("event_type", "value", "sign")
    def state() = graft.sources.VersionedStore.readLatest(spark, dir)
      .select("event_type", "cnt", "total")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(t => t._1 -> (t._2, t._3.doubleValue)).toMap
    MatView.maintainBatchIdempotent(spark, b0, 0L, dir, Seq("event_type"), "value", "sign")
    MatView.maintainBatchIdempotent(spark, b1, 1L, dir, Seq("event_type"), "value", "sign")
    val after = state()
    assert(after == Map("click" -> (1L, 1.0), "view" -> (1L, 4.0)), s"$after")
    // the crash-redelivery path: same batchId arrives again — no double count
    MatView.maintainBatchIdempotent(spark, b1, 1L, dir, Seq("event_type"), "value", "sign")
    assert(state() == after, "redelivered batch must not re-apply")
    // and a NEW batch still applies
    MatView.maintainBatchIdempotent(spark,
      Seq(("view", 4.0, -1)).toDF("event_type", "value", "sign"),
      2L, dir, Seq("event_type"), "value", "sign")
    assert(state() == Map("click" -> (1L, 1.0)))
  }

  test("maintainBatchMinMax keeps base+view consistent; retracting an extremum recomputes") {
    import graft.operators.MatView
    val root = java.nio.file.Files.createTempDirectory("graft_mvmm").toString
    val (baseDir, viewDir) = (root + "/base", root + "/view")
    implicit val sqlCtx = spark.sqlContext
    // signed keyed rows: (row_id, event_type, value, sign)
    val mem = MemoryStream[(Long, String, Double, Int)]
    val q = mem.toDF().toDF("row_id", "event_type", "value", "sign").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        MatView.maintainBatchMinMax(spark, df, baseDir, viewDir, "row_id",
          Seq("event_type"), "value", "sign")
      }.start()
    try {
      mem.addData((1L, "click", 5.0, 1), (2L, "click", 9.0, 1), (3L, "click", 7.0, 1))
      q.processAllAvailable()
      mem.addData((2L, "click", 9.0, -1)) // retract the MAX — forces recompute
      q.processAllAvailable()
      mem.addData((4L, "click", 1.0, 1)) // new min folds in monotonically
      q.processAllAvailable()
      val view = graft.sources.VersionedStore.readLatest(spark, viewDir)
        .select("event_type", "cnt", "vmin", "vmax")
        .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
        .collect().map(t => (t._1, t._2, t._3.doubleValue, t._4.doubleValue))
      assert(view.toSeq == Seq(("click", 3L, 1.0, 7.0)), s"view was ${view.toSeq}")
      // the maintained view must equal a rebuild from the maintained base
      val rebuilt = MatView.buildMinMax(
        graft.sources.VersionedStore.readLatest(spark, baseDir),
        Seq("event_type"), "value")
        .select("event_type", "cnt", "vmin", "vmax")
        .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
        .collect().map(t => (t._1, t._2, t._3.doubleValue, t._4.doubleValue))
      assert(view.toSeq == rebuilt.toSeq)
    } finally q.stop()
  }

  test("maintainBatchMinMaxIdempotent: redelivery no-ops; a half-applied batch completes the view") {
    import graft.operators.MatView
    import graft.sources.VersionedStore
    val root = java.nio.file.Files.createTempDirectory("graft_mvmmi").toString
    val (baseDir, viewDir) = (root + "/base", root + "/view")
    def df(rows: (Long, String, Double, Int)*) =
      rows.toDF("row_id", "event_type", "value", "sign")
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      MatView.maintainBatchMinMaxIdempotent(spark, b, id, baseDir, viewDir,
        "row_id", Seq("event_type"), "value", "sign")
    def viewState() = VersionedStore.readLatest(spark, viewDir)
      .select("event_type", "cnt", "vmin", "vmax")
      .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
      .collect().map(t => (t._1, t._2, t._3.doubleValue, t._4.doubleValue)).toSeq
    run(df((1L, "click", 5.0, 1), (2L, "click", 9.0, 1)), 0L)
    run(df((2L, "click", 9.0, -1), (3L, "click", 1.0, 1)), 1L) // retract the MAX
    val after = viewState()
    assert(after == Seq(("click", 2L, 1.0, 5.0)), s"$after")
    // wholesale redelivery of batch 1 — the round-9 verdict's bug was a
    // double-applied min/max delta here
    run(df((2L, "click", 9.0, -1), (3L, "click", 1.0, 1)), 1L)
    assert(viewState() == after, "redelivered batch must not re-apply")
    // crash BETWEEN the two commits: base applied batch 2, view did not.
    // The redelivered batch must skip the base (version number frozen)
    // and complete only the view — against the already-updated base.
    val b2 = df((4L, "click", 11.0, 1))
    MatView.applyBaseBatch(spark, b2, baseDir, "row_id", "sign",
      Map("_applied_batch" -> "2"))
    val baseVer = VersionedStore.latest(spark, baseDir)
    run(b2, 2L)
    assert(VersionedStore.latest(spark, baseDir) == baseVer,
      "already-applied base leg must not re-commit")
    val completed = viewState()
    assert(completed == Seq(("click", 3L, 1.0, 11.0)), s"$completed")
    // maintained view == rebuild from the maintained base, always
    val rebuilt = MatView.buildMinMax(
      VersionedStore.readLatest(spark, baseDir), Seq("event_type"), "value")
      .select("event_type", "cnt", "vmin", "vmax")
      .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
      .collect().map(t => (t._1, t._2, t._3.doubleValue, t._4.doubleValue)).toSeq
    assert(completed == rebuilt)
  }

  test("maintainBatchMinMaxTx: base and view install under ONE marker; redelivery no-ops") {
    import graft.operators.MatView
    import graft.sources.VersionedStore
    val store = java.nio.file.Files.createTempDirectory("graft_mvtx")
      .toString + "/s"
    def df(rows: (Long, String, Double, Int)*) =
      rows.toDF("row_id", "event_type", "value", "sign")
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      MatView.maintainBatchMinMaxTx(spark, b, id, store, "row_id",
        Seq("event_type"), "value", "sign")
    def view() = VersionedStore.readLatestTable(spark, store, "view")
      .select("event_type", "cnt", "vmin", "vmax")
      .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
      .collect().map(t => (t._1, t._2, t._3.doubleValue, t._4.doubleValue)).toSeq
    run(df((1L, "click", 5.0, 1), (2L, "click", 9.0, 1)), 0L)
    run(df((2L, "click", 9.0, -1), (3L, "click", 1.0, 1)), 1L)
    val after = view()
    assert(after == Seq(("click", 2L, 1.0, 5.0)), s"$after")
    // wholesale redelivery: ONE marker governs both tables, so there is
    // no per-store skew to repair — the batch is simply a no-op
    val verBefore = VersionedStore.latest(spark, store)
    run(df((2L, "click", 9.0, -1), (3L, "click", 1.0, 1)), 1L)
    assert(VersionedStore.latest(spark, store) == verBefore)
    assert(view() == after)
    // every committed version carries BOTH members (co-versioned by
    // construction), and the maintained view equals a rebuild from the
    // co-committed base
    VersionedStore.versions(spark, store).foreach { v =>
      assert(VersionedStore.readTable(spark, store, "base", v).count() >= 0)
      assert(VersionedStore.readTable(spark, store, "view", v).count() >= 0)
    }
    val rebuilt = MatView.buildMinMax(
      VersionedStore.readLatestTable(spark, store, "base"),
      Seq("event_type"), "value")
      .select("event_type", "cnt", "vmin", "vmax")
      .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
      .collect().map(t => (t._1, t._2, t._3.doubleValue, t._4.doubleValue)).toSeq
    assert(view() == rebuilt)
  }

  test("VersionedStore: crash between stage and commit leaves the old version servable") {
    import graft.sources.VersionedStore
    val dir = java.nio.file.Files.createTempDirectory("graft_vscrash").toString + "/t"
    VersionedStore.commit(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    def latestRows() = VersionedStore.readLatest(spark, dir)
      .as[(Long, String)].collect().toSet
    val before = latestRows()
    // CRASH SIM: the next version stages in full (snapshot + extras),
    // the marker create never happens — readers must keep serving v0
    VersionedStore.stageVersion(spark, dir, Seq((2L, "b")).toDF("id", "v"),
      Map("_applied_batch" -> "7"))
    assert(VersionedStore.latest(spark, dir).contains(0L),
      "uncommitted stage must not become latest")
    assert(latestRows() == before, "old version must keep serving")
    // recovery-time GC reclaims the orphan (v_1 has no marker) and
    // never touches committed versions
    assert(VersionedStore.gcStaged(spark, dir) == Seq(1L))
    assert(latestRows() == before, "GC must not touch committed versions")
    // the retry re-stages v_1 from scratch and commits
    val v = VersionedStore.commit(spark, dir, Seq((3L, "c")).toDF("id", "v"))
    assert(v == 1L)
    assert(latestRows() == Set((3L, "c")))
    // the committed version carries no stale extras from the orphan
    assert(VersionedStore.readExtra(spark, dir, 1L, "_applied_batch").isEmpty,
      "retry must not inherit the orphaned stage's marker files")
  }

  test("streaming dedup within watermark: in-window duplicates collapse to one emission") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventPipeline.dedupWithinWatermark(mem.toDF(), delayMinutes = 60)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      // at-least-once producer: the whole batch redelivers, plus an
      // intra-batch duplicate of event 2 — all within the 60 min window
      mem.addData(batch1 :+ batch1(1): _*)
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("event_id")
        .as[Long].collect().toSeq
      assert(got.sorted == batch1.map(_.event_id).sorted,
        s"each event_id must emit exactly once, got $got")
    } finally q.stop()
  }

  test("streaming sessionize closes sessions on gap arrival") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventPipeline.sessionizeStream(spark, mem.toDS(), gapMinutes = 240)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*) // user1: 00:00,00:10; user2: 00:20
      q.processAllAvailable()
      mem.addData(batch2: _*) // next day 09:00/09:30 — closes both sessions
      q.processAllAvailable()
      val closed = spark.table("sess_out")
        .as[ClosedSession].collect()
        .map(c => (c.user_id, c.n_events, c.session_start.toString)).toSet
      assert(closed == Set(
        (1L, 2L, "2024-01-01 00:00:00.0"),
        (2L, 1L, "2024-01-01 00:20:00.0")))
    } finally q.stop()
  }

  test("IncrementalIngest is exactly-once-per-key across re-runs") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val r1 = graft.streaming.IncrementalIngest.run(spark, src, "ts",
      "2024-01-01", "2024-01-08", Seq("event_id"),
      s"$base/sink", s"$base/stats", "run1")
    assert(r1.status == "completed" && r1.discovered > 0)
    assert(r1.inserted == r1.discovered)
    // same window again: everything already ingested
    val r2 = graft.streaming.IncrementalIngest.run(spark, src, "ts",
      "2024-01-01", "2024-01-08", Seq("event_id"),
      s"$base/sink", s"$base/stats", "run2")
    assert(r2.discovered == r1.discovered && r2.inserted == 0)
    // overlapping wider window: only the new days land
    val r3 = graft.streaming.IncrementalIngest.run(spark, src, "ts",
      "2024-01-01", "2024-01-15", Seq("event_id"),
      s"$base/sink", s"$base/stats", "run3")
    assert(r3.inserted == r3.discovered - r1.discovered)
    val sink = spark.read.parquet(s"$base/sink")
    assert(sink.count() == sink.select("event_id").distinct().count())
    assert(spark.read.parquet(s"$base/stats").count() == 3)
  }

  test("stream-stream interval join: clicks attributed to purchases within 1h") {
    // two independent watermarked streams joined on key + time range —
    // state on both sides is bounded by the watermark + interval bound,
    // which is what makes this shape viable on an unbounded stream.
    // Drives the registered operator (t13_interval_join's streaming
    // form) and pins batch parity + late-row drop.
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = EventPipeline.correlateWithin(
      clicks.toDS().toDF(), buys.toDS().toDF(),
      withinMinutes = 60, watermark = Some("2 hours"))
    val q = joined.writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    val cData = Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0),
      Event(2, ts("2024-01-01 10:30:00"), 2, "click", 0))
    val bData = Seq(Event(10, ts("2024-01-01 10:45:00"), 1, "purchase", 9.99),
      Event(11, ts("2024-01-01 12:30:00"), 2, "purchase", 5.0)) // outside 1h
    try {
      clicks.addData(cData: _*)
      buys.addData(bData: _*)
      q.processAllAvailable()
      val got = spark.table("attrib_out")
        .select("left_id", "right_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)),
        "only the purchase within the hour attributes")
      // batch parity: the identical code path on static frames
      val batch = EventPipeline.correlateWithin(
        cData.toDF(), bData.toDF(), withinMinutes = 60)
        .select("left_id", "right_id").as[(Long, Long)].collect().toSet
      assert(batch == got, "streaming end-state must equal the batch twin")
      // late-row drop: advance both watermarks past the fixture, then
      // deliver an old click/purchase pair that would otherwise match —
      // both sit below the watermark, so state never sees them
      clicks.addData(Event(3, ts("2024-01-02 00:00:00"), 7, "click", 0))
      buys.addData(Event(12, ts("2024-01-02 00:00:00"), 8, "purchase", 1.0))
      q.processAllAvailable()
      clicks.addData(Event(4, ts("2024-01-01 10:05:00"), 9, "click", 0))
      buys.addData(Event(13, ts("2024-01-01 10:20:00"), 9, "purchase", 2.0))
      q.processAllAvailable()
      val after = spark.table("attrib_out")
        .select("left_id", "right_id").as[(Long, Long)].collect().toSet
      assert(after == got, "rows below the watermark must be dropped, not matched")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: non-converting clicks emit on eviction") {
    // the outer twin of the attribution join: a click with no purchase
    // inside the hour must surface as (click, null) — but only AFTER the
    // watermark proves no match can still arrive; until then it stays in
    // state, emitted exactly once.
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = EventPipeline.correlateWithin(
      clicks.toDS().toDF(), buys.toDS().toDF(),
      withinMinutes = 60, watermark = Some("2 hours"), joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      clicks.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0),
        Event(2, ts("2024-01-01 10:30:00"), 2, "click", 0))
      buys.addData(Event(10, ts("2024-01-01 10:45:00"), 1, "purchase", 9.99))
      q.processAllAvailable()
      def rows() = spark.table("attrib_outer")
        .select("left_id", "right_id").as[(Long, Option[Long])].collect().toSet
      assert(rows() == Set((1L, Some(10L))),
        "before the watermark passes, the unmatched click must stay in state")
      // advance both watermarks well past click#2's eviction horizon
      clicks.addData(Event(3, ts("2024-01-01 18:00:00"), 7, "click", 0))
      buys.addData(Event(11, ts("2024-01-01 18:00:00"), 8, "purchase", 1.0))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows().contains((2L, None)),
        "the never-converting click must emit with a null match on eviction")
      assert(rows().count(_._1 == 2L) == 1, "evicted row emits exactly once")
    } finally q.stop()
  }

  test("streaming dedup: watermarked dropDuplicates suppresses redelivery") {
    // U1's streaming twin: exactly-once per event_id within the watermark
    // horizon, with state GC'd for ids older than the watermark.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDS()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch1: _*) // full redelivery of the same batch
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[Event].collect()
      assert(got.map(_.event_id).sorted.toSeq ==
        batch1.map(_.event_id).sorted.toSeq,
        "each event_id must survive exactly once")
    } finally q.stop()
  }

  test("T4: restart from checkpoint resumes without duplicate ingestion") {
    // crash-recovery semantics (reference weekly_scheduler.py:150-163):
    // the checkpoint records which source files were committed, so a
    // restarted query picks up ONLY files that arrived while it was down
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    def startQ() = spark.readStream
      .schema("event_id LONG, v LONG").parquet(src)
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("event_id", "v")
      .write.mode("append").parquet(src)
    val q1 = startQ()
    q1.processAllAvailable(); q1.stop() // "crash" after committing batch 0

    Seq((4L, 40L), (5L, 50L)).toDF("event_id", "v")
      .write.mode("append").parquet(src)
    val q2 = startQ() // fresh query instance, same checkpoint
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(sink).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L)),
      "restart must ingest only the files that arrived while down")
  }

  test("T1: Trigger.AvailableNow drains what exists, stops, re-fires clean") {
    // the cron-fired run shape (reference weekly_scheduler.py:74-95):
    // each firing processes everything available THEN terminates itself;
    // the checkpoint makes the next firing ingest only what arrived in
    // between — max_instances=1 falls out of one-query-per-checkpoint
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_avnow").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    def fire(): Unit = {
      val q = spark.readStream
        .schema("event_id LONG, v LONG").parquet(src)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      assert(q.awaitTermination(120000), "AvailableNow must self-terminate")
    }
    Seq((1L, 10L), (2L, 20L)).toDF("event_id", "v")
      .write.mode("append").parquet(src)
    fire()
    fire() // cron re-fire with nothing new: must be a no-op
    Seq((3L, 30L)).toDF("event_id", "v").write.mode("append").parquet(src)
    fire()
    val got = spark.read.parquet(sink).as[(Long, Long)].collect().toList
    assert(got.sorted == List((1L, 10L), (2L, 20L), (3L, 30L)),
      s"each firing ingests exactly the new arrivals once: $got")
  }

  test("CorpusStream: continuous curation drops cross-batch exact and near dups") {
    import graft.streaming.CorpusStream
    // varied shingle set so the near-dup's Jaccard stays high after a
    // one-word edit; leading stopwords pin langId = en
    val base = "the and of to " +
      (1 to 80).map(i => s"alpha$i beta$i").mkString(" ")
    val shuffled = ("the and of to " split " ").reverse.mkString(" ") + " " +
      (1 to 80).reverse.map(i => s"beta$i alpha$i").mkString(" ")
    val near = base.replace("alpha40", "gamma40")
    val other = "the and of to " +
      (1 to 80).map(i => s"delta$i epsilon$i").mkString(" ")
    val french = "le chat et la souris avec une des les amis du le la"

    val corpus = java.nio.file.Files
      .createTempDirectory("graft_corpus_stream").toString + "/corpus"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_corpus_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stats = scala.collection.mutable.ArrayBuffer.empty[CorpusStream.IngestStats]
    val q = CorpusStream.writer(mem.toDF().toDF("doc_id", "text"), corpus,
        onStats = stats += _)
      .option("checkpointLocation", ckpt).start()
    try {
      // batch 1: base kept; shuffled = same word bag (exact, in-batch);
      // french dropped by the language filter
      mem.addData((1L, base), (2L, shuffled), (3L, french))
      q.processAllAvailable()
      // batch 2: near ≈ base (near-dup vs STORED corpus); other kept
      mem.addData((10L, near), (11L, other))
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 11L), s"survivors: $kept")
    assert(stats.map(s => (s.dropped_filter, s.dropped_exact, s.dropped_near,
      s.kept)).toList == List((1L, 1L, 0L, 1L), (0L, 0L, 1L, 1L)), stats)
  }

  test("stored near-dup store: foreachBatch check+ingest loop equals batch-at-a-time") {
    import graft.operators.Dedup
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val seed = docs.filter(col("doc_id") % 10 =!= 0)
    val b1 = docs.filter(col("doc_id") % 20 === 0)
    val b2 = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    // baseline: two sequential batch-at-a-time passes, the second seeing
    // the first batch as part of "existing"
    val want1 = canon(Dedup.incrementalNearDups(seed, b1, "doc_id", "text"))
    val want2 = canon(Dedup.incrementalNearDups(seed.union(b1), b2, "doc_id", "text"))

    // streaming twin: each micro-batch checks against the STORE, then
    // ingests itself — the continuous-ingest cycle over the stored tables
    val tag = "streamspec_inc"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.cache()
        got ++= canon(Dedup.incrementalNearDupsStored(spark, seed, b,
          "doc_id", "text", tag = tag))
        Dedup.appendBatchToStore(spark, b, "doc_id", "text", tag = tag)
        b.unpersist(); ()
      }
      .start()
    try {
      mem.addData(b1.as[(Long, String)].collect().toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b2.as[(Long, String)].collect().toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == (want1 ++ want2),
      "streamed check+ingest must equal sequential batch-at-a-time passes" +
        s" (missing ${(want1 ++ want2) -- got}, extra ${got -- (want1 ++ want2)})")
    // cross-batch teeth: batch 2 must have matched at least one batch-1 doc
    val b1Ids = b1.select("doc_id").as[Long].collect().toSet
    assert(want2.exists(p => b1Ids(p._2)),
      "fixture must exercise batch-2-vs-batch-1 matches")
  }

  test("parseWithQuarantine routes bad payloads with reasons, batch and stream") {
    import graft.streaming.EventPipeline
    val payloads = Seq(
      """{"event_id": 1, "ts": "2025-01-01T00:00:00", "user_id": 7, "event_type": "click", "value": 1.5}""",
      """not json at all""",
      """{"ts": "2025-01-01T00:00:00", "user_id": 7, "event_type": "click", "value": 1.0}""",
      """{"event_id": 3, "user_id": 7, "event_type": "click", "value": 1.0}""",
      """{"event_id": 4, "ts": "2025-01-01T00:01:00", "user_id": 8, "event_type": "view", "value": 0.0}""")
    val (good, bad) = EventPipeline.parseWithQuarantine(
      payloads.toDF("payload"), "payload")
    assert(good.select("event_id").as[Long].collect().toSet == Set(1L, 4L))
    val reasons = bad.as[(String, String)].collect().toMap.values.toSet
    assert(reasons == Set("malformed_json", "missing_event_id", "missing_ts"),
      reasons)
    // the same split runs on a stream: both channels drain per micro-batch
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val (gs, bs) = EventPipeline.parseWithQuarantine(
      mem.toDF().toDF("payload"), "payload")
    val goodIds = scala.collection.mutable.Set.empty[Long]
    val badReasons = scala.collection.mutable.Set.empty[String]
    val q1 = gs.writeStream.foreachBatch {
      (b: org.apache.spark.sql.DataFrame, _: Long) =>
        goodIds ++= b.select("event_id").as[Long].collect(); ()
    }.start()
    val q2 = bs.writeStream.foreachBatch {
      (b: org.apache.spark.sql.DataFrame, _: Long) =>
        badReasons ++= b.select("reason").as[String].collect(); ()
    }.start()
    try {
      mem.addData(payloads: _*)
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }
    assert(goodIds == Set(1L, 4L))
    assert(badReasons == Set("malformed_json", "missing_event_id", "missing_ts"))
  }

  test("batch sessionize splits on gaps") {
    val events = (batch1 ++ batch2).toDF()
    val got = EventPipeline.sessionize(events, gapMinutes = 240)
      .select("user_id", "session_seq", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    // user 1: (e1,e2) then e4; user 2: e3 then e5
    assert(got == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L), (2L, 2L, 1L)))
  }

  test("live ANN indexing stream: vectors ingest per micro-batch, redelivery is a no-op") {
    import graft.operators.AnnIndex
    def vec(seed: Long) = (0 until 4).map(i => ((seed * 31 + i * 7) % 10).toFloat)
    // streamed ids avoid %8==0 so the from-scratch comparison index has
    // the identical centroid set (frozen geometry on both sides)
    val streamed = (20L to 34L).filter(_ % 8 != 0)
    val base = (0L until 20L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val tag = "annstream"
    AnnIndex.buildIndex(spark, base, "vec_id", "embedding", tag,
      seedStride = 8, spill = 2, buckets = 2)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val toVec = expr(
      "transform(sequence(0, 3), i -> CAST((vec_id * 31 + i * 7) % 10 AS FLOAT))")
    val query = mem.toDS().toDF("vec_id")
      .withColumn("embedding", toVec)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        AnnIndex.ingestNewVectors(spark, b, "vec_id", "embedding", tag); ()
      }.start()
    val (s1, s2) = streamed.splitAt(streamed.length / 2)
    try {
      mem.addData(s1: _*); query.processAllAvailable()
      mem.addData(s2: _*); query.processAllAvailable()
      mem.addData(s1: _*); query.processAllAvailable() // wholesale redelivery
    } finally query.stop()
    // no duplicate postings despite redelivery
    val post = spark.table(s"g_ann_post_$tag")
    assert(post.count() ==
      post.select("cell", "cand_id").distinct().count(),
      "redelivered vectors must not re-append")
    // served top-k equals a from-scratch index over base ∪ streamed
    val all = (base.as[(Long, Seq[Float])].collect().toSeq ++
      streamed.map(i => (i, vec(i)))).toDF("vec_id", "embedding")
    AnnIndex.buildIndex(spark, all, "vec_id", "embedding", s"${tag}_ref",
      seedStride = 8, spill = 2, buckets = 2)
    val qs = (100L to 102L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    def serve(t: String) = AnnIndex.serveTopK(spark, qs, "vec_id", "embedding",
        k = 3, nprobe = 4, tag = t)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(serve(tag) == serve(s"${tag}_ref"),
      "streamed index must equal a full rebuild despite redelivery")
  }

  test("live BM25 indexing stream: ingest per micro-batch, redelivery is a no-op") {
    import graft.operators.Retrieval
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, sf, "documents").cache()
    val tag = "streamspec_bm25"
    val q = Seq(1L -> Seq("spark", "join"), 2L -> Seq("hash", "scan"))
    // index the first 60% of the corpus, stream the rest in micro-batches
    Retrieval.bm25TopKStored(spark, docs.filter(col("doc_id") % 5 < 3),
      "doc_id", "text", q, 5, tag = tag).collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val query = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Retrieval.ingestNewDocs(spark, b, "doc_id", "text", tag); ()
      }.start()
    val tail = docs.filter(col("doc_id") % 5 >= 3)
      .select("doc_id", "text").as[(Long, String)].collect()
    val (b1, b2) = tail.splitAt(tail.length / 2)
    try {
      mem.addData(b1.toIndexedSeq: _*); query.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); query.processAllAvailable()
      // at-least-once source re-sends batch 1 wholesale
      mem.addData(b1.toIndexedSeq: _*); query.processAllAvailable()
    } finally query.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long)].collect().toSet
    val served = canon(Retrieval.bm25TopKStored(spark,
      sys.error("serving must not read the corpus"),
      "doc_id", "text", q, 5, tag = tag))
    // redelivery must not double-count postings or inflate stats: the
    // served results equal one clean rebuild over the full corpus
    assert(served == canon(Retrieval.bm25TopK(docs, "doc_id", "text", q, 5)),
      "streamed index must equal a full rebuild despite redelivery")
    docs.unpersist(); ()
  }

  test("E2E exactly-once: source → watermark dedup → tx-maintained view, across redelivery, retry, and restart") {
    // the full composition the pieces were built for, driven end to
    // end: a file source (at-least-once producer), evictable-state
    // streaming dedup (dropDuplicatesWithinWatermark), and the
    // single-marker transactional min/max view (maintainBatchMinMaxTx
    // on VersionedStore.commitAll) as the foreachBatch sink
    import graft.operators.MatView
    import graft.sources.VersionedStore
    val base = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val (src, ckpt, store) = (s"$base/src", s"$base/ckpt", s"$base/store")
    def startQ() = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE")
      .parquet(src)
      .transform(df => EventPipeline.dedupWithinWatermark(df, delayMinutes = 600))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        MatView.maintainBatchMinMaxTx(spark,
          b.select(col("event_id").as("row_id"), col("event_type"),
            col("value")).withColumn("sign", lit(1)),
          id, store, "row_id", Seq("event_type"), "value", "sign")
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def view() = VersionedStore.readLatestTable(spark, store, "view")
      .select("event_type", "cnt", "vmin", "vmax")
      .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
      .collect().map(t => (t._1, t._2, t._3.doubleValue, t._4.doubleValue))
      .toSet
    batch1.toDF().write.mode("append").parquet(src)
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      // at-least-once producer: batch1 redelivers WHOLESALE (inside the
      // watermark) alongside one genuinely new event — the dedup state
      // must swallow the three duplicates, the view must gain only id 6
      (batch1 :+ Event(6, ts("2024-01-01 00:40:00"), 2, "view", 6.0))
        .toDF().write.mode("append").parquet(src)
      q1.processAllAvailable()
    } finally q1.stop()
    val afterRedelivery = view()
    assert(afterRedelivery == Set(
      ("click", 2L, 1.0, 3.0), ("view", 2L, 2.0, 6.0)),
      s"redelivered duplicates must not reach the view: $afterRedelivery")
    // foreachBatch RETRY of an already-applied batch (the crash-replay
    // Structured Streaming actually performs): the one applied-marker
    // makes it a version-for-version no-op — even with garbage rows
    val verBefore = VersionedStore.latest(spark, store)
    MatView.maintainBatchMinMaxTx(spark,
      Seq((999L, "click", 99.0, 1)).toDF("row_id", "event_type", "value", "sign"),
      1L, store, "row_id", Seq("event_type"), "value", "sign")
    assert(VersionedStore.latest(spark, store) == verBefore &&
      view() == afterRedelivery,
      "replayed batch must be a transactional no-op")
    // RESTART: new data lands while the query is down; a fresh query on
    // the same checkpoint picks up exactly the delta
    batch2.toDF().write.mode("append").parquet(src)
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    val fin = view()
    assert(fin == Set(("click", 3L, 1.0, 5.0), ("view", 2L, 2.0, 6.0),
      ("error", 1L, 4.0, 4.0)), s"$fin")
    // and the maintained view still equals a rebuild from the
    // co-committed base — the invariant every path must preserve
    val rebuilt = MatView.buildMinMax(
      VersionedStore.readLatestTable(spark, store, "base"),
      Seq("event_type"), "value")
      .select("event_type", "cnt", "vmin", "vmax")
      .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
      .collect().map(t => (t._1, t._2, t._3.doubleValue, t._4.doubleValue))
      .toSet
    assert(fin == rebuilt, "maintained view must equal rebuild from base")
  }
}
