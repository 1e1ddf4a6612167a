package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance — keep a groupBy
  * (count, sum) view current under INSERTS and RETRACTIONS without
  * recomputing from the base table (the delta-propagation rule for
  * distributive aggregates: ΔV = agg(ΔB), V' = V ⊎ ΔV). The reference
  * maintains dashboard rollups by full re-query on every sync
  * (DatabaseConverter/database.py stats queries re-run per refresh);
  * at 100 TB the only sane shape is this one: the refresh cost is
  * ∝ |delta| + |view|, never ∝ |base|.
  *
  * Retractions are sign rows (signCol = −1), the classic Z-set /
  * multiset-algebra encoding: deletes and late-arriving corrections go
  * through the same path as inserts. A group whose count reaches zero
  * leaves the view (multiset semantics — the view is exactly
  * `groupBy(base ⊎ deltas)`); a group first seen in a delta enters it.
  * count(*) maintained this way is trivially exact; sum goes through
  * the DECIMAL(18,2) contract so maintained and recomputed totals are
  * bit-equal, not merely close (double addition would drift by
  * aggregation order). avg/ratio views derive at read time as
  * sum/count — derived columns are NOT maintained state.
  *
  * Scale shape: [[deltaAgg]] is one map-side-combined aggregate over
  * the delta only; [[applyDelta]] merges it into the view with a keyed
  * full-outer join — both sides already one-row-per-group. No step
  * touches the base table, and nothing here is driver-side.
  */
object MatView {

  private val Dec = DecimalType(18, 2)

  /** Build the initial view: one row per key group, (cnt, total). */
  def build(base: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(Dec)).cast(Dec).as("total"))

  /** Collapse a delta batch to one signed row per group: d_cnt =
    * Σ sign, d_total = Σ sign·value. A batch may freely mix inserts
    * (+1) and retractions (−1) of the same group — they combine here,
    * map-side, before any shuffle. */
  def deltaAgg(delta: DataFrame, keys: Seq[String], valueCol: String,
      signCol: String): DataFrame =
    delta.groupBy(keys.map(col): _*)
      .agg(sum(col(signCol).cast("long")).as("d_cnt"),
        sum(col(valueCol).cast(Dec) * col(signCol).cast(Dec)).cast(Dec)
          .as("d_total"))

  /** Merge a delta batch into the view. Exact contract (pinned by a
    * unit test over random interleavings): applyDelta(build(B), Δ) ==
    * build(B ⊎ Δ) — including groups born in Δ and groups Δ retracts
    * to zero. Retracting a row that was never inserted is the caller's
    * bug (counts go negative and the group is dropped like any other
    * non-positive group; garbage in, garbage out — same as SQL MERGE). */
  def applyDelta(mv: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String, signCol: String): DataFrame = {
    val d = deltaAgg(delta, keys, valueCol, signCol)
    val zero = lit(0).cast(Dec)
    mv.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("total"), zero) + coalesce(col("d_total"), zero))
          .cast(Dec).as("total")): _*)
      .filter(col("cnt") > 0)
  }

  // ---- min/max maintenance ------------------------------------------
  //
  // min/max are distributive but NOT invertible: an insert can only
  // tighten the extremum (vmin' = least(vmin, new)), but retracting the
  // row that HOLDS the extremum leaves no way to widen it from the view
  // alone — the second-smallest value was never retained. The standard
  // maintenance rule (same shape as DBSP / Materialize's MIN handling):
  // inserts fold in monotonically; a retraction that touches the
  // current extremum (r_min ≤ vmin or r_max ≥ vmax — conservative,
  // because equal values carry multiplicity) flags the GROUP for
  // recompute, and only flagged groups re-aggregate from the
  // already-updated base. Refresh cost: ∝ |delta| + |view| + (base rows
  // of the few touched-extremum groups), never ∝ |base| for count/sum
  // and only group-local for min/max.

  /** Build the min/max-carrying view: (keys, cnt, total, vmin, vmax). */
  def buildMinMax(base: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(Dec)).cast(Dec).as("total"),
        min(col(valueCol).cast(Dec)).as("vmin"),
        max(col(valueCol).cast(Dec)).as("vmax"))

  /** Merge a signed delta into a min/max view. `updatedBase` is the
    * base AFTER the delta is applied (the sink table the caller
    * maintains anyway — e.g. the foreachBatch upsert target); it is
    * read ONLY for groups whose retraction touched an extremum, via a
    * semi-join that prunes everything else. Contract (property-tested
    * like applyDelta): applyDeltaMinMax(buildMinMax(B), Δ, B ⊎ Δ) ==
    * buildMinMax(B ⊎ Δ). */
  def applyDeltaMinMax(mv: DataFrame, delta: DataFrame,
      updatedBase: DataFrame, keys: Seq[String], valueCol: String,
      signCol: String): DataFrame = {
    val v = col(valueCol).cast(Dec)
    val sign = col(signCol).cast("long")
    val d = delta.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("d_cnt"),
        sum(v * sign.cast(Dec)).cast(Dec).as("d_total"),
        min(when(sign > 0, v)).as("i_min"),
        max(when(sign > 0, v)).as("i_max"),
        min(when(sign < 0, v)).as("r_min"),
        max(when(sign < 0, v)).as("r_max"))
    val zero = lit(0).cast(Dec)
    // needRec: a retraction exists and could have removed the extremum
    // (≤/≥ because equal values have multiplicity; a null vmin means
    // the group is new this batch yet carries retractions — recompute
    // is the only safe answer there too).
    val merged = mv.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("total"), zero) + coalesce(col("d_total"), zero))
          .cast(Dec).as("total"),
        col("vmin"), col("vmax"), col("i_min"), col("i_max"),
        (col("r_min").isNotNull && (col("vmin").isNull ||
          col("r_min") <= col("vmin") || col("r_max") >= col("vmax")))
          .as("need_rec")): _*)
      .filter(col("cnt") > 0)
    val trig = merged.filter(col("need_rec")).select(keys.map(col): _*)
    val rec = updatedBase
      .join(broadcast(trig), keys, "left_semi")
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol).cast(Dec)).as("rec_min"),
        max(col(valueCol).cast(Dec)).as("rec_max"))
    merged.join(broadcast(rec), keys, "left_outer")
      .select(keys.map(col) ++ Seq(
        col("cnt"), col("total"),
        when(col("need_rec"), col("rec_min"))
          .otherwise(least(col("vmin"), col("i_min"))).as("vmin"),
        when(col("need_rec"), col("rec_max"))
          .otherwise(greatest(col("vmax"), col("i_max"))).as("vmax")): _*)
  }

  // ---- second moments (avg / variance) ------------------------------
  //
  // Like count/sum — and unlike min/max — the second moment IS
  // invertible under retraction: Σv² is a signed sum, so the same Z-set
  // delta rule maintains it with no recompute path. avg and variance
  // are DERIVED at read time from (cnt, total, total_sq); derived
  // columns are never maintained state. Σv² at DECIMAL(18,2)² needs
  // scale 4; DECIMAL(38,4) holds ~10^34 — exact for any realistic
  // group, so maintained == rebuilt is bit-equal, not merely close.

  private val DecSq = DecimalType(38, 4)

  /** Build the moments view: (keys, cnt, total, total_sq). */
  def buildMoments(base: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast(Dec)
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(v).cast(Dec).as("total"),
        sum((v * v).cast(DecSq)).cast(DecSq).as("total_sq"))
  }

  /** Merge a signed delta into a moments view — pure delta propagation,
    * same contract shape as [[applyDelta]]. */
  def applyDeltaMoments(mv: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String, signCol: String): DataFrame = {
    val v = col(valueCol).cast(Dec)
    val sign = col(signCol).cast("long")
    val d = delta.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("d_cnt"),
        sum(v * sign.cast(Dec)).cast(Dec).as("d_total"),
        sum(((v * v).cast(DecSq)) * sign.cast(DecSq)).cast(DecSq)
          .as("d_total_sq"))
    val zero = lit(0).cast(Dec)
    val zeroSq = lit(0).cast(DecSq)
    mv.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("total"), zero) + coalesce(col("d_total"), zero))
          .cast(Dec).as("total"),
        (coalesce(col("total_sq"), zeroSq) +
          coalesce(col("d_total_sq"), zeroSq)).cast(DecSq).as("total_sq")): _*)
      .filter(col("cnt") > 0)
  }

  /** Read-time derivation: avg and POPULATION variance from the
    * maintained moments, in an explicit IEEE double expression order
    * (sq/n − mean², clamped at 0 for the catastrophic-cancellation
    * residual) that an oracle can replay verbatim. */
  def momentsReadModel(view: DataFrame, keys: Seq[String]): DataFrame = {
    val n = col("cnt").cast("double")
    val mean = col("total").cast("double") / n
    val rawVar = col("total_sq").cast("double") / n - mean * mean
    view.select(keys.map(col) ++ Seq(
      col("cnt"),
      col("total").cast("double").as("total"),
      mean.as("avg_v"),
      greatest(rawVar, lit(0.0)).as("var_pop")): _*)
  }

  // ---- streaming integration ----------------------------------------

  /** foreachBatch body: fold one signed micro-batch into the parquet
    * view at `viewDir` (created on first batch). Same temp-dir-then-
    * rename swap as EventPipeline.mergeIntoTable — the view is both the
    * source and the sink of the merge, so overwrite-in-place would
    * truncate before the read runs. Redelivered batches are NOT
    * idempotent here (Z-set deltas add); exactly-once comes from the
    * streaming checkpoint, which is the foreachBatch contract
    * (batchId-keyed commit log). The view stays one-row-per-group, so
    * each refresh is ∝ |batch| + |view| — the reference re-runs its
    * dashboard rollup per sync (database.py:458-499); this is that
    * rollup maintained incrementally under live ingest. */
  def maintainBatch(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, viewDir: String, keys: Seq[String],
      valueCol: String, signCol: String): Unit = {
    val mv = readOr(spark, viewDir, build(batch.limit(0), keys, valueCol))
    swapWrite(spark, applyDelta(mv, batch, keys, valueCol, signCol), viewDir)
  }

  /** [[maintainBatch]] made IDEMPOTENT under at-least-once redelivery:
    * a Z-set delta applied twice double-counts, so the applied batchId
    * is recorded in a marker file INSIDE the view directory — the
    * swapWrite rename installs view-and-marker atomically, and a
    * redelivered batchId is a no-op. This closes the crash window the
    * plain form documents (foreachBatch CAN redeliver the last batch
    * after a crash between the sink write and the checkpoint commit;
    * sinks must be idempotent by batchId — the Structured Streaming
    * fault-tolerance contract). */
  def maintainBatchIdempotent(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, batchId: Long, viewDir: String, keys: Seq[String],
      valueCol: String, signCol: String): Unit = {
    val marker = new java.io.File(viewDir, "_applied_batch")
    val applied =
      if (marker.exists())
        new String(java.nio.file.Files.readAllBytes(marker.toPath)).trim.toLong
      else -1L
    if (batchId > applied) {
      val mv = readOr(spark, viewDir, build(batch.limit(0), keys, valueCol))
      val updated = applyDelta(mv, batch, keys, valueCol, signCol)
      // stage view + marker together, then one rename installs both
      val tmp = viewDir + ".tmp"
      updated.write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp, "_applied_batch"),
        batchId.toString.getBytes)
      val dst = new org.apache.hadoop.fs.Path(viewDir)
      val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(dst, true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    }
  }

  /** foreachBatch body maintaining the BASE TABLE and its min/max view
    * TOGETHER — the composition m15 runs in batch, under live ingest.
    * Batch rows carry a unique `rowId`: sign +1 inserts the row into
    * the base (upsert by rowId — redelivery-safe), sign −1 deletes it.
    * The base is written first, read back, and handed to
    * [[applyDeltaMinMax]] as the updated base for extremum recomputes.
    * Exactly-once comes from the streaming checkpoint; a crash BETWEEN
    * the base write and the view write leaves the view one batch
    * behind the base — the repair is rebuildMinMax-from-base (cheap:
    * one aggregate), the same restate-from-source contract as
    * Retrieval.repairStats. */
  def maintainBatchMinMax(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, baseDir: String, viewDir: String, rowId: String,
      keys: Seq[String], valueCol: String, signCol: String): Unit = {
    val rows = batch.drop(signCol)
    val inserts = batch.filter(col(signCol) > 0).drop(signCol)
    val deletes = batch.filter(col(signCol) < 0).select(col(rowId))
    val base0 = readOr(spark, baseDir, rows.limit(0))
    // delete-then-insert on rowId: an upsert that also serves retraction
    val newBase = base0
      .join(deletes.unionByName(inserts.select(col(rowId))).distinct(),
        Seq(rowId), "left_anti")
      .unionByName(inserts)
    swapWrite(spark, newBase, baseDir)
    val mv = readOr(spark, viewDir, buildMinMax(rows.limit(0), keys, valueCol))
    val updatedBase = spark.read.parquet(baseDir)
    swapWrite(spark,
      applyDeltaMinMax(mv, batch, updatedBase, keys, valueCol, signCol),
      viewDir)
  }

  private def readOr(spark: org.apache.spark.sql.SparkSession, dir: String,
      empty: => DataFrame): DataFrame = {
    val f = new java.io.File(dir)
    if (f.exists() && f.list().nonEmpty) spark.read.parquet(dir) else empty
  }

  /** Write via temp dir then rename: the source of every maintenance
    * merge is also its sink, and overwrite-in-place would truncate
    * before the read runs. */
  private def swapWrite(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, dir: String): Unit = {
    val tmp = dir + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
