package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for (builder-brief custom
  * operators: as-of join, range join), each composed from built-ins in
  * its scale-correct shape rather than a naive non-equi join (which
  * Catalyst can only plan as a nested-loop product).
  */
object Temporal {

  /** AS-OF JOIN: for each left row, attach the payload of the latest
    * right row with the same key and `rightTs` <= `leftTs` (nulls when
    * none) — "the exchange rate in force", "the last checkpoint before
    * this example was generated".
    *
    * Shape: union the two sides tagged, one window per key ordered by
    * (ts, right-before-left), carry payloads forward with
    * last(ignoreNulls) over the growing frame, keep left rows. ONE
    * shuffle on the key — no non-equi join, no per-key driver loop, state
    * streams through the window operator.
    *
    * Right side must be unique per (keys, rightTs) — pre-aggregate if
    * not — or the carried payload at a tied timestamp is nondeterministic.
    *
    * @param payload right-side columns to carry (must not collide with
    *                left column names)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty, "payload names collide with left")
    // the payload travels as ONE struct per right row: last(ignoreNulls)
    // then skips left rows (null struct) but never a right row some of
    // whose FIELDS are null — per-column carry would resurrect an older
    // row's value for a field the latest row holds as NULL (and could
    // stitch fields from different rows), diverging from ASOF semantics
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__isR", lit(0))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(p =>
          org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))))
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(1).as("__isR"),
        struct(payload.map(col): _*).as("__p")): _*)
      .withColumns(leftCols.filterNot(keys.contains).map(c =>
        c -> lit(null).cast(left.schema(c).dataType)).toMap)
    // right rows sort BEFORE left rows at equal ts: asof is `<=`
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(l.columns.map(col).toIndexedSeq: _*))
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)
  }

  /** NEAREST-event CANDIDATES: for each left row, BOTH the latest ≤
    * right row (payload as `b_*`) and the earliest ≥ right row
    * (payload as `f_*`) with the same key. This function does NOT pick
    * a winner — arbitration is the caller's step via
    * [[nearerBackward]] (as t24_nearest_join does), or use
    * [[nearestJoinResolved]] for the folded single-payload form.
    *
    * Shape: two asof passes — the backward one as-is, the forward one
    * on the NEGATED microsecond axis (earliest ≥ left == latest ≤ left
    * after time reversal). Both passes are the one-shuffle window
    * form. Same precondition as asof: right unique per
    * (keys, rightTs). */
  def nearestJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    // backward pass, payload renamed b_*
    val backRenamed = payload.foldLeft(
      asofJoin(left, right, keys, leftTs, rightTs, payload)) {
      case (df, p) => df.withColumnRenamed(p, s"b_$p")
    }
    // forward pass on the reversed axis, payload renamed f_*
    val lNeg = backRenamed.withColumn("__lneg", -unix_micros(col(leftTs)))
    val rNeg = right.withColumn("__rneg", -unix_micros(col(rightTs)))
    val both = asofJoin(lNeg, rNeg, keys, "__lneg", "__rneg", payload)
    payload.foldLeft(both) {
      case (df, p) => df.withColumnRenamed(p, s"f_$p")
    }.drop("__lneg")
  }

  /** [[nearestJoin]] with the arbitration FOLDED IN: one payload set
    * (the winning side's, plain names), plus `nearest_delta_us` — the
    * exact |rightTs − leftTs| micros of the chosen row (null when no
    * candidate exists on either side). `rightTs` is always carried in
    * the payload: the arbitration needs each side's event time, and
    * callers almost always want it anyway. Ties go BACKWARD, matching
    * [[nearerBackward]]. */
  def nearestJoinResolved(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      payload: Seq[String]): DataFrame = {
    val pay = if (payload.contains(rightTs)) payload else payload :+ rightTs
    val both = nearestJoin(left, right, keys, leftTs, rightTs, pay)
    val useB =
      nearerBackward(col(leftTs), col(s"b_$rightTs"), col(s"f_$rightTs"))
    val resolved = pay.foldLeft(both) { case (df, p) =>
      df.withColumn(p, when(useB, col(s"b_$p")).otherwise(col(s"f_$p")))
    }
    resolved
      .withColumn("nearest_delta_us",
        when(col(rightTs).isNotNull,
          abs(unix_micros(col(rightTs)) - unix_micros(col(leftTs)))))
      .drop(pay.flatMap(p => Seq(s"b_$p", s"f_$p")): _*)
  }

  /** [[nearestJoin]] arbitration helper: given the b_/f_ payload twins
    * and the timestamp columns carrying each side's event time, emit
    * `useBackward` — true when the backward candidate is at least as
    * close (exact integer micros; null sides lose). */
  def nearerBackward(leftTs: Column, backTs: Column, fwdTs: Column): Column = {
    val db = unix_micros(leftTs) - unix_micros(backTs)
    val df = unix_micros(fwdTs) - unix_micros(leftTs)
    when(backTs.isNull, lit(false))
      .otherwise(fwdTs.isNull || db <= df)
  }

  /** RANGE (interval) JOIN: points joined to the intervals containing
    * them, `start <= ts <= end`. A naive non-equi join is a cartesian
    * nested loop; here both sides are bucketed into fixed-width time bins
    * (intervals explode to every bin they overlap), the join is an
    * equi-join on the bin, and the containment predicate filters inside
    * each bucket — the standard scale shape for interval overlap.
    *
    * `binSeconds` should be on the order of the typical interval length:
    * too small explodes interval rows, too large degrades bucket
    * selectivity. Column names must not collide across the two sides. */
  def rangeJoin(points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0)
    val binUs = binSeconds * 1000000L
    val p = points.withColumn("__bin",
      floor(unix_micros(col(pointTs)) / binUs))
    val iv = intervals.withColumn("__bin", explode(sequence(
      floor(unix_micros(col(startCol)) / binUs),
      floor(unix_micros(col(endCol)) / binUs))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bin")
  }

  /** INTERVAL-OVERLAP JOIN: pairs of intervals that overlap,
    * `lStart <= rEnd AND rStart <= lEnd` (closed ends) — sessions ×
    * incident windows, ad flights × user visits. The naive non-equi
    * join is a nested-loop product; here BOTH sides explode into the
    * fixed-width bins they cover and the join is an equi-join on bin.
    *
    * A pair overlapping n shared bins would surface n times; instead of
    * a distinct shuffle, each pair is kept ONLY in the first bin both
    * cover — `bin == greatest(floor(lStart), floor(rStart))`, a
    * row-local predicate — so the output is exactly-once with no extra
    * exchange. `binSeconds` ~ the typical interval length (same trade
    * as [[rangeJoin]]). Column names must not collide across sides;
    * intervals with start > end are the caller's bug (they match
    * nothing in either engine). */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0)
    val binUs = binSeconds * 1000000L
    def binned(df: DataFrame, s: String, e: String, b0: String) =
      df.withColumn(b0, floor(unix_micros(col(s)) / binUs))
        .withColumn("__bin", explode(sequence(col(b0),
          floor(unix_micros(col(e)) / binUs))))
    val l = binned(left, lStart, lEnd, "__lb0")
    val r = binned(right, rStart, rEnd, "__rb0")
    l.join(r, Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(col("__lb0"), col("__rb0")))
      .drop("__bin", "__lb0", "__rb0")
  }

  /** Calendar gap-fill / resample: complete each key's daily series from
    * its first to its last active day (reference weekly_scheduler.py
    * month-chunk iteration renders continuous ranges; dashboards need
    * zero rows for silent days, not missing rows). `zeroFill` columns
    * get 0 on gap days; each `ffill` column gains a `<col>_filled` twin
    * carrying the last non-null value forward (NULL before the first
    * observation — no fabricated leading values).
    *
    * Scale shape: the spine is per-key min/max (one partial-agg
    * shuffle) exploded row-locally — spine size is keys × days, never a
    * cross join against a global calendar; the fill join is an
    * equi-join on (key, day); the forward-fill window is PARTITIONED by
    * key (the PlanAudit rule — no global window ever). */
  def gapFillDaily(daily: DataFrame, keyCol: String, dayCol: String,
      zeroFill: Seq[String], ffill: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__d0"), max(col(dayCol)).as("__d1"))
      .select(col(keyCol), explode(sequence(col("__d0"), col("__d1"),
        expr("INTERVAL 1 DAY"))).as(dayCol))
    val joined = spine.join(daily, Seq(keyCol, dayCol), "left_outer")
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zf = zeroFill.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))))
    ffill.foldLeft(zf)((d, c) =>
      d.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w)))
  }
}
