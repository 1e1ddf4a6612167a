package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Positional alignment without a single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` forces the whole relation through
  * one task; for dimension-sized inputs that is fine, but the general
  * zip operator must scale. This is the classic two-job shape: range
  * repartition + sort gives a globally ordered layout, `zipWithIndex`
  * counts each partition in a first pass and assigns contiguous global
  * indices with per-partition offsets in the second — no partition ever
  * holds more than its slice. (The same contract as the reference's
  * align-by-index result matching, api_clients.py:78-86.) */
object Align {

  /** `df` with a 1-based global `idx` column in `sortCols` order. The
    * sort keys must be unique for the index to be deterministic. */
  def zipWithGlobalIndex(df: DataFrame, idxName: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(
        math.max(2, spark.sparkContext.defaultParallelism / 2), sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idxName, LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rows, schema)
  }

  /** `df` with `outName` = the RUNNING SUM of `valCol` (a non-null
    * LONG column) in `sortCols` order — the distributed exact global
    * cumsum. Same two-job shape as [[zipWithGlobalIndex]]: range
    * repartition + in-partition sort lay the data out globally
    * ordered; a first bounded pass collects the per-partition totals
    * (∝ partition COUNT, never rows) whose scan-left gives each
    * partition's starting offset; the second pass emits in-partition
    * running sums shifted by the broadcast offset. No task ever holds
    * more than its slice — this replaces the
    * `sum() OVER (ORDER BY …)` single-task window wherever the input
    * is data-proportional. The one range shuffle is reused by both
    * jobs. Sort keys must be unique for determinism. */
  def prefixSum(df: DataFrame, valCol: String, outName: String,
      sortCols: Column*): DataFrame =
    prefixSums(df, Seq(valCol), Seq(outName), sortCols: _*)

  /** [[prefixSum]] over SEVERAL value columns in one pass: the range
    * shuffle, the bounded totals job and the emit job are all shared,
    * so k running sums cost one shuffle instead of k. */
  def prefixSums(df: DataFrame, valCols: Seq[String], outNames: Seq[String],
      sortCols: Column*): DataFrame = {
    require(valCols.nonEmpty && valCols.length == outNames.length,
      "one output name per value column")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(
        math.max(2, spark.sparkContext.defaultParallelism / 2), sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vis = valCols.map(sorted.schema.fieldIndex).toArray
    val k = vis.length
    val rdd = sorted.rdd
    val partTotals = rdd.mapPartitionsWithIndex { case (i, it) =>
      val s = new Array[Long](k)
      it.foreach { r =>
        var j = 0; while (j < k) { s(j) += r.getLong(vis(j)); j += 1 } }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(new Array[Long](k)) { (acc, t) =>
      Array.tabulate(k)(j => acc(j) + t(j))
    }.init
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields ++
      outNames.map(StructField(_, LongType, nullable = false)))
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      val s = bc.value(i).clone()
      it.map { r =>
        var j = 0; while (j < k) { s(j) += r.getLong(vis(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ s)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** PER-GROUP exact running sums with NO window anywhere — the
    * grouped twin of [[prefixSums]] (round-12 verdict #1: a window
    * partitioned by a constant-cardinality key sorts a data-
    * proportional relation inside as many tasks as the key has
    * values; at 100× that is a multi-billion-row single-task sort).
    * ONE range shuffle on (group ++ sortCols) lays the data out
    * globally ordered — every task holds only its range slice no
    * matter how few groups exist. Because each partition then sees
    * its groups as CONTIGUOUS SEGMENTS, the first bounded pass
    * collects one totals row per (partition, group segment) — ∝
    * partitions + groups, never rows — the driver scans them into
    * per-partition per-group starting offsets, and the second pass
    * (re-reading the same shuffle files) emits within-group running
    * sums seeded from the broadcast offsets. Contract: the offset map
    * is broadcast, so the number of DISTINCT GROUPS must be
    * broadcast-sized (the constant-domain keys this replaces have
    * 3–5). The contract is ENFORCED, not trusted (the budgetFill
    * lesson, Curation.budgetFill's bounded probe, applied here): a
    * COUNT-ONLY pre-pass sums per-partition segment counts — one long
    * per partition — and throws past `graft.align.maxSegments`
    * (session conf, default 2²¹ ≈ 2M driver entries) BEFORE the
    * driver materializes a single totals row. The bound is on the
    * TOTAL, not maxSegments ÷ partitions per partition:
    * repartitionByRange splits by ROWS, so a row-skewed frame can
    * legally concentrate many small groups into one partition, and a
    * per-partition quota would spuriously refuse an in-budget
    * workload. Each task still fail-fasts past the full budget as a
    * coarse executor-side backstop. A caller with a genuinely
    * high-cardinality group key should window by that key directly
    * (cardinality ∝ groups distributes fine) instead of a grouped
    * prefix sum. (group ++ sortCols) must be unique for determinism. */
  def groupedPrefixSums(df: DataFrame, groupCols: Seq[String],
      valCols: Seq[String], outNames: Seq[String],
      sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(groupCols.nonEmpty, "at least one group column")
    require(valCols.nonEmpty && valCols.length == outNames.length,
      "one output name per value column")
    val spark = df.sparkSession
    val gc = groupCols.map(col)
    val sorted = df.repartitionByRange(
        math.max(2, spark.sparkContext.defaultParallelism / 2),
        (gc ++ sortCols): _*)
      .sortWithinPartitions((gc ++ sortCols): _*)
    val gis = groupCols.map(sorted.schema.fieldIndex).toArray
    val vis = valCols.map(sorted.schema.fieldIndex).toArray
    val k = vis.length
    val rdd = sorted.rdd
    val maxSegments = spark.conf
      .getOption("graft.align.maxSegments").map(_.toLong)
      .getOrElse(1L << 21)
    def refuse(what: String): Nothing = throw new IllegalStateException(
      s"groupedPrefixSums: $what exceeds graft.align.maxSegments=" +
        s"$maxSegments group segments: the group key is not " +
        "broadcast-sized. Grouped prefix sums need a bounded group " +
        "domain — for a high-cardinality key, window PARTITION BY " +
        "that key directly (it distributes by cardinality) instead.")
    // count-only pre-pass: one long per partition crosses the wire; the
    // TOTAL is bounded driver-side before any totals row materializes.
    // (Bounding per-partition at maxSegments/partitions would spuriously
    // refuse a row-skewed frame whose range split concentrates many
    // small groups into one partition — the split is by rows.)
    val segCounts = rdd.mapPartitionsWithIndex { case (i, it) =>
      var cnt = 0L
      var cur: Seq[Any] = null
      it.foreach { r =>
        val g: Seq[Any] = gis.map(r.get).toSeq
        if (cur == null || g != cur) {
          cnt += 1
          if (cnt > maxSegments) refuse(s"partition $i alone")
          cur = g
        }
      }
      Iterator(cnt)
    }.collect()
    if (segCounts.sum > maxSegments)
      refuse(s"the frame's ${segCounts.sum} total (partition, group)")
    val segTotals = rdd.mapPartitionsWithIndex { case (i, it) =>
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Seq[Any], Array[Long])]
      var cur: Seq[Any] = null
      var s: Array[Long] = null
      it.foreach { r =>
        val g: Seq[Any] = gis.map(r.get).toSeq
        if (cur == null || g != cur) {
          // coarse executor-side backstop (the pre-pass already bounded
          // the total; this guards a data change between the two jobs)
          if (buf.size >= maxSegments) refuse(s"partition $i alone")
          cur = g; s = new Array[Long](k); buf += ((g, s))
        }
        var j = 0; while (j < k) { s(j) += r.getLong(vis(j)); j += 1 }
      }
      Iterator((i, buf.toArray))
    }.collect().sortBy(_._1).map(_._2)
    // driver scan ∝ partitions + groups: each (partition, group)'s
    // starting offset = the same group's totals in earlier partitions
    val running = scala.collection.mutable.Map.empty[Seq[Any], Array[Long]]
    val offs: Array[Map[Seq[Any], Array[Long]]] = segTotals.map { segs =>
      val m = segs.map { case (g, _) =>
        g -> running.getOrElse(g, new Array[Long](k)).clone()
      }.toMap
      segs.foreach { case (g, t) =>
        val acc = running.getOrElseUpdate(g, new Array[Long](k))
        var j = 0; while (j < k) { acc(j) += t(j); j += 1 }
      }
      m
    }
    val bc = spark.sparkContext.broadcast(offs)
    val schema = StructType(sorted.schema.fields ++
      outNames.map(StructField(_, LongType, nullable = false)))
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      val m = bc.value(i)
      var cur: Seq[Any] = null
      var s: Array[Long] = null
      it.map { r =>
        val g: Seq[Any] = gis.map(r.get).toSeq
        if (cur == null || g != cur) {
          cur = g
          s = m.getOrElse(g, new Array[Long](k)).clone()
        }
        var j = 0; while (j < k) { s(j) += r.getLong(vis(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ s)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Per-group 1-based row number in `sortCols` order without a
    * window: [[groupedPrefixSums]] over a constant-1 column. The
    * distributed replacement for
    * `row_number() OVER (PARTITION BY constantKey ORDER BY …)` on
    * data-proportional input. (group ++ sortCols) must be unique. */
  def groupedRowNumber(df: DataFrame, groupCols: Seq[String],
      idxName: String, sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.functions._
    groupedPrefixSums(df.withColumn("__one", lit(1L)), groupCols,
      Seq("__one"), Seq(idxName), sortCols: _*).drop("__one")
  }

  /** DOUBLED TIE-AVERAGED rank of `valueCol` within each group —
    * 2·avg_rank = 2·min_rank + tiecount − 1, the exact-integer form
    * the statistical suite (Spearman/Mann-Whitney) ranks with — with
    * NO window and no data-proportional task. Ranks depend only on
    * the DISTINCT (group, value) spine: aggregate tie counts there
    * (map-side combine), grouped-prefix-sum them in value order
    * (cum through v = max rank of v's tie group, so doubled rank =
    * 2·cum − t + 1), and join the spine back to the rows. Set
    * `broadcastBack` when the distinct spine is bounded (a value
    * domain, not data-proportional); otherwise the join shuffles on
    * the high-cardinality (group, value) key — well distributed by
    * construction. `tieName` also emits the tie count per row. */
  def groupedDoubledRank(df: DataFrame, groupCols: Seq[String],
      valueCol: String, outName: String, tieName: Option[String] = None,
      broadcastBack: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val keys = groupCols :+ valueCol
    val spine = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__t"))
    val cum = groupedPrefixSums(spine, groupCols, Seq("__t"), Seq("__ct"),
      col(valueCol))
    val ranked = cum.withColumn(outName, col("__ct") * 2 - col("__t") + 1)
    val back = ranked.select(keys.map(col) ++ (col(outName) +:
      tieName.map(t => col("__t").as(t)).toSeq): _*)
    df.join(if (broadcastBack) broadcast(back) else back, keys)
  }

  /** Deterministic epoch shuffle — the training loader's seeded
    * `.shuffle(seed = epoch)` at corpus scale: a reproducible global
    * permutation per epoch, position = rank of hash56(epoch ':' id)
    * with the id as tiebreak. Engine-independent (no rand(), so any
    * engine — and any re-run after a failure — deals the same order),
    * different per epoch, stable under repartitioning; the rank comes
    * from the range-sort + zipWithIndex shape above, never a
    * single-partition row_number window. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      posName: String = "shuffle_pos"): DataFrame = {
    import org.apache.spark.sql.functions._
    val h = Dedup.hash56(
      concat(lit(epoch.toString), lit(":"), col(idCol).cast("string")))
    zipWithGlobalIndex(df.withColumn("__h", h), posName,
      org.apache.spark.sql.functions.col("__h"), col(idCol))
      .drop("__h")
  }
}
