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
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(
        math.max(2, spark.sparkContext.defaultParallelism / 2), sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vi = sorted.schema.fieldIndex(valCol)
    val rdd = sorted.rdd
    val partTotals = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L; it.foreach(s += _.getLong(vi)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _).init
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+
      StructField(outName, LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = bc.value(i)
      it.map { r => s += r.getLong(vi); Row.fromSeq(r.toSeq :+ s) }
    }
    spark.createDataFrame(rows, schema)
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
