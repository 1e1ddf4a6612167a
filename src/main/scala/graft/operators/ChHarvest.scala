package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental Companies House harvest — the reference's scheduled
  * company sync (api_clients.py:231-280 driven by the S8 month-chunk
  * pattern) rebuilt on the live-socket DSv2: each run scans ONLY
  * [watermark+1 day, upTo] via pushed `incorporated_from/to` params
  * (the server narrows; re-runs fetch the delta, not the corpus),
  * upserts by company_number into a parquet table, and advances the
  * persisted watermark — all under the store lease with the fence
  * check before the atomic swap, so a crashed or usurped run never
  * publishes and simply re-covers its window on retry (the upsert is
  * idempotent by business key).
  *
  * Scale shape: the HTTP scan parallelizes by date sub-ranges
  * (`splits`, the ChHttpSource cursor sharding); the upsert is one
  * anti-join on the high-cardinality business key; the watermark is
  * one tiny file. The delta frame is localCheckpoint-ed so the wire is
  * paid exactly once per run (count + merge reuse the materialized
  * rows, never re-paging the API). */
object ChHarvest {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readWatermark(spark: SparkSession, base: String): Option[String] = {
    val f = fs(spark, base)
    val p = new Path(s"$base/__watermark")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** Run one harvest window ending at `upTo` (inclusive ISO date).
    * Returns (rows fetched this run, watermark after the run). A
    * window already covered (watermark ≥ upTo) makes NO request. */
  def harvest(spark: SparkSession, url: String, base: String, upTo: String,
      splits: Int = 1, start: String = "2000-01-01",
      callsPerSec: Double = 2.0): (Long, String) = {
    val f = fs(spark, base)
    f.mkdirs(new Path(base))
    LeaseLock.withLease(f, new Path(s"$base/__lock"), s"ch harvest $base") {
      val prior = readWatermark(spark, base)
      val from = prior
        .map(w => java.time.LocalDate.parse(w).plusDays(1).toString)
        .getOrElse(start)
      if (from > upTo) (0L, prior.getOrElse(start))
      else {
        val delta = spark.read
          .format(classOf[graft.sources.v2.ChHttpTableProvider].getName)
          .option("url", url).option("splits", splits.toString)
          .option("calls_per_sec", callsPerSec.toString)
          .load()
          .filter(col("date_of_creation") >= from &&
            col("date_of_creation") <= upTo)
          .localCheckpoint() // the wire is paid here, exactly once
        val n = delta.count()
        val dataDir = s"$base/companies"
        val merged =
          if (!f.exists(new Path(dataDir))) delta
          else spark.read.parquet(dataDir)
            .join(delta.select("company_number"), Seq("company_number"),
              "left_anti")
            .unionByName(delta)
        val tmp = new Path(s"$dataDir.__tmp")
        merged.write.mode("overwrite").parquet(tmp.toString)
        LeaseLock.fenceCheck() // usurped ⇒ abort before the swap
        val dst = new Path(dataDir)
        if (f.exists(dst)) f.delete(dst, true)
        f.rename(tmp, dst)
        val o = f.create(new Path(s"$base/__watermark"), true)
        o.write(upTo.getBytes("UTF-8")); o.close()
        (n, upTo)
      }
    }
  }

  /** The harvested table (empty-schema error if never harvested). */
  def table(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(s"$base/companies")
}
