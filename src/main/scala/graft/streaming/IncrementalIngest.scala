package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Result row appended to the run-stats table (reference AutomationRun,
  * models.py:386-426; monitor semantics automation_monitoring.py:74-165). */
final case class RunStats(run_id: String, window_start: String,
    window_end: String, discovered: Long, inserted: Long, status: String)

/** The weekly scheduled ingest restated as a batch job
  * (SURVEY.md §2.10 T1-T5, §3.3; reference weekly_scheduler.py:253-425):
  * cron fires externally (Trigger.AvailableNow shape), the job takes a
  * look-back window over the source, drops already-ingested business
  * keys with an anti-join against the sink (exactly-once-per-key ACROSS
  * runs — re-running a window inserts nothing), appends the remainder,
  * and appends one stats row. Single writer per sink, like every
  * mutation here. */
object IncrementalIngest {

  def run(spark: SparkSession, source: DataFrame, tsCol: String,
      windowStart: String, windowEnd: String, keys: Seq[String],
      sinkDir: String, statsDir: String, runId: String): RunStats = {
    import spark.implicits._
    val stats =
      try {
        val discovered = source
          .filter(col(tsCol) >= lit(windowStart).cast("timestamp") &&
            col(tsCol) < lit(windowEnd).cast("timestamp"))
        val nDiscovered = discovered.count()
        val sinkPath = new org.apache.hadoop.fs.Path(sinkDir)
        val sinkFs = sinkPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fresh =
          if (sinkFs.exists(sinkPath))
            Merge.newOnly(discovered, spark.read.parquet(sinkDir), keys)
          else discovered
        val nFresh = fresh.count()
        fresh.write.mode(SaveMode.Append).parquet(sinkDir)
        RunStats(runId, windowStart, windowEnd, nDiscovered, nFresh, "completed")
      } catch {
        case e: Exception =>
          RunStats(runId, windowStart, windowEnd, 0L, 0L, s"failed: ${e.getMessage}")
      }
    Seq(stats).toDS().write.mode(SaveMode.Append).parquet(statsDir)
    stats
  }
}
