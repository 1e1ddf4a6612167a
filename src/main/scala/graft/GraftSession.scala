package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended scale configuration —
  * one place for the settings every entry point (Verify, Bench, jobs)
  * shares, so they can't drift.
  *
  * The values are local[N] test-box settings; the scaladoc per setting
  * says what changes on a real cluster. */
object GraftSession {

  /** @param cpus parallelism for local mode (driver boxes); on a cluster
    *             this is executor-provided and the master line is removed
    * @param shufflePartitions match total cores on the test box; at
    *             warehouse scale start at 2-3x total executor cores and
    *             let AQE coalesce (it only splits skew, never raises a
    *             too-low floor)
    */
  def build(appName: String = "graft", cpus: Int = 32,
      shufflePartitions: Option[Int] = None): SparkSession =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cpus).toString)
      // AQE: runtime coalescing, skew-join splitting, runtime re-plan
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // one ~20 MB parquet file would otherwise be a single input split —
      // small splits keep all local threads on the scan; on a cluster
      // leave the 128m default (files are many and large)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      // engines must agree on the session zone or timestamp comparisons
      // against the oracle drift by the host offset
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
