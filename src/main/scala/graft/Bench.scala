package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{name:sec,...}}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("graft-bench", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (SparkEntry.benchQueries.nonEmpty) SparkEntry.benchQueries
      else SparkEntry.queries.keys.toSeq.sorted
    // Force FULL materialization of every output row: count() would let
    // Catalyst prune the projected expressions, so a projection-heavy
    // query would be timed as a row count. toRdd produces the final
    // UnsafeRows — every expression actually evaluates.
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
    // JSON-safe error text: exception messages embed plan trees with tabs/
    // control chars, which would break the consumer's json.load
    def sanitize(e: Throwable): String = e.toString.flatMap {
      case '"' | '\\' => " "
      case c if c < ' ' => " "
      case c => c.toString
    }.take(200)
    // Warm EACH query once before timing it: at sf0.1 a single cold run is
    // dominated by janino whole-stage-codegen compilation (measured ~3 s
    // compile vs ~1 s execute on the heavy queries) — a fixed per-plan cost
    // that amortizes to zero over a 100 TB scan. Then time THREE runs and
    // report the median: single timed runs swing ±20% with box noise
    // (GC, page cache), which previously made round-over-round totals
    // incomparable. The median measures the engine: scan, shuffle, join,
    // aggregate.
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    var errors = List.empty[(String, String)]
    // Host-load markers: a disturbed capture (concurrent sweep, another JVM
    // on the same box) must carry its own evidence. getSystemLoadAverage is
    // the 1-minute loadavg; on a 32-cpu box an idle capture reads well under
    // ncpus while a contended one reads at/above it.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()
    val startedAtMs = System.currentTimeMillis()
    val results = names.map { name =>
      def attempt(): Boolean =
        try { exec(name); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] FAILED $name: $e")
          errors ::= (name -> sanitize(e))
          false
        }
      // Start every query from a cold cache: several queries .cache()
      // shared stages (curation funnel, similarity codebooks), so without
      // this a query's timing depends on which earlier query populated or
      // evicted the shared cache — byte-identical code swung 7x between
      // rounds. The warm-up run then repopulates exactly the caches this
      // query's own plan declares, and the timed medians measure the
      // query with its own steady-state cache, independent of run order.
      spark.catalog.clearCache()
      val warmed = attempt()
      val times = (1 to timedRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        if (warmed && attempt()) Some((System.nanoTime() - t0) / 1e9) else None
      }
      // min is the headline statistic: round 6 proved a disturbance can
      // span ALL runs of one query (every j11 run inflated 10-25x), so the
      // median doesn't survive it — but the min of 3 runs is the best
      // available lower bound on what the engine itself costs. The median
      // is still emitted for cross-checking run-to-run spread.
      val min = if (times.isEmpty) -1.0 else times.min
      val median =
        if (times.isEmpty) -1.0 else times.sorted.apply(times.size / 2)
      (name, min, median, times)
    }
    // Self-diagnosing artifact: alongside each min/median, emit EVERY
    // timed run plus start/end host loadavg. A disturbed-box capture (GC
    // storm, concurrent sweep on the same host) shows up as wild run
    // arrays AND a loadavg far above idle — adjudicable with zero re-runs.
    // Locale.ROOT: a comma-decimal default locale would turn %.4f into
    // "1,2345" and corrupt the JSON line.
    def f4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f4(v) }
      .mkString("{", ",", "}")
    val ms = results.map { case (k, _, v, _) => "\"" + k + "\":" + f4(v) }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, _, _, ts) =>
      "\"" + k + "\":" + ts.map(f4).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val es = errors.reverse.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val totalMedian = results.filter(_._3 >= 0).map(_._3).sum
    val endedAtMs = System.currentTimeMillis()
    val loadEnd = loadAvg()
    println(s"""{"metric":"total","value":$total,"unit":"sec","stat":"min_of_runs","total_median":$totalMedian,"queries":$qs,"medians":$ms,"runs":$rs,"errors":$es,"sf":"$sfDir","started_at_ms":$startedAtMs,"ended_at_ms":$endedAtMs,"loadavg_start":${f4(loadStart)},"loadavg_end":${f4(loadEnd)},"ncpus":${Runtime.getRuntime.availableProcessors}}""")
    spark.stop()
  }
}
