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
    val all =
      if (SparkEntry.benchQueries.nonEmpty) SparkEntry.benchQueries
      else SparkEntry.queries.keys.toSeq.sorted
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 times just the named queries;
    // "@scaling" selects the per-round sf1 scaling-gate subset
    val names = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some("@scaling") => SparkEntry.scalingQueries
      case Some(s) if s.trim.nonEmpty =>
        val want = s.split(",").map(_.trim).filter(_.nonEmpty).toSet
        all.filter(want) ++ want.filterNot(all.contains).toSeq.sorted
          .filter(SparkEntry.queries.contains)
      case _ => all
    }
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
    val timedPasses = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    var errors = Map.empty[String, String]
    // Host-load markers: a disturbed capture (concurrent sweep, another JVM
    // on the same box) must carry its own evidence. getSystemLoadAverage is
    // the 1-minute loadavg; on a 32-cpu box an idle capture reads well under
    // ncpus while a contended one reads at/above it.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()
    // Recording hygiene (round-13 lesson: an artifact captured under
    // loadavg 5 carried junk medians and a 3.7x pass spread while its
    // notes said "solo"): a loadavg above ncpus/8 at start means some
    // other work owns part of the box, so REFUSE to record unless the
    // caller explicitly overrides — a contaminated artifact poisons
    // every later round-over-round comparison. SPARK_GRAFT_ALLOW_LOAD=1
    // keeps the old behavior and stamps load_contaminated into the JSON
    // so the consumer can see the run was knowingly dirty.
    val ncpus = Runtime.getRuntime.availableProcessors
    val loadThreshold = ncpus / 8.0
    // The 1-minute loadavg is a TRAILING indicator: a just-finished
    // 32-thread stage (the sf1 gate runs two benches back to back)
    // leaves it elevated for ~a minute with the box actually idle. So
    // first WAIT for it to decay (bounded, default 5 min), and only
    // refuse if the load never clears — that distinguishes trailing
    // self-load from genuine concurrent work.
    val waitBudgetMs =
      sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_S", "300").toLong * 1000L
    val waitStart = System.currentTimeMillis()
    var load = loadStart
    while (load > loadThreshold &&
        System.currentTimeMillis() - waitStart < waitBudgetMs) {
      System.err.println(f"[bench] loadavg $load%.2f > $loadThreshold%.2f" +
        " — waiting for the box to quiesce")
      Thread.sleep(15000)
      load = loadAvg()
    }
    val loadContaminated = load > loadThreshold
    if (loadContaminated &&
        sys.env.getOrElse("SPARK_GRAFT_ALLOW_LOAD", "0") != "1") {
      System.err.println(f"[bench] REFUSING to record: loadavg " +
        f"$load%.2f > ncpus/8 = $loadThreshold%.2f after " +
        f"${waitBudgetMs / 1000}%d s. Quiesce the host or set " +
        "SPARK_GRAFT_ALLOW_LOAD=1 to record a marked-dirty run.")
      spark.stop()
      sys.exit(3)
    }
    if (loadContaminated)
      System.err.println(f"[bench] WARNING: recording under load " +
        f"(loadavg $load%.2f); artifact marked contaminated")
    val startedAtMs = System.currentTimeMillis()
    // One timed SAMPLE of a query = clearCache + unmeasured warm run + timed
    // run. The clearCache starts the sample from a cold data cache (several
    // queries .cache() shared stages — curation funnel, similarity codebooks
    // — so without it a timing depends on which earlier query populated or
    // evicted the shared cache; byte-identical code once swung 7x between
    // rounds). The warm run then repopulates exactly the caches this query's
    // own plan declares AND amortizes janino whole-stage-codegen compilation
    // (measured ~3 s compile vs ~1 s execute on the heavy queries at sf0.1 —
    // a fixed per-plan cost that is zero at 100 TB). The timed run measures
    // the engine: scan, shuffle, join, aggregate.
    def sample(name: String): Option[Double] = {
      // stderr marker so any engine warning between two markers is
      // attributable to one query without re-running
      System.err.println(s"[bench] sampling $name")
      spark.catalog.clearCache()
      // drop the previous sample's scratch registrations too, or the
      // registry holds a reference per query per pass for the whole run
      graft.operators.Scratch.releaseAll()
      def attempt(): Boolean =
        try { exec(name); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] FAILED $name: $e")
          if (!errors.contains(name)) errors += (name -> sanitize(e))
          false
        }
      if (!attempt()) None
      else {
        val t0 = System.nanoTime()
        if (attempt()) Some((System.nanoTime() - t0) / 1e9) else None
      }
    }
    // INTERLEAVED passes: the suite runs end-to-end timedPasses times
    // (pass 1 samples every query once, then pass 2, then pass 3) instead
    // of 3 back-to-back runs per query. Two rounds running, a sustained
    // host disturbance (concurrent sweep, GC storm) spanned all three
    // back-to-back runs of whichever queries it overlapped, defeating
    // min-of-runs and forcing a judge re-run to adjudicate. With passes
    // minutes apart, a disturbance window inflates one PASS of several
    // queries — visible as one bad column in the runs arrays — while each
    // query's min over passes still reaches an undisturbed sample.
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    // One UNTIMED warm-up pass over the whole suite before any timed
    // pass: round-9's pass_totals [73.7, 67.6, 46.1] showed pass 1 was
    // ~60% JVM warm-up (JIT of Spark's own code paths, shuffle/codegen
    // infrastructure, filesystem caches) even though every SAMPLE
    // already warm-runs its own query — per-query warm runs amortize
    // that query's codegen, not the JVM. Discarding one full pass makes
    // the timed passes mutually comparable, so per-query medians mean
    // something again and a disturbed pass is visible as the ONE
    // outlier column instead of hiding inside the warm-up gradient.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt > 0)
      names.foreach { name =>
        spark.catalog.clearCache()
        try exec(name)
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup FAILED $name: $e") }
      }
    // PER-PASS hygiene (round-14 lesson: the start-of-run load guard
    // passed a run whose MIDDLE was contended — pass totals
    // 306.8/207.3/290.5 s, a 1.48x spread, medians junk): each pass
    // stamps its own post-pass loadavg, and any pass whose total
    // exceeds 1.3x the best pass is DISTURBED — re-run while the
    // retry budget lasts, and excluded from min/median either way.
    // The artifact keeps the discarded totals so a dirty capture
    // stays self-evident instead of silently averaged in.
    final case class Pass(samples: Map[String, Double], total: Double,
        loadAfter: Double)
    def runPass(): Pass = {
      val ps = names.flatMap { name => sample(name).map(name -> _) }.toMap
      Pass(ps, ps.values.sum, loadAvg())
    }
    val spreadBar = 1.3
    var retries = sys.env.getOrElse("SPARK_GRAFT_PASS_RETRIES", "2").toInt
    val allPasses = scala.collection.mutable.ArrayBuffer.empty[Pass]
    def cleanCount: Int = {
      val minT = allPasses.map(_.total).min
      allPasses.count(_.total <= spreadBar * minT)
    }
    (1 to timedPasses).foreach(_ => allPasses += runPass())
    while (cleanCount < timedPasses && retries > 0) {
      val minT = allPasses.map(_.total).min
      System.err.println(f"[bench] ${timedPasses - cleanCount}%d pass(es) " +
        f"disturbed (> $spreadBar%.1fx the best ${minT}%.1f s) — re-running")
      retries -= 1
      allPasses += runPass()
    }
    val minTotal = allPasses.map(_.total).min
    val (kept, discarded) =
      allPasses.partition(_.total <= spreadBar * minTotal)
    if (discarded.nonEmpty)
      System.err.println(s"[bench] discarding ${discarded.size} disturbed " +
        s"pass(es) with totals ${discarded.map(_.total)} vs best $minTotal")
    kept.foreach { p =>
      p.samples.foreach { case (name, t) =>
        samples(name) = samples.getOrElse(name, Nil) :+ t }
    }
    val passTotals = kept.map(_.total).toSeq
    val results = names.map { name =>
      val times = samples.getOrElse(name, Nil)
      // min over passes is the headline statistic: it is the best available
      // lower bound on what the engine itself costs, and with interleaving
      // a sustained disturbance can no longer poison every sample of one
      // query. The median is still emitted for cross-checking spread.
      val min = if (times.isEmpty) -1.0 else times.min
      val median =
        if (times.isEmpty) -1.0 else times.sorted.apply(times.size / 2)
      (name, min, median, times)
    }
    // Self-diagnosing artifact: alongside each min/median, emit EVERY timed
    // sample (runs[name][i] = this query's time in pass i+1), per-pass suite
    // totals, and start/end host loadavg. A disturbed capture shows as one
    // inflated pass total + a vertical stripe in the runs arrays + loadavg
    // above idle — adjudicable with zero re-runs.
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
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val pt = passTotals.map(f4).mkString("[", ",", "]")
    val pl = kept.map(p => f4(p.loadAfter)).mkString("[", ",", "]")
    val dpt = discarded.map(p => f4(p.total)).mkString("[", ",", "]")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val totalMedian = results.filter(_._3 >= 0).map(_._3).sum
    val endedAtMs = System.currentTimeMillis()
    val loadEnd = loadAvg()
    // loadavg_at_launch = process start; loadavg_start = after the
    // quiesce wait, at record start (two fields — one value silently
    // changing meaning between rounds breaks artifact consumers)
    val loadFields = s""""loadavg_at_launch":${f4(loadStart)},"loadavg_start":${f4(load)},"loadavg_end":${f4(loadEnd)},"pass_loadavg":$pl,"discarded_pass_totals":$dpt"""
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","stat":"min_of_passes","total_median":$totalMedian,"queries":$qs,"medians":$ms,"runs":$rs,"pass_totals":$pt,"errors":$es,"sf":"$sfDir","started_at_ms":$startedAtMs,"ended_at_ms":$endedAtMs,$loadFields,"load_contaminated":$loadContaminated,"ncpus":$ncpus}"""
    println(fullJson)
    // The harness that invokes this main captures only the LAST ~2 KB of
    // stdout; at 90+ headline queries the full JSON line is ~9 KB, so the
    // per-query map was being truncated into unparseability every round.
    // Persist the complete artifact to a file, then end stdout with a
    // COMPACT line (<1 KB) that always survives the tail window whole —
    // totals, per-pass sums, errors, and the path to the full JSON.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      java.nio.file.Files.write(p, (fullJson + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full JSON written to ${p.toAbsolutePath}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: $e")
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","stat":"min_of_passes","total_median":$totalMedian,"nqueries":${names.size},"pass_totals":$pt,"errors":$es,"sf":"$sfDir","full_json":"$outPath","started_at_ms":$startedAtMs,"ended_at_ms":$endedAtMs,$loadFields,"load_contaminated":$loadContaminated,"ncpus":$ncpus}""")
    spark.stop()
  }
}
