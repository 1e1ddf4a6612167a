package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.{EtlJob, ExternalLookup, Flatten, Merge}
import graft.sources.Sources

class SourcesEtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Shards.writeWithManifest: shard count, row conservation, verifiable manifest") {
    import graft.sources.Shards
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val df = (1L to 1000L).toDF("id").withColumn("payload",
      concat(lit("row"), col("id")))
    val man = Shards.writeWithManifest(df, dir, "id", 8).cache()
    try {
      assert(man.count() == 8, "one manifest row per shard file")
      assert(Shards.verifyManifest(man, 1000L))
      assert(!Shards.verifyManifest(man, 999L),
        "row-total mismatch must fail verification")
      // manifest rows must equal the data re-read (trust nothing)
      assert(spark.read.parquet(dir).count() == 1000L)
    } finally man.unpersist()
  }

  test("Layout.zValue interleaves bits; writeZOrdered bounds both dims per file") {
    import graft.sources.Layout
    // exact Morton weave: x=5 (101), y=3 (011), 3 bits →
    // x bits at even positions, y at odd: 1+2+8+16 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].head()
    assert(z == 27L)

    // full 256×256 grid, one row per cell, 16 z-range files: every file
    // must cover a small rectangle of BOTH dimensions (a single-column
    // sort would span the full 0..255 in the other dimension)
    val grid = spark.range(0, 1 << 16).select(
      (col("id") % 256).as("user"), expr("id DIV 256").as("day"))
    val dir = Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(grid, dir, Seq(col("user"), col("day")),
      bits = 8, numFiles = 16)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("user") - min("user")).as("su"), (max("day") - min("day")).as("sd"))
      .select("su", "sd").as[(Long, Long)].collect().toSeq
    assert(spans.size == 16)
    // aligned partitioning would give exact 64×64 blocks; sampled range
    // boundaries straddle curve discontinuities, so a stray file may span
    // a full dimension — but the LAYOUT holds if nearly all files stay
    // within a couple of aligned blocks in BOTH dims (a single-column
    // sort would put ~255 in the other dim for every file)
    val tight = spans.count { case (su, sd) => su <= 128 && sd <= 128 }
    assert(tight >= 14, s"z-locality lost: $spans")
  }

  test("writeZOrdered prunes files on the NON-leading dimension; linear sort doesn't") {
    import graft.sources.Layout
    // real events: dims (day-of-year, user bucket); predicate on the
    // SECOND dim only. A file can be skipped when its [min,max] bucket
    // range excludes the predicate — the exact footer-stats decision
    // engines make (Delta/Iceberg data skipping, parquet row-group
    // pruning). files-read < files-written is the pruning proof the
    // plain one-column sort below fails.
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(dayofyear(col("ts")).cast("long").as("day"),
        pmod(col("user_id"), lit(64)).cast("long").as("bucket"),
        col("value"))
    def candidates(dir: String): (Long, Long) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("bucket").as("lo"), max("bucket").as("hi"))
        .select("lo", "hi").as[(Long, Long)].collect().toSeq
      (perFile.size.toLong, perFile.count { case (lo, hi) => lo <= 7 && 7 <= hi }.toLong)
    }
    val zDir = Files.createTempDirectory("graft_zprune").toString
    Layout.writeZOrdered(ev, zDir, Seq(col("day"), col("bucket")),
      bits = 9, numFiles = 16)
    val (zFiles, zRead) = candidates(zDir)
    assert(zFiles == 16)
    assert(zRead <= zFiles / 2,
      s"z-order failed to prune the second dim: $zRead of $zFiles files match")
    // contrast: range-sorted by day alone — bucket stats span the whole
    // domain in every file, so the same predicate prunes ~nothing
    val sDir = Files.createTempDirectory("graft_sprune").toString
    ev.repartitionByRange(16, col("day")).sortWithinPartitions("day")
      .write.mode("overwrite").parquet(sDir)
    val (sFiles, sRead) = candidates(sDir)
    assert(sRead >= sFiles - 2,
      s"unexpected: linear layout pruned the second dim ($sRead of $sFiles)")
    // and the z-layout round-trips: filtered count matches the source
    val want = ev.filter(col("bucket") === 7).count()
    assert(spark.read.parquet(zDir).filter(col("bucket") === 7).count() == want)
  }

  test("S1-S2 domain slice: lender CSV -> normalize -> upsert -> tier -> export") {
    // FIXTURES.md §1 example row + one chargeless row
    val csv =
      """CompanyNumber,CompanyName,RegisteredOffice,LatestChargeID,LatestChargeStatus,LatestChargeRegisteredDate,PersonsEntitled,Officers
        |15434477,007 INVESTMENTS LTD,"1386 London Road, Leigh On Sea, Essex, SS9 2UJ, England",,outstanding,08/05/2024,Lendco Limited,"COOPER, Neil (secretary, 2024-01-23); COOPER, Neil John (director, 2024-01-23)"
        |1234567,ACME BUILDERS LIMITED,"2 Low Rd, York",,,,,""".stripMargin
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/lender.csv"), csv)

    val raw = Sources.readCsv(spark, s"$dir/lender.csv", Sources.LenderCsvSchema)
    // normalize: zfill(8) company number (app.py:2078), tier rule
    // charges => "Lender (No Contact)" else raw (weekly_scheduler.py:915-918)
    val normalized = raw.select(
      lpad(col("CompanyNumber"), 8, "0").as("company_number"),
      col("CompanyName").as("company_name"),
      TextFunctions.removeCompanySuffixes(col("CompanyName")).as("base_name"),
      when(col("LatestChargeStatus").isNotNull, "Lender (No Contact)")
        .otherwise("Sic 41100 (Raw Data)").as("data_tier"),
      graft.functions.DateFunctions.parseUkDate(col("LatestChargeRegisteredDate"))
        .as("charge_date"))
    val rows = normalized.orderBy("company_number").collect()
    assert(rows(0).getString(0) == "01234567") // zero-padded
    assert(rows(1).getString(0) == "15434477")
    assert(rows(1).getString(2) == "007 INVESTMENTS")
    assert(rows(1).getString(3) == "Lender (No Contact)")
    assert(rows(0).getString(3) == "Sic 41100 (Raw Data)")
    assert(rows(1).getDate(4).toString == "2024-05-08") // dd/MM/yyyy parsed

    // upsert into an existing companies table on the business key
    val existing = Seq(("15434477", "OLD NAME LTD", "old", "old", null: java.sql.Date))
      .toDF(normalized.columns: _*)
    val merged = Merge.upsert(existing, normalized, Seq("company_number"))
    assert(merged.count() == 2) // existing key collides with an update
    assert(merged.filter($"company_number" === "15434477")
      .select("company_name").as[String].collect().head == "007 INVESTMENTS LTD")

    // export
    Sources.writeCsv(merged, s"$dir/out")
    val back = spark.read.option("header", "true").csv(s"$dir/out")
    assert(back.count() == 2)
  }

  test("ExternalLookup.lookupJoin enriches rows with rate limiting and retry") {
    val df = (1 to 6).map(i => (i.toLong, s"key$i")).toDF("id", "key")
      .repartition(1)
    val out = ExternalLookup.lookupJoin(df, "key",
      k => if (k == "key3") None else Some(k.toUpperCase),
      callsPerSec = 200.0, burst = 2.0, maxRetries = 2)
    val got = out.select("key", "lookup_value").as[(String, String)]
      .collect().toMap
    assert(got("key1") == "KEY1")
    assert(got("key3") == null)
    assert(got.size == 6)
  }

  test("ExternalLookup retries transient failures") {
    // fails on first call per key, succeeds on retry — counter must be
    // static so it lives in the executor (same JVM in local mode)
    FlakyService.calls.clear()
    val df = Seq(("a", 1)).toDF("key", "x").repartition(1)
    val out = ExternalLookup.lookupJoin(df, "key", FlakyService.call,
      maxRetries = 2)
    assert(out.select("lookup_value").as[String].collect().head == "A")
    assert(FlakyService.calls.get("a") == 2) // one failure + one success
  }

  test("TokenBucket enforces the sustained rate after the burst drains") {
    // deterministic clock: no sleeps, no wall-clock flake
    var now = 0L
    val b = new ExternalLookup.TokenBucket(3.0, 10.0, () => now) // 10/sec, burst 3
    assert((1 to 3).map(_ => b.acquireDelayMs()).forall(_ == 0L)) // burst absorbed
    assert(b.acquireDelayMs() == 100L) // next token is 100ms away at 10/sec
    assert(b.acquireDelayMs() == 200L) // queueing debt accumulates
    now += 1000 // a second later the bucket refilled (capped at capacity)
    assert(b.acquireDelayMs() == 0L)
  }

  test("ExternalLookup honors the service's Retry-After, then gives up") {
    ThrottledService.calls.set(0)
    val df = Seq(("k", 1)).toDF("key", "x").repartition(1)
    val out = ExternalLookup.lookupJoin(df, "key", ThrottledService.call,
      maxRetries = 2)
    assert(out.select("lookup_value").as[String].collect().head == "OK")
    assert(ThrottledService.calls.get() == 2) // one 429 + one success
    // budget exhausted -> the RetryAfter surfaces
    ThrottledService.calls.set(0)
    val always = ExternalLookup.lookupJoin(df, "key",
      _ => throw ExternalLookup.RetryAfter(1L), maxRetries = 1)
    val e = intercept[org.apache.spark.SparkException] {
      always.collect()
    }
    assert(e.getMessage.contains("retry after") ||
      Option(e.getCause).exists(_.toString.contains("retry after")))
  }

  test("lookupJoin fleet contract: 4 partitions × 2 rps with injected 429s — rate ≤ budget, zero lost rows") {
    // The reference's 600-req/5-min budget (api_clients.py:118-119) as an
    // executable spec at test timescale: the FLEET budget is
    // partitions × callsPerSec, and a throttling service must cost
    // retries, never rows.
    PacedService.reset()
    val rows = 24
    val df = (1 to rows).map(i => (i.toLong, s"k$i")).toDF("id", "key")
      .repartition(4)
    val t0 = System.nanoTime()
    val got = ExternalLookup.lookupJoin(df, "key", PacedService.call,
      callsPerSec = 2.0, burst = 1.0, maxRetries = 3)
      .select("key", "lookup_value").as[(String, String)].collect()
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    // zero lost rows: every input row returns enriched, 429s included
    assert(got.length == rows && got.forall(_._2 != null))
    assert(PacedService.throttled.get() == 4) // k5/k10/k15/k20 hit a 429
    // 24 rows on a 4×2 rps budget with burst 1 need ≥(6-1)/2 = 2.5 s of
    // pacing per partition; an unpaced run finishes in milliseconds
    assert(elapsedSec >= 2.0,
      f"finished in $elapsedSec%.2f s — the bucket is not pacing")
    // aggregate attempt rate stays within budget + burst headroom
    val attempts = PacedService.attempts.get()
    assert(attempts == rows + 4) // each 429 costs exactly one extra attempt
    val rate = attempts / elapsedSec
    assert(rate <= 4 * 2.0 + 4 * 1.0,
      f"aggregate $rate%.1f attempts/s exceeds partitions×rps + burst")
  }

  test("EtlJob.validate counts valid/invalid in one pass") {
    val df = Seq(("REF001", "Acme Ltd"), ("x", "Bo"), ("REF002", "Zenith Plc"))
      .toDF("planning_reference", "applicant_name")
    val (valid, stats) = EtlJob.validate(spark, df,
      length(col("planning_reference")) >= 3 && length(col("applicant_name")) >= 2)
    assert(valid.count() == 2)
    assert(stats.valid.value == 2)
    assert(stats.invalid.value == 1)
  }

  test("Flatten resolves nested structs and arrays at plan time") {
    val df = spark.read.json(Seq(
      """{"id":1,"address":{"line1":"1 High St","city":"York"},"sic_codes":["41100","68209"],"officers":[{"name":"A","role":"director"}]}"""
    ).toDS())
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSet ==
      Set("id", "address_city", "address_line1", "sic_codes", "officers"))
    val r = flat.select("address_line1", "sic_codes", "officers").collect()(0)
    assert(r.getString(0) == "1 High St")
    assert(r.getString(1) == "41100, 68209")
    assert(r.getString(2) == """[{"name":"A","role":"director"}]""")
  }

  test("S3 two-sheet export flattens nested enrichment") {
    val companies = Seq((1L, "Acme")).toDF("id", "name")
    val enrichment = spark.read.json(Seq(
      """{"company_id":1,"provider":"csv","data":{"charge_status":"outstanding","officers":["A","B"]}}"""
    ).toDS())
    val dir = Files.createTempDirectory("graft_xls").toString
    graft.sources.Exports.exportSheets(dir,
      "companies" -> companies, "enrichment" -> enrichment)
    val comp = spark.read.option("header", "true").csv(s"$dir/companies")
    val enr = spark.read.option("header", "true").csv(s"$dir/enrichment")
    assert(comp.columns.toSeq == Seq("id", "name"))
    assert(enr.columns.toSet ==
      Set("company_id", "data_charge_status", "data_officers", "provider"))
    val r = enr.collect()(0)
    assert(r.getAs[String]("data_charge_status") == "outstanding")
    assert(r.getAs[String]("data_officers") == "A, B")
  }

  test("S3 companies workbook pins the reference column order") {
    import org.apache.spark.sql.functions._
    val companies = Seq(
      ("Acme Ltd", "01234567", "active", "ltd", "uk", "2020-01-01",
        "1 High St", "41100", "2024-01-01"))
      .toDF("company_name", "company_number", "company_status", "company_type",
        "jurisdiction", "date_of_creation", "address", "sic_codes", "created_at")
      .withColumn("extra_col", lit("must not leak into the sheet"))
    val enrichment = spark.read.json(Seq(
      """{"company_number":"01234567","provider":"hunter","enrichment_data":{"data_tier":"Lender (No Contact)","has_charges":true}}"""
    ).toDS())
    val dir = Files.createTempDirectory("graft_wb").toString
    graft.sources.Exports.companiesWorkbook(dir, companies, Some(enrichment))
    val comp = spark.read.option("header", "true").csv(s"$dir/Companies")
    // utils.py:71-74 export_columns, exactly and in order
    assert(comp.columns.toSeq == graft.sources.Exports.CompaniesSheetColumns)
    val enr = spark.read.option("header", "true").csv(s"$dir/Enrichment Data")
    assert(enr.columns.toSeq == Seq("company_name", "company_number",
      "provider", "enrichment_data_data_tier", "enrichment_data_has_charges"))
    val r = enr.collect()(0)
    assert(r.getAs[String]("enrichment_data_data_tier") == "Lender (No Contact)")
  }

  test("S3 xlsx workbook: two styled sheets, real OOXML, no POI") {
    import org.apache.spark.sql.functions._
    val companies = Seq(
      ("Blue & Co <Ltd>", "07654321", "active", "ltd", "uk", "2021-05-05",
        "2 Low St", "41100", "2024-02-02"))
      .toDF("company_name", "company_number", "company_status", "company_type",
        "jurisdiction", "date_of_creation", "address", "sic_codes", "created_at")
    val enrichment = spark.read.json(Seq(
      """{"company_number":"07654321","provider":"hunter","enrichment_data":{"score":9,"ok":true}}"""
    ).toDS())
    val path = Files.createTempDirectory("graft_xlsx").toString + "/out.xlsx"
    graft.sources.Exports.companiesWorkbookXlsx(path, companies, Some(enrichment))
    val zf = new java.util.zip.ZipFile(path)
    try {
      def read(n: String): String = {
        val in = zf.getInputStream(zf.getEntry(n))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      val names = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      }
      assert(names.contains("xl/workbook.xml") && names.contains("xl/styles.xml"))
      assert(names.contains("xl/worksheets/sheet1.xml")
        && names.contains("xl/worksheets/sheet2.xml"))
      assert(read("[Content_Types].xml").contains("sheet2.xml"))
      val wb = read("xl/workbook.xml")
      assert(wb.contains("""name="Companies"""")
        && wb.contains("""name="Enrichment Data""""))
      val s1 = read("xl/worksheets/sheet1.xml")
      // header cells styled bold (s="1"), special chars escaped, widths set
      assert(s1.contains("""<c r="A1" s="1" t="inlineStr"><is><t>company_name</t></is></c>"""))
      assert(s1.contains("Blue &amp; Co &lt;Ltd&gt;"))
      assert(s1.contains("customWidth"))
      assert(read("xl/styles.xml").contains("<b/>"))
      // enrichment sheet: flattened columns + typed cells
      val s2 = read("xl/worksheets/sheet2.xml")
      assert(s2.contains("enrichment_data_score"))
      assert(s2.contains("""t="b"""") && s2.contains("<v>9</v>"))
    } finally zf.close()
  }

  test("Xlsx.ref produces A1-style references past column Z") {
    assert(graft.sources.Xlsx.ref(0, 1) == "A1")
    assert(graft.sources.Xlsx.ref(25, 3) == "Z3")
    assert(graft.sources.Xlsx.ref(26, 2) == "AA2")
    assert(graft.sources.Xlsx.ref(27 + 26, 9) == "BB9")
    assert(graft.sources.Xlsx.ref(701, 1) == "ZZ1")
    assert(graft.sources.Xlsx.ref(702, 1) == "AAA1")
  }

  test("S15 migration job full-copies tables in FK order with counts") {
    val src = Files.createTempDirectory("graft_mig_src").toString
    Seq((1L, "01234567"), (2L, "SC123456"))
      .toDF("id", "company_number").write.parquet(s"$src/companies")
    Seq((10L, 1L, "hunter", true))
      .toDF("id", "company_id", "provider", "success")
      .write.parquet(s"$src/enrichment_data")
    // processing_log/linkedhelper/planning_data absent at source → skipped
    val dest = new graft.sources.TableStore(spark,
      Files.createTempDirectory("graft_mig_dst").toString)
    val copied = graft.operators.MigrationJob.run(dest,
      graft.operators.MigrationJob.parquetSource(spark, src))
    assert(copied == Seq(
      graft.operators.MigrationJob.TableCopied("companies", 2L),
      graft.operators.MigrationJob.TableCopied("enrichment_data", 1L)))
    assert(dest.read("companies").schema.map(f => (f.name, f.dataType)) ==
      graft.sources.Catalog.companies.schema.map(f => (f.name, f.dataType)))
    assert(dest.keyViolations("companies").count() == 0)
  }

  test("S10 webhook JSON events parse with explicit schema") {
    val jsonl =
      """{"event_type":"connection_accepted","timestamp":"2024-03-01T10:00:00","contact":{"full_name":"Jane Doe","company":"Acme","linkedin_url":"https://li/x"}}""" + "\n" +
      """{"event_type":"message_replied","timestamp":"2024-03-02T11:00:00","contact":{"full_name":"Bob Roe","company":"Zenith","linkedin_url":"https://li/y"}}"""
    val dir = Files.createTempDirectory("graft_wh").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/events.jsonl"), jsonl)
    val df = Sources.readJsonl(spark, s"$dir/events.jsonl", Sources.WebhookEventSchema)
    // status mapping (webhook_handler.py:46-53)
    val mapped = df.select(col("contact.full_name").as("name"),
      when(col("event_type") === "connection_accepted", "connected")
        .when(col("event_type") === "message_replied", "responded")
        .otherwise("pending").as("status"))
    assert(mapped.as[(String, String)].collect().toSet ==
      Set(("Jane Doe", "connected"), ("Bob Roe", "responded")))
  }
}

/** Deterministic flaky external service for retry tests. */
object FlakyService {
  val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def call(k: String): Option[String] = {
    val n = calls.merge(k, 1, (a, b) => a + b)
    if (n == 1) throw new RuntimeException("transient")
    Some(k.toUpperCase)
  }
}

/** 429s the first call with a service-chosen delay, then succeeds. */
object ThrottledService {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  def call(k: String): Option[String] = {
    if (calls.incrementAndGet() == 1)
      throw graft.operators.ExternalLookup.RetryAfter(5L)
    Some("OK")
  }
}

/** Fake enrichment service for the fleet-pacing spec: counts attempts and
  * 429s every %5==0 key exactly once on its first call (static state —
  * executors share the JVM in local mode). */
object PacedService {
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
  val throttled = new java.util.concurrent.atomic.AtomicInteger(0)
  private val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def reset(): Unit = { attempts.set(0); throttled.set(0); seen.clear() }
  def call(k: String): Option[String] = {
    attempts.incrementAndGet()
    if (k.stripPrefix("k").toInt % 5 == 0 && seen.add(k)) {
      throttled.incrementAndGet()
      throw graft.operators.ExternalLookup.RetryAfter(100L)
    }
    Some(k.toUpperCase)
  }
}
