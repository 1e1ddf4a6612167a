package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S5 over the wire (round-12 verdict "what's missing" #1): the
  * Companies House pagination grammar, param pushdown, 0.5 s-class
  * pacing and 429 handling, all asserted in the SERVER's request log
  * across a real loopback socket — the CH twin of EsHttpSourceSpec. */
class ChHttpSourceSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** 400 companies over 2024, 4 SIC codes, 3 statuses, 2 localities. */
  private val companies: Seq[Map[String, String]] = (0 until 400).map { i =>
    val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i % 360)
    Map(
      "company_number" -> f"${10000000 + i}%08d",
      "company_name" -> s"ACME $i LTD",
      "company_status" -> Seq("active", "dissolved", "liquidation")(i % 3),
      "company_type" -> "ltd",
      "date_of_creation" -> day.toString,
      "locality" -> (if (i % 2 == 0) "London" else "Leeds"),
      "postal_code" -> s"E${i % 20} ${i % 9}AB",
      "sic_codes" -> (Seq("62012", "62020", "70229", "82990")(i % 4) +
        (if (i % 5 == 0) ",99999" else "")))
  }

  private def withStub[T](reject429Every: Int = 0,
      retryAfterSec: Option[Int] = None)(f: (String, ChHttpStub) => T): T = {
    val stub = new ChHttpStub(companies, reject429Every, retryAfterSec)
    val url = stub.start()
    try f(url, stub) finally stub.stop()
  }

  private def reader(url: String) = spark.read
    .format(classOf[ChHttpTableProvider].getName)
    .option("url", url).option("items_per_page", "50")
    .option("calls_per_sec", "1000") // pacing has its own dedicated test

  test("full scan round-trips all companies with basic-auth and paging") {
    withStub() { (url, stub) =>
      val df = reader(url).load()
      assert(df.count() == 400)
      assert(stub.sawAuth.get(), "no Authorization header reached the server")
      // 400 rows at size 50 → start_index cursors 0,50,…,400 in the log
      val uris = stub.requestLog.asScala.map(_._1).toSeq
      assert(uris.exists(_.contains("start_index=0")))
      assert(uris.exists(_.contains("start_index=350")))
      assert(uris.forall(_.contains("size=50")))
    }
  }

  test("SIC + date-range + status push down as the reference's params") {
    withStub() { (url, stub) =>
      val df = reader(url).load()
        .filter(col("date_of_creation") >= "2024-03-01" &&
          col("date_of_creation") <= "2024-09-30" &&
          col("company_status") === "active" &&
          col("sic_codes").contains("62012"))
      val got = df.select("company_number").collect().map(_.getString(0)).toSet
      val want = companies.filter(c =>
        c("date_of_creation") >= "2024-03-01" &&
          c("date_of_creation") <= "2024-09-30" &&
          c("company_status") == "active" &&
          c("sic_codes").split(",").contains("62012"))
        .map(_("company_number")).toSet
      assert(got == want && got.nonEmpty)
      // the SERVER received every param — the narrowing happened there
      val uris = stub.requestLog.asScala.map(_._1).toSeq
      assert(uris.nonEmpty)
      assert(uris.forall(_.contains("incorporated_from=2024-03-01")), uris.head)
      assert(uris.forall(_.contains("incorporated_to=2024-09-30")), uris.head)
      assert(uris.forall(_.contains("company_status=active")), uris.head)
      assert(uris.forall(_.contains("sic_codes=62012")), uris.head)
      // and the plan shows the pushdown
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ChHttpScan params=["), plan)
      assert(plan.contains("incorporated_from=2024-03-01"), plan)
    }
  }

  test("a partial SIC prefix is NOT pushed (membership under-returns substring)") {
    withStub() { (url, stub) =>
      // "6201" substring-matches 62012's row but is not a list member —
      // pushing it as a param would drop rows the predicate admits
      val df = reader(url).load().filter(col("sic_codes").contains("6201"))
      val got = df.count()
      val want = companies.count(_("sic_codes").contains("6201"))
      assert(got == want && got > 0)
      val uris = stub.requestLog.asScala.map(_._1).toSeq
      assert(uris.forall(!_.contains("sic_codes=")),
        s"partial code was pushed: ${uris.head}")
    }
  }

  test("a pushed date range splits into parallel sub-range cursors") {
    withStub() { (url, stub) =>
      val df = reader(url).option("splits", "3").load()
        .filter(col("date_of_creation") >= "2024-01-01" &&
          col("date_of_creation") <= "2024-12-31")
      assert(df.rdd.getNumPartitions == 3, "range did not split")
      assert(df.count() == 400)
      // three disjoint sub-ranges each ran their own cursor
      val froms = stub.requestLog.asScala.map(_._1)
        .flatMap(_.split("[?&]").find(_.startsWith("incorporated_from=")))
        .toSet
      assert(froms.size == 3, s"sub-ranges seen: $froms")
      // splitting must not double-count or drop: exact union
      val got = reader(url).option("splits", "3").load()
        .filter(col("date_of_creation") >= "2024-01-01" &&
          col("date_of_creation") <= "2024-12-31")
        .select("company_number").collect().map(_.getString(0)).toSeq
      assert(got.sorted == companies.map(_("company_number")).sorted)
    }
  }

  test("limit pushdown caps page size and stops the cursor early") {
    withStub() { (url, stub) =>
      val got = reader(url).load().limit(7).collect()
      assert(got.length == 7)
      val uris = stub.requestLog.asScala.map(_._1).toSeq
      assert(uris.forall(_.contains("size=7")), uris.head)
      assert(uris.size <= 2, s"kept paging past the limit: ${uris.size}")
    }
  }

  test("the token bucket paces requests at the configured rate") {
    withStub() { (url, stub) =>
      // 4 calls/s (the 0.5 s contract scaled for test time): 400 rows at
      // size 100 → 5 requests → ≥4 paced gaps of ~250 ms
      val t0 = System.currentTimeMillis()
      val n = spark.read.format(classOf[ChHttpTableProvider].getName)
        .option("url", url).option("items_per_page", "100")
        .option("calls_per_sec", "4").load().count()
      val elapsed = System.currentTimeMillis() - t0
      assert(n == 400)
      val times = stub.requestLog.asScala.map(_._2).toSeq.sorted
      assert(times.size >= 5)
      // server-observed spacing: mean gap ≥ 80% of the 250 ms budget
      val gaps = times.sliding(2).map { case Seq(a, b) => b - a }.toSeq
      val meanGap = gaps.sum.toDouble / gaps.size
      assert(meanGap >= 200.0,
        s"mean inter-request gap ${meanGap}ms under the 250ms budget " +
          s"(elapsed ${elapsed}ms, gaps $gaps)")
    }
  }

  test("429 Retry-After is honored over the socket; the scan completes") {
    withStub(reject429Every = 4, retryAfterSec = Some(0)) { (url, stub) =>
      val df = reader(url).load()
      assert(df.count() == 400)
      assert(stub.rejected429.get() > 0, "the injector never fired")
      val nums = df.select("company_number").collect()
        .map(_.getString(0)).toSet
      assert(nums.size == 400, "a rejected page was silently dropped")
    }
  }
}
