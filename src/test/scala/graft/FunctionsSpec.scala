package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DateFunctions, PortableLn, TextFunctions}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).collect()(0).get(0)

  test("F1 normalizeName lowercases, strips punct, collapses whitespace") {
    assert(one(TextFunctions.normalizeName(lit("  ACME!!  Ltd's   Co.  ")))
      == "acme ltd's co")
  }

  test("F2 removeCompanySuffixes peels stacked suffixes") {
    assert(one(TextFunctions.removeCompanySuffixes(lit("Acme Holdings Limited"))) == "Acme")
    assert(one(TextFunctions.removeCompanySuffixes(lit("Acme Ltd."))) == "Acme")
    assert(one(TextFunctions.removeCompanySuffixes(lit("Acme"))) == "Acme")
  }

  test("F3 isLikelyIndividual: titles and short bare names yes, companies no") {
    assert(one(TextFunctions.isLikelyIndividual(lit("Mr John Smith"))) == true)
    assert(one(TextFunctions.isLikelyIndividual(lit("John Smith"))) == true)
    assert(one(TextFunctions.isLikelyIndividual(lit("Acme Developments Limited"))) == false)
  }

  test("F7 tokenJaccard with subset bonus capped at 1.0") {
    val a = array(lit("acme"), lit("homes"))
    val b = array(lit("acme"), lit("homes"), lit("north"))
    val j = one(TextFunctions.tokenJaccard(a, b)).asInstanceOf[Double]
    assert(math.abs(j - (2.0 / 3.0 + 0.2)) < 1e-12)
    val same = one(TextFunctions.tokenJaccard(a, a)).asInstanceOf[Double]
    assert(same == 1.0)
  }

  test("F8 cleanOfficerName flips LAST, First and strips titles") {
    assert(one(TextFunctions.cleanOfficerName(lit("SMITH, John"))) == "John Smith")
    assert(one(TextFunctions.cleanOfficerName(lit("Dr Jane Ann Doe"))) == "Jane Doe")
  }

  test("F10 formatAddress skips null and empty parts") {
    assert(one(TextFunctions.formatAddress(lit("1 High St"), lit(""), lit("Leeds")))
      == "1 High St, Leeds")
  }

  test("F12 extractPostcode finds UK postcodes") {
    assert(one(TextFunctions.extractPostcode(lit("Flat 2, SS9 2UJ, England"))) == "SS9 2UJ")
  }

  test("F14 isValidCompanyNumber accepts 8-digit and SC-prefixed") {
    assert(one(TextFunctions.isValidCompanyNumber(lit("15434477"))) == true)
    assert(one(TextFunctions.isValidCompanyNumber(lit("SC123456"))) == true)
    assert(one(TextFunctions.isValidCompanyNumber(lit("1234"))) == false)
  }

  test("F13 guessDomain uses first three meaningful tokens") {
    assert(one(TextFunctions.guessDomain(lit("The Acme Building Company Limited")))
      == "acmebuilding.com")
  }

  test("F11 normalizeBorough handles &, case, and special renames") {
    assert(one(TextFunctions.normalizeBorough(lit("barking & dagenham")))
      == "Barking and Dagenham")
    assert(one(TextFunctions.normalizeBorough(lit("CITY OF LONDON")))
      == "City of London")
    assert(one(TextFunctions.normalizeBorough(lit("city of westminster")))
      == "Westminster")
    assert(one(TextFunctions.normalizeBorough(lit("kingston  upon   thames")))
      == "Kingston upon Thames")
  }

  test("F9 splitOfficerName: titles stripped, middle names dropped") {
    val got = Seq("MR JOHN MICHAEL SMITH", "Dr. Jane Doe", "MADONNA", "")
      .toDF("n")
      .select(TextFunctions.splitOfficerName($"n").as("s"))
      .select("s.first_name", "s.last_name")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("John", "Smith"), ("Jane", "Doe"), ("", ""), ("", "")))
  }

  test("F21 fixHtmlEntities and F22 sanitizeFilename") {
    assert(one(TextFunctions.fixHtmlEntities(lit("A &amp; B&nbsp;Ltd"))) == "A & B Ltd")
    assert(one(TextFunctions.sanitizeFilename(lit("a b/c:d.csv"))) == "a_b_c_d.csv")
    assert(one(TextFunctions.sanitizeFilename(lit("x" * 200))).asInstanceOf[String].length == 100)
  }

  test("D6 sinceDaysAgo is now-relative") {
    val df = Seq(1).toDF("x")
      .select((DateFunctions.sinceDaysAgo(7) < current_timestamp()).as("past"),
        (DateFunctions.sinceDaysAgo(7) > current_timestamp() - expr("INTERVAL 8 DAYS")).as("bounded"))
    assert(df.collect()(0) == org.apache.spark.sql.Row(true, true))
  }

  test("D1 parseTimestampMulti handles ISO, date-only, UK formats") {
    val df = Seq("2024-01-23T10:30:00", "2024-01-23", "23/01/2024", "garbage")
      .toDF("s").select(DateFunctions.parseTimestampMulti($"s").as("t"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got(0).get.startsWith("2024-01-23 10:30"))
    assert(got(1).get.startsWith("2024-01-23 00:00"))
    assert(got(2).get.startsWith("2024-01-23 00:00"))
    assert(got(3).isEmpty)
  }

  test("D3 friendlyDate ordinal suffixes incl. 11th-13th") {
    val df = Seq("2023-06-23", "2023-06-11", "2023-06-01", "2023-06-02")
      .toDF("s").select(DateFunctions.friendlyDate($"s".cast("date")).as("f"))
    val got = df.collect().map(_.getString(0))
    assert(got(0) == "Friday 23rd June 2023")
    assert(got(1) == "Sunday 11th June 2023")
    assert(got(2) == "Thursday 1st June 2023")
    assert(got(3) == "Friday 2nd June 2023")
  }

  test("PortableLn: Spark evaluation is BIT-identical to the Scala mirror") {
    // the exactness contract: the generated SQL, run through Catalyst,
    // must produce the same 64 bits as the plain-Scala evaluator with
    // the pinned op order (DuckDB parity was validated the same way)
    val rnd = new scala.util.Random(42)
    val xs = Seq(1.0, 2.0, 0.5, 7.0 / 3, 1.0 / 9, math.pow(2, 52),
        math.pow(2, -52), 1.9999999999999998, 1.0000000000000002) ++
      (1 to 200).map(_ => math.exp(rnd.nextDouble() * 60 - 30))
    val df = xs.toDF("x")
    val got = PortableLn.withLn(df, "x", "lnv")
      .select("x", "lnv").as[(Double, Double)].collect()
    got.foreach { case (x, lnv) =>
      assert(java.lang.Double.doubleToLongBits(lnv) ==
        java.lang.Double.doubleToLongBits(PortableLn(x)),
        s"bit drift at x=$x: spark=$lnv scala=${PortableLn(x)}")
    }
  }

  test("PortableLn: accurate to 1e-9 relative against math.log across the domain") {
    val rnd = new scala.util.Random(7)
    val xs = (1 to 500).map(_ => math.exp(rnd.nextDouble() * 72 - 36))
    xs.foreach { x =>
      val err = math.abs(PortableLn(x) - math.log(x))
      assert(err <= 1e-9 * math.max(1.0, math.abs(math.log(x))),
        s"fidelity drift at x=$x: ${PortableLn(x)} vs ${math.log(x)}")
    }
  }
}
