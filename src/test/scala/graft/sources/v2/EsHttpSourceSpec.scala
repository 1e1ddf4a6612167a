package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The live-HTTP twin of EsSourceV2Spec (round-11 verdict #5): the
  * SAME pushdown contracts, but every assertion crosses a real
  * loopback socket — pushed filters show up in the SERVER's request
  * log (not just the plan), projection cuts the `_source` the server
  * is asked for, pagination is visible as from-cursors in the log,
  * and a real 429 + Retry-After round-trip happens mid-scan. */
class EsHttpSourceSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private val types = Seq(
    "id" -> "long", "category" -> "keyword",
    "score" -> "double", "active" -> "boolean")
  private val rows: Seq[Map[String, Any]] = (0L until 500L).map { i =>
    Map[String, Any](
      "id" -> i,
      "category" -> (if (i % 3 == 0) "alpha" else if (i % 3 == 1) "beta"
        else "gamma"),
      "score" -> (i * 0.5),
      "active" -> (i % 2 == 0))
  } :+ Map[String, Any]("id" -> 999L, "category" -> null,
    "score" -> null, "active" -> true)

  private def withStub[T](reject429Every: Int = 0)(
      f: (String, EsHttpStub) => T): T = {
    val stub = new EsHttpStub("events", types, rows, reject429Every)
    val url = stub.start()
    try f(url, stub) finally stub.stop()
  }

  private def reader(url: String) = spark.read
    .format(classOf[EsHttpTableProvider].getName)
    .option("url", url).option("index", "events")
    .option("page_size", "64")

  test("schema comes from the mapping endpoint; full scan round-trips") {
    withStub() { (url, _) =>
      val df = reader(url).load()
      assert(df.schema.fieldNames.toSeq ==
        Seq("id", "category", "score", "active"))
      assert(df.count() == 501)
      val got = df.filter(col("id") < 3).orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")))
    }
  }

  test("pushed filters reach the server: request log + fewer hits") {
    withStub() { (url, stub) =>
      val df = reader(url).load()
        .filter(col("category") === "alpha" && col("id") > 100L)
      // correct rows (server evaluates pushed clauses, Spark the residual)
      val ids = df.select("id").collect().map(_.getLong(0)).toSet
      val want = (0L until 500L)
        .filter(i => i % 3 == 0 && i > 100L).toSet
      assert(ids == want)
      // the plan carries the pushdown…
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("EsHttpScan pushed=["), plan)
      assert(plan.contains("EqualTo(category,alpha)"), plan)
      // …and the SERVER actually received the bool DSL
      val logged = stub.searchLog.asScala.toSeq
      assert(logged.nonEmpty)
      assert(logged.forall(_.contains(""""term":{"category":"alpha"}""")),
        logged.head)
      assert(logged.forall(_.contains(""""range":{"id":{"gt":100}}""")),
        logged.head)
    }
  }

  test("projection pushdown: the server is asked for only the read columns") {
    withStub() { (url, stub) =>
      val got = reader(url).load().select("id", "score").collect()
      assert(got.length == 501)
      val logged = stub.searchLog.asScala.toSeq
      assert(logged.forall(b => b.contains(""""_source":["id","score"]""")),
        logged.head)
      assert(logged.forall(b => !b.contains("category")), logged.head)
      // count(*) prunes EVERYTHING: the wire shows an empty _source —
      // the server ships row existence, not a single payload byte
      stub.searchLog.clear()
      assert(reader(url).load().count() == 501)
      assert(stub.searchLog.asScala.forall(_.contains(""""_source":[]""")))
    }
  }

  test("pagination pages each slice with a moving from-cursor") {
    withStub() { (url, stub) =>
      val df = reader(url).option("slices", "2").load()
      assert(df.count() == 501)
      val logged = stub.searchLog.asScala.toSeq
      // ~250 rows per slice at page_size 64 → each slice pages ≥ 4 times
      assert(logged.size >= 8, s"only ${logged.size} search requests")
      assert(logged.exists(_.contains(""""from":64""")))
      assert(logged.exists(_.contains(""""from":128""")))
    }
  }

  test("limit pushdown stops paging early") {
    withStub() { (url, stub) =>
      val got = reader(url).option("slices", "2").load().limit(10).collect()
      assert(got.length == 10)
      val logged = stub.searchLog.asScala.toSeq
      // each slice asks for at most the limit, not the page size
      assert(logged.forall(_.contains(""""size":10""")), logged.head)
      assert(logged.size <= 4, s"kept paging past the limit: ${logged.size}")
    }
  }

  test("429 Retry-After is honored over the socket and the scan completes") {
    withStub(reject429Every = 3) { (url, stub) =>
      val df = reader(url).load()
      assert(df.count() == 501)
      assert(stub.rejected429.get() > 0, "the injector never fired")
      // every rejected request was retried to completion — no data loss
      val ids = df.select("id").collect().map(_.getLong(0)).toSet
      assert(ids.size == 501)
    }
  }

  test("http and file-backed twins agree on the same fixture") {
    withStub() { (url, _) =>
      val dir = java.nio.file.Files
        .createTempDirectory("es_http_twin").toString
      import spark.implicits._
      rows.filter(_("category") != null)
        .map(r => (r("id").asInstanceOf[Long],
          r("category").asInstanceOf[String],
          r("score").asInstanceOf[Double],
          r("active").asInstanceOf[Boolean]))
        .toDF("id", "category", "score", "active")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      def normalize(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("score") > 100.0 && col("category") =!= "beta")
          .select("id", "score").orderBy("id")
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaHttp = normalize(reader(url).load()
        .filter(col("category").isNotNull))
      val viaFile = normalize(spark.read
        .format(classOf[EsTableProvider].getName).load(dir))
      assert(viaHttp == viaFile && viaHttp.nonEmpty)
    }
  }
}
