package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every registered query
  * runs at sf0.001, emits only scalar columns, and every oracle key
  * points at a real query. */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("bench queries exist") {
    assert(SparkEntry.benchQueries.forall(SparkEntry.queries.contains))
  }

  test("SQL surface: registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT r_name, count(*) AS n FROM region r
         JOIN nation n ON n.n_regionkey = r.r_regionkey GROUP BY 1""").count()
    assert(n == 5)
    assert(spark.sql("SELECT graft_hash56(text) FROM documents LIMIT 1").count() == 1)
  }

  // One test, all queries, 6-way concurrent: the suites share one JVM and
  // run sequentially under sbt fork, and 137 serial counts dominated the
  // whole `sbt test` wall time (~5 min of it). Spark schedules concurrent
  // jobs from multiple threads fine; failures are collected per-query so
  // one broken query still names itself (and doesn't hide the others).
  test("every registry query runs at sf0.001 and emits only scalar columns") {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      scala.concurrent.Future {
        try {
          val df = fn(spark, sf)
          // Output-shape gate: the driver's pandas comparer hashes column
          // values and cannot hash array/map/struct cells (sim_pq_encode
          // shipped untestable twice this way). Registry outputs must be
          // scalar — stringify nested values (concat_ws) before returning.
          val nested = df.schema.fields.collect {
            case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType] ||
                f.dataType.isInstanceOf[StructType] =>
              s"${f.name}: ${f.dataType.simpleString}"
          }
          if (nested.nonEmpty)
            Some(s"$name: non-scalar output columns ${nested.mkString(", ")}")
          else {
            df.count() // materialize; correctness is the oracle's job
            None
          }
        } catch {
          case e: Throwable => Some(s"$name: ${e.toString.takeWhile(_ != '\n').take(300)}")
        }
      }
    }
    val failures = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf).flatten
    pool.shutdown()
    assert(failures.isEmpty, s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }
}
