package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every registered query
  * runs at sf0.001 and every oracle key points at a real query. */
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

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
      fn(spark, sf).count() // materialize; correctness is the oracle's job
    }
  }
}
