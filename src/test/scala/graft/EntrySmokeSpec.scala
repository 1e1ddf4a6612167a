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

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
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
      assert(nested.isEmpty, s"non-scalar output columns: ${nested.mkString(", ")}")
      df.count() // materialize; correctness is the oracle's job
    }
  }
}
