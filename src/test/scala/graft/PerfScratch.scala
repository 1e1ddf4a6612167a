package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Profiling harness — `ignore`d in CI (costs ~40 s and asserts nothing);
  * flip ignore→test locally when hunting a regression. */
class PerfScratch extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.1"

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[perf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  ignore("profile j6 stages at sf0.1") {
    val q = queries.Fuzzy.j6FuzzyJoin
    time("warmup full")(q.run(spark, sf).queryExecution.toRdd.foreach(_ => ()))
    time("run2 full")(q.run(spark, sf).queryExecution.toRdd.foreach(_ => ()))

    val cust = Tables.load(spark, sf, "customer")
    time("scan customer")(cust.queryExecution.toRdd.foreach(_ => ()))
    val companies = cust.select(col("c_custkey").as("company_id"),
      col("c_name").as("company_name"))
    val applicants = cust.filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("applicant_id"),
        when(col("c_custkey") % 3 === 0,
          concat(regexp_replace(col("c_name"), "Customer", "Custmer"),
            lit(" Holdings Limited")))
          .when(col("c_custkey") % 3 === 1, concat(col("c_name"), lit(" LLP")))
          .otherwise(col("c_name")).as("applicant_name"))
    println(s"[perf] applicants=${applicants.count()} companies=${companies.count()}")
    val m = operators.FuzzyJoin.matchNames(applicants, companies,
      "applicant_id", "applicant_name", "company_id", "company_name",
      minConfidence = 0.7, topK = 3, commonTokens = Seq("customer", "custmer"))
    time("matchNames full")(m.queryExecution.toRdd.foreach(_ => ()))
    println(s"[perf] match rows=${m.count()}")
  }

  ignore("profile dd_minhash stages at sf0.1") {
    val q = queries.Pipeline.ddMinhash
    time("warmup full")(q.run(spark, sf).queryExecution.toRdd.foreach(_ => ()))
    time("run2 full")(q.run(spark, sf).queryExecution.toRdd.foreach(_ => ()))
  }
}
