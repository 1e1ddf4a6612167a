package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.LevenshteinSimilarity

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PlanLint flags the three scale-killers and passes clean plans") {
    import graft.plans.PlanLint
    val a = (1L to 50L).toDF("x")
    val b = (1L to 50L).toDF("y")
    // cartesian: non-equi cross join without broadcast hint
    val cart = a.crossJoin(b).filter(col("x") * 2 < col("y"))
    val cartRules = PlanLint.lint(cart).map(_.rule).toSet
    assert(cartRules.contains("cartesian-product") ||
      cartRules.contains("nested-loop-join"),
      s"cross product must be flagged, got $cartRules")
    // global window: row_number with no partitioning
    val w = org.apache.spark.sql.expressions.Window.orderBy("x")
    val gw = a.withColumn("rn", row_number().over(w))
    assert(PlanLint.lint(gw).map(_.rule).contains("global-window"))
    // a healthy partial+final aggregate over a scan lints clean
    val clean = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .groupBy("o_orderstatus").count()
    assert(PlanLint.lint(clean).isEmpty,
      s"clean plan must produce no findings: ${PlanLint.lint(clean)}")
    // and the DataFrame surface matches
    assert(PlanLint.lintDf(gw).select("rule").as[String].collect()
      .contains("global-window"))
  }

  test("PlanLint depth: pushdown-failed and filter-after-shuffle; dq planAudit rows") {
    import graft.plans.PlanLint
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    // a filter on a COMPUTED value pushes nothing useful (IsNotNull
    // residue only): every row-group is read, predicate runs post-I/O
    val computed = li.filter(substring(col("l_returnflag"), 1, 1) === "R")
      .select("l_orderkey")
    assert(PlanLint.lint(computed).map(_.rule).contains("pushdown-failed"),
      s"computed-value filter must flag: ${PlanLint.lint(computed)}")
    // the same predicate on the stored column pushes — no finding
    val pushed = li.filter(col("l_returnflag") === "R").select("l_orderkey")
    assert(!PlanLint.lint(pushed).map(_.rule).contains("pushdown-failed"),
      s"pushed filter must NOT flag: ${PlanLint.lint(pushed)}")
    // rows discarded after crossing the network. Catalyst pushes
    // DETERMINISTIC filters below a repartition on its own, so the
    // lint's catch is exactly the residue the optimizer can't move —
    // e.g. a non-deterministic sampling predicate placed after the
    // exchange (sample first, then repartition the survivors)
    val shuffled = li.select("l_orderkey", "l_quantity")
      .repartition(8, col("l_orderkey"))
      .filter(rand(42) < 0.5)
    assert(PlanLint.lint(shuffled).map(_.rule).contains("filter-after-shuffle"),
      s"filter over shuffle output must flag: ${PlanLint.lint(shuffled)}")
    // sample-then-repartition (the fix) lints clean of that rule; so
    // does the deterministic shape (Catalyst repairs it in planning)
    val fixed = li.select("l_orderkey", "l_quantity")
      .filter(rand(42) < 0.5)
      .repartition(8, col("l_orderkey"))
    assert(!PlanLint.lint(fixed).map(_.rule).contains("filter-after-shuffle"))
    val repaired = li.select("l_orderkey", "l_quantity")
      .repartition(8, col("l_orderkey"))
      .filter(col("l_quantity") > lit(1000.0))
    assert(!PlanLint.lint(repaired).map(_.rule).contains("filter-after-shuffle"))
    // dq integration: findings surface as audit rows; clean plans emit
    // the visible plan:<name>:clean row with zero violations
    val bad = graft.operators.Expectations.planAudit("ship", shuffled)
      .as[(String, Long)].collect().toMap
    assert(bad.exists { case (r, n) =>
      r == "plan:ship:filter-after-shuffle" && n >= 1L }, bad.toString)
    val ok = graft.operators.Expectations.planAudit("ok", pushed)
      .as[(String, Long)].collect()
    assert(ok.toSeq == Seq(("plan:ok:clean", 0L)), ok.mkString(","))
  }

  test("graft_hash56 and lev_similarity are SQL-callable via extensions") {
    val r = spark.sql(
      "SELECT graft_hash56('abc') AS h, lev_similarity('kitten', 'sitting') AS s")
      .as[(Long, Double)].collect().head
    assert(r._1 == 35994886058514134L)
    assert(math.abs(r._2 - (1.0 - 3.0 / 7.0)) < 1e-12)
  }

  test("F-series name functions are SQL-callable expression expansions") {
    // same trees as the Column library — verified value-equal here, and
    // they stay codegen (no UDF node) because the expansion happens at
    // analysis time
    val r = spark.sql(
      """SELECT normalize_name('  Acme & Sons, Ltd.!! ') AS n,
        |       strip_company_suffixes('Thames Gate Holdings Limited') AS s,
        |       is_likely_individual('Mr John Smith') AS i,
        |       name_tokens('The Riverbend Homes Limited') AS t,
        |       token_jaccard(array('a1','b2','c3'), array('a1','b2')) AS j
        |""".stripMargin).collect().head
    assert(r.getString(0) == graft.Tables.load(spark,
      "/root/testdata/sf0.001", "region").limit(1)
      .select(graft.functions.TextFunctions.normalizeName(
        lit("  Acme & Sons, Ltd.!! "))).collect().head.getString(0))
    assert(r.getString(1) == "Thames Gate")
    assert(r.getBoolean(2))
    // "Limited" then "Homes" both peel (the double suffix-strip), "the"
    // is a stopword — only the distinctive token survives
    assert(r.getSeq[String](3) == Seq("riverbend"))
    // subset bonus: 2/3 + 0.2
    assert(math.abs(r.getDouble(4) - (2.0 / 3 + 0.2)) < 1e-12)
    val plan = spark.sql(
      "SELECT normalize_name('x') FROM range(1)").queryExecution.executedPlan
    assert(!plan.toString.contains("BatchEvalPython") &&
      !plan.toString.contains("ScalaUDF"), "expansion must not be a UDF")
  }

  test("cosine_sim and simhash_bits are SQL-callable via extensions") {
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       simhash_bits(array(CAST(0 AS BIGINT))) AS s""".stripMargin)
      .as[(Double, Long)].collect().head
    assert(math.abs(r._1 - 1.0) < 1e-12)
    assert(r._2 == 0L) // all bits of hash 0 vote -1 => no bit set
  }

  test("cosine_sim is 0.0, not NULL, on NULL input arrays") {
    // parity with the composed form's otherwise() branch, in BOTH the
    // interpreted path (literals fold → eval) and codegen over rows
    val lit = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>),
        |                  array(CAST(1.0 AS FLOAT))) AS c""".stripMargin)
      .collect().head
    assert(!lit.isNullAt(0) && lit.getDouble(0) == 0.0)
    val rows = Seq(
        (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
        (None, Some(Array(1.0f, 0.0f))),
        (Some(Array(1.0f, 0.0f)), None))
      .toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS c")
      .collect().toSeq
    assert(rows.forall(!_.isNullAt(0)))
    assert(rows.map(_.getDouble(0)) == Seq(1.0, 0.0, 0.0))
  }

  test("LevenshteinSimilarity expression: bounds and empty handling") {
    val got = Seq(("", ""), ("abc", "abc"), ("abc", "xyz"))
      .toDF("a", "b")
      .select(LevenshteinSimilarity.levSimilarity($"a", $"b"))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 1.0, 0.0))
  }

  test("SimilarityPrefilter injects the length band ahead of the DP") {
    // parquet-backed source: a literal LocalRelation would be folded away
    // by ConvertToLocalRelation before the rule's effect is observable
    val df = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_name").as("a"), concat(col("c_name"), lit("X")).as("b"))
      .filter(LevenshteinSimilarity.levSimilarity($"a", $"b") >= 0.8)
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optimized.contains("abs("), s"band missing in:\n$optimized")
    assert(optimized.contains("levenshteinsimilarity"), optimized)
    assert(df.count() > 0) // one appended char keeps similarity ≥ 0.8
  }

  test("prefilter preserves semantics on a corpus sample") {
    val names = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_name").as("a"),
        regexp_replace(col("c_name"), "0", "O").as("b"))
    val withRule = names
      .filter(LevenshteinSimilarity.levSimilarity($"a", $"b") >= 0.6).count()
    val manual = names
      .withColumn("s", LevenshteinSimilarity.levSimilarity($"a", $"b"))
      .filter($"s" >= 0.6).count() // rule matches only direct Filter conjuncts
    assert(withRule == manual)
  }
}
