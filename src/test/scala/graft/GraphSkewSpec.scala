package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, Skew}

class GraphSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val appointments = Seq(
    // officer -> company (group = officer, item = company)
    ("o1", "c1"), ("o1", "c2"), ("o1", "c3"),
    ("o2", "c1"), ("o2", "c2"),
    ("o3", "c9"),
    ("o1", "c1") // duplicate appointment must not double-count
  ).toDF("officer", "company")

  test("Graph.sharedKeyEdges builds weighted undirected edges once") {
    val edges = Graph.sharedKeyEdges(appointments, "officer", "company")
      .as[(String, String, Long)].collect().toSet
    assert(edges == Set(("c1", "c2", 2L), ("c1", "c3", 1L), ("c2", "c3", 1L)))
  }

  test("Graph.sharedKeyEdges honors minShared and maxGroupSize") {
    val strong = Graph.sharedKeyEdges(appointments, "officer", "company",
      minShared = 2).as[(String, String, Long)].collect().toSet
    assert(strong == Set(("c1", "c2", 2L)))
    val capped = Graph.sharedKeyEdges(appointments, "officer", "company",
      maxGroupSize = 2).as[(String, String, Long)].collect().toSet
    assert(capped == Set(("c1", "c2", 1L))) // o1's 3-company group dropped
  }

  test("a hot basket over the cap contributes no pairs and is countable") {
    // the a43_basket_rules shape: one degenerate basket (a default
    // account id, a null key) holding 500 items would emit ~125k pairs
    // uncapped; with the cap it contributes ZERO pairs — the pair
    // explosion stays ∝ Σ capped_size², never ∝ hot_size² — while the
    // normal baskets' rules are untouched and the dropped count is
    // exactly recoverable for the query's dropped_baskets column.
    val cap = 50
    val hot = (1 to 500).map(i => ("hot", s"i$i"))
    val normal = Seq(("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y"))
    val df = (hot ++ normal).toDF("basket", "item")
    val pairs = Graph.sharedKeyEdges(df, "basket", "item",
      maxGroupSize = cap).as[(String, String, Long)].collect().toSet
    assert(pairs == Set(("x", "y", 2L)), s"hot pairs leaked: $pairs")
    val droppedN = df.distinct().groupBy("basket")
      .agg(count(lit(1)).as("sz"))
      .agg(coalesce(sum(when(col("sz") > cap, lit(1L))), lit(0L)))
      .as[Long].head()
    assert(droppedN == 1L)
  }

  test("Graph.neighborhood and degrees") {
    val edges = Graph.sharedKeyEdges(appointments, "officer", "company")
    val n = Graph.neighborhood(edges, lit("c1"))
      .as[(String, Long)].collect().toMap
    assert(n == Map("c2" -> 2L, "c3" -> 1L))
    val d = Graph.degrees(edges).as[(String, Long)].collect().toMap
    assert(d == Map("c1" -> 2L, "c2" -> 2L, "c3" -> 2L))
  }

  test("Graph.triangleCount is right and builds the edge list once") {
    // K4 on c1..c4 (4 triangles) plus a pendant edge.
    val eSeq = Seq(("c1", "c2"), ("c1", "c3"), ("c1", "c4"),
      ("c2", "c3"), ("c2", "c4"), ("c3", "c4"), ("c4", "c5"))
    val builds = spark.sparkContext.longAccumulator("edgeBuilds")
    val edges = eSeq.toDF("item_a", "item_b")
      .map { r => builds.add(1); (r.getString(0), r.getString(1)) }
      .toDF("item_a", "item_b")
    val n = Graph.triangleCount(edges).as[Long].collect().head
    assert(n == 4)
    // The upstream DAG feeds degrees + orientation + three join sides;
    // triangleCount eagerly materializes the persisted edges in a
    // single-leg job first, so every later leg reads the cache and the
    // build runs once per row. Bound is <= 2x, not ==: a task RETRY
    // re-runs the build on its partition and double-counts the
    // accumulator (Spark only dedups accumulators for result-stage
    // tasks) — rare in local mode but an exact assert is flake-bait.
    // The cache-isolation property still has teeth: before the fix the
    // multi-leg fan-out ran the build 4-5x.
    assert(builds.value >= eSeq.size && builds.value <= 2L * eSeq.size,
      s"edge build ran ${builds.value / eSeq.size.toDouble}x")
  }

  test("Skew.saltedJoin equals the plain join") {
    val left = (1 to 500).map(i => (i % 3, i)).toDF("k", "v") // key 0/1/2, skewed-ish
    val right = Seq((0, "zero"), (1, "one"), (2, "two")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .as[(Int, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
      .select("k", "v", "name").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 500)
  }

  test("approx_count_distinct within 5% of exact at test scale") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val (approx, exact) = e.agg(
      approx_count_distinct("l_partkey").as("a"),
      countDistinct("l_partkey").as("e"))
      .as[(Long, Long)].collect().head
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("sharedEdgesView serves the derived edges and rebuilds on append") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString
    val li0 = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L),
        (3L, 11L), (3L, 12L))
      .toDF("l_orderkey", "l_partkey")
    li0.write.parquet(s"$dir/lineitem.parquet")
    def fresh() = Graph.sharedKeyEdges(
      spark.read.parquet(s"$dir/lineitem.parquet"),
      "l_orderkey", "l_partkey", minShared = 2, maxGroupSize = Int.MaxValue)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("item_a", "item_b", "weight")
        .as[(Long, Long, Long)].collect().toSet

    val served = Graph.sharedEdgesView(spark, dir)
    assert(asSet(served) == asSet(fresh()))
    assert(asSet(served) == Set((10L, 11L, 3L)))

    // APPEND: two more baskets promote (10,12) and (11,12) past
    // minShared — a stale view would still say {(10,11)} only. The
    // fingerprint must see the new files and rebuild.
    Seq((4L, 10L), (4L, 12L), (5L, 11L), (5L, 12L), (5L, 10L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("append").parquet(s"$dir/lineitem.parquet")
    val after = Graph.sharedEdgesView(spark, dir)
    assert(asSet(after) == asSet(fresh()))
    assert(asSet(after) ==
      Set((10L, 11L, 4L), (10L, 12L, 3L), (11L, 12L, 2L)))
  }

  test("sharedEdgesView caps hot groups and reports the drop") {
    // the MV is the GENERIC J4-family serving path: a skewed key (the
    // reference's officer-on-thousands-of-boards case) must not go
    // quadratic in the build — the cap binds, the drop is ACCOUNTED,
    // and cold groups' edges stay exactly right.
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_hot").toString
    val hot = (100L until 110L).map(p => (9L, p)) // one 10-member basket
    val cold = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    (hot ++ cold).toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    spark.conf.set("graft.graph.mvMaxGroupSize", "5")
    try {
      val served = Graph.sharedEdgesView(spark, dir, minShared = 1)
        .select("item_a", "item_b", "weight")
        .as[(Long, Long, Long)].collect().toSet
      assert(served == Set((10L, 11L, 2L)),
        s"hot group leaked into the served edges: $served")
      val rep = Graph.mvDropReport(spark, dir)
      assert(rep.contains(Graph.MvDropReport(1L, 10L, 10L)),
        s"drop unaccounted: $rep")
    } finally spark.conf.unset("graft.graph.mvMaxGroupSize")
  }
}
