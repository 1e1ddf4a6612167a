package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-membership graph materialization (SURVEY.md §2.3 J4/J5; reference
  * shared_officer_edges, database.py:937-1011): entities that share a
  * group become an undirected edge weighted by shared-group count.
  *
  * Scale: dedup (group, item) first; the self-join is an equi-join on the
  * group key (one shuffle, no product); `<` emits each edge once. The
  * edge table is a derived table rebuilt wholesale (M8) — overwrite, no
  * incremental merge needed. Hot groups (an officer on thousands of
  * boards) explode quadratically: cap group size explicitly at ingest and
  * log the drop, don't let one key own the stage. */
object Graph {

  /** Each group's distinct members collected to one sized array row —
    * the shared first stage of the edge build and its drop accounting. */
  private def groupedItems(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame =
    df.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .groupBy("g")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .withColumn("sz", size(col("items")))

  /** Pair emission from [[groupedItems]] output: in-row explode of the
    * sorted member array, capped groups filtered out beforehand. */
  private def pairsFrom(grouped: DataFrame, minShared: Int,
      maxGroupSize: Int): DataFrame =
    // singleton groups emit no pairs — drop them before the explode
    grouped.filter(col("sz").between(2, maxGroupSize))
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
           transform(slice(items, i + 2, size(items)),
                     y -> struct(x AS item_a, y AS item_b))))""")).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("weight"))
      .filter(col("weight") >= minShared)

  /** Build the edge list: (item_a, item_b, weight = distinct shared
    * groups), for groups with at most `maxGroupSize` members.
    *
    * Collect each group's distinct members once and emit pairs from the
    * sorted array in-row (same rewrite as query j4): one shuffle to group,
    * one to count — no self-join, and the size cap is a plain filter on
    * the collected array instead of a window pass. */
  def sharedKeyEdges(df: DataFrame, groupCol: String, itemCol: String,
      minShared: Int = 1, maxGroupSize: Int = 1000): DataFrame =
    pairsFrom(groupedItems(df, groupCol, itemCol), minShared, maxGroupSize)

  /** [[sharedKeyEdges]] over a PRE-BUCKETED input — the workload's
    * recurring-shuffle killer. The edge table is rebuilt wholesale on
    * every pipeline run (M8; reference database.py:941-961 re-joins from
    * scratch per request), and the rebuild's appointment-sized wide
    * operation is the groupBy on `groupCol`. Writing the appointments
    * bucketed by that key pays the shuffle ONCE at write time
    * (graft.sources.Bucketing); every later rebuild's group collect then
    * reads bucket-partitioned input with NO Exchange — pinned in
    * PlanSpec. The pair-count groupBy keys on (item_a, item_b) and still
    * exchanges, but its input is the pair list, not the appointments.
    *
    * `tag` namespaces the materialization (per catalog table name +
    * location) and MUST uniquely identify the input data — callers embed
    * the source dir in it; the bucket geometry is part of the memo key
    * (Bucketing.ensureBucketed), so same-tag calls with a different
    * `buckets` re-write instead of reusing a stale layout, and the data
    * path is pid-scoped so concurrent JVMs never collide. Bucket count
    * is the rebuild's parallelism — size it like shuffle partitions at
    * the target scale (thousands for a 100 TB appointments table). */
  def sharedKeyEdgesBucketed(spark: SparkSession, appointments: => DataFrame,
      groupCol: String, itemCol: String, tag: String, buckets: Int = 8,
      minShared: Int = 1, maxGroupSize: Int = 1000): DataFrame = {
    val base = s"${graft.sources.Bucketing.processRoot}/appts_$tag"
    graft.sources.Bucketing.ensureBucketed(
      appointments.select(col(groupCol), col(itemCol)),
      s"g_appts_b_$tag", base, groupCol, buckets)
    sharedKeyEdges(spark.table(s"g_appts_b_$tag"), groupCol, itemCol,
      minShared, maxGroupSize)
  }

  /** The MATERIALIZED co-purchase edge view the whole graph-analytics
    * family serves from — the reference's own architecture (models.py:
    * 255-269 `SharedOfficerEdge`: a stored edge table with a
    * shared-count column, rebuilt wholesale by database.py:937-970 and
    * read by every network query), applied to the lineitem co-purchase
    * graph. Before this view each g_* query re-derived the edges from
    * lineitem — a full baskets-groupBy per analytics run (~2.4 s/query
    * at sf0.1; at 100 TB, a fact-table-sized wide stage repeated 17×).
    * Now the build runs ONCE per input snapshot per process and every
    * query reads the parquet-backed table.
    *
    * Stored at minShared = 1 with the weight column (exactly the
    * reference's schema); callers filter `weight >= minShared`, which
    * Catalyst pushes into the parquet scan. Freshness is keyed on
    * [[graft.sources.Bucketing.pathFingerprint]] of the input files, so
    * an append to lineitem rebuilds the view instead of serving stale
    * edges (pinned in OperatorsSpec) — the M8 wholesale-rebuild
    * contract, triggered by data change rather than by request. */
  /** Per-build drop accounting for [[sharedEdgesView]]: groups whose
    * member count exceeded the build cap, their total members, and the
    * largest one seen — keyed by the MV table name. */
  final case class MvDropReport(droppedGroups: Long, droppedMembers: Long,
      maxGroupSize: Long)
  private val mvDrops =
    new java.util.concurrent.ConcurrentHashMap[String, MvDropReport]()

  /** The drop report of the MV serving `dir`'s current snapshot (None
    * until that build has run in this process). */
  def mvDropReport(spark: SparkSession, dir: String): Option[MvDropReport] =
    Option(mvDrops.get("g_edges_mv_" +
      graft.sources.Bucketing.pathFingerprint(spark, s"$dir/lineitem.parquet")))

  def sharedEdgesView(spark: SparkSession, dir: String,
      minShared: Int = 2): DataFrame = {
    val fp = graft.sources.Bucketing.pathFingerprint(
      spark, s"$dir/lineitem.parquet")
    val table = s"g_edges_mv_$fp"
    val loc = s"${graft.sources.Bucketing.processRoot}/$table"
    // The generic-serving-path discipline this file's header demands:
    // a hot group (the reference's officer-on-thousands-of-boards case)
    // goes QUADRATIC in the in-row pair explode — one array row fanning
    // to sz²/2 pairs inside one task — so the build caps group size
    // and ACCOUNTS every group it drops (j6's droppedPairReport
    // pattern) instead of silently serving a truncated graph. TPC-H
    // orders hold ≤ 7 lineitems, so the default cap never binds at the
    // oracled SFs; a corpus where it does shows up in the report and
    // the stderr warning, not in quietly missing edges.
    val maxGroup = spark.conf.getOption("graft.graph.mvMaxGroupSize")
      .map(_.toInt).getOrElse(1000)
    graft.sources.Bucketing.ensureOnce(s"$table@$loc") {
      val grouped = groupedItems(graft.Tables.load(spark, dir, "lineitem"),
        "l_orderkey", "l_partkey").cache()
      try {
        pairsFrom(grouped, minShared = 1, maxGroupSize = maxGroup)
          .write.option("path", loc).mode("overwrite")
          .format("parquet").saveAsTable(table)
        val r = grouped.filter(col("sz") > maxGroup)
          .agg(coalesce(count(lit(1)), lit(0L)).as("g"),
            coalesce(sum(col("sz")), lit(0L)).as("m"),
            coalesce(max(col("sz")), lit(0)).cast("long").as("mx"))
          .head()
        val rep = MvDropReport(r.getLong(0), r.getLong(1), r.getLong(2))
        mvDrops.put(table, rep)
        if (rep.droppedGroups > 0)
          System.err.println(s"[graph] edge MV $table DROPPED " +
            s"${rep.droppedGroups} hot groups (${rep.droppedMembers} " +
            s"members, largest ${rep.maxGroupSize} > cap $maxGroup = " +
            "graft.graph.mvMaxGroupSize); served edges exclude them")
      } finally { grouped.unpersist(); () }
    }
    spark.table(table).filter(col("weight") >= minShared)
  }

  /** 1-hop neighborhood of `id` over an edge list (reference
    * database.py:985-1011). */
  def neighborhood(edges: DataFrame, id: Column): DataFrame =
    edges.filter(col("item_a") === id || col("item_b") === id)
      .select(when(col("item_a") === id, col("item_b"))
        .otherwise(col("item_a")).as("neighbor"), col("weight"))

  /** Degree distribution — the A6/A7 network stats. Endpoints emit via
    * one in-row explode, NOT a two-legged union: each union leg re-scans
    * (and re-COMPUTES, when uncached) the whole upstream edge build —
    * measured as 2× the dominant stage of g_degrees. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("item_a"), col("item_b"))).as("item"))
      .groupBy("item").agg(count(lit(1)).as("degree"))

  /** Total triangle count via the degree-ordered orientation: every edge
    * is directed from its lower to its higher endpoint under the total
    * order (degree, id), which caps any vertex's out-degree at O(√m) —
    * so the wedge join's fan-out is bounded on EVERY graph, including
    * power-law ones where orienting by id alone lets a hub emit its
    * whole neighborhood squared. Each triangle is counted exactly once:
    * its (degree, id)-lowest vertex owns the single edge whose two
    * out-neighborhoods witness it.
    *
    * Counting itself is edge-iterator over sorted adjacency: per
    * oriented edge (a,b), triangles = |N⁺(a) ∩ N⁺(b)| — two equi-joins
    * of the edge list to the (vertex, out-neighbors[]) table and one
    * codegen array_intersect per edge. The earlier wedge-join form
    * pushed the whole wedge set (Σ out-deg², up to m·√m rows) through a
    * shuffle before closing; here the only shuffled payloads are the m
    * edges and n adjacency arrays (each ≤ O(√m) by the orientation).
    *
    * `edges` (feeding degrees + orientation) and `oriented` (feeding the
    * adjacency build and both probe sides) are persisted for the
    * duration — without that the upstream edge-build DAG re-executes
    * once per reference, 4+ full scans of the dominant stage at 100×.
    * The eager count() materializes both before the fan-out; the 1-row
    * result is localCheckpointed so the caches can be freed on exit. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.persist()
    // Materialize the edge cache BEFORE any multi-leg consumer runs: the
    // first job reads e through MULTIPLE legs (the deg aggregate plus
    // the e0 join's probe side), and inside one job two tasks can
    // compute the same not-yet-cached partition concurrently — each
    // re-running the (dominant) upstream edge build. One cheap
    // single-leg count here guarantees every later leg reads the cache
    // (GraphSkewSpec pins the build-once invariant by accumulator).
    e.count()
    val deg = degrees(e)
    val e0 = e.select(col("item_a").as("x"), col("item_b").as("y"))
      .join(deg.select(col("item").as("x"), col("degree").as("dx")), "x")
      .join(deg.select(col("item").as("y"), col("degree").as("dy")), "y")
    val oriented = e0.select(
        when(col("dx") < col("dy") ||
            (col("dx") === col("dy") && col("x") < col("y")),
          struct(col("x").as("a"), col("y").as("b")))
          .otherwise(struct(col("y").as("a"), col("x").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist()
    oriented.count() // materialize before the three-legged probe fan-out
    val adj = oriented.groupBy("a")
      .agg(sort_array(collect_list(col("b"))).as("nb"))
    val out = oriented
      .join(adj.select(col("a").as("ja"), col("nb").as("na")), col("a") === col("ja"))
      // inner: an edge whose head has no out-neighbors closes nothing
      .join(adj.select(col("a").as("jb"), col("nb").as("nbb")), col("b") === col("jb"))
      .select(size(array_intersect(col("na"), col("nbb"))).as("t"))
      .agg(coalesce(sum(col("t").cast("long")), lit(0L)).as("n_triangles"))
      .localCheckpoint() // pin the 1-row result, then free the caches
    oriented.unpersist()
    e.unpersist()
    out
  }

  /** Per-node triangle participation and LOCAL CLUSTERING COEFFICIENT —
    * "how interconnected is each node's neighborhood" (Watts & Strogatz
    * 1998), the per-node refinement of [[triangleCount]]'s global
    * number: cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), here in integer
    * PERMILLE (the fixed-point discipline that keeps it oracle-exact —
    * a double division would be engine-portable but the permille floor
    * makes order/engine drift structurally impossible).
    *
    * Same degree-ordered orientation as triangleCount (every vertex's
    * out-degree capped at O(√m)); the difference is the witness
    * EXPLODE: instead of size(intersect), each closing vertex c emits a
    * (a, b, c) row so all three corners can be credited. The extra
    * shuffle volume is 3 rows per triangle — proportional to the
    * answer, not the graph. Nodes in no triangle keep degree rows with
    * cc 0 (LEFT join from the degree table); degree-1 nodes have no
    * wedge and report 0 by convention. */
  def localClustering(edges: DataFrame): DataFrame = {
    val e = edges.persist()
    e.count() // materialize before multi-leg consumers (see triangleCount)
    val deg = degrees(e)
    val e0 = e.select(col("item_a").as("x"), col("item_b").as("y"))
      .join(deg.select(col("item").as("x"), col("degree").as("dx")), "x")
      .join(deg.select(col("item").as("y"), col("degree").as("dy")), "y")
    val oriented = e0.select(
        when(col("dx") < col("dy") ||
            (col("dx") === col("dy") && col("x") < col("y")),
          struct(col("x").as("a"), col("y").as("b")))
          .otherwise(struct(col("y").as("a"), col("x").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist()
    oriented.count()
    val adj = oriented.groupBy("a")
      .agg(sort_array(collect_list(col("b"))).as("nb"))
    val corners = oriented
      .join(adj.select(col("a").as("ja"), col("nb").as("na")), col("a") === col("ja"))
      .join(adj.select(col("a").as("jb"), col("nb").as("nbb")), col("b") === col("jb"))
      .select(col("a"), col("b"),
        explode(array_intersect(col("na"), col("nbb"))).as("c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_tri"))
    val out = deg.join(corners, Seq("item"), "left")
      .select(col("item"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_pm", expr(
        "CASE WHEN degree >= 2 THEN (2000 * n_tri) div (degree * (degree - 1)) ELSE 0 END"))
      .localCheckpoint()
    oriented.unpersist()
    e.unpersist()
    out
  }

  /** Common-neighbor LINK PREDICTION: for each node, the top-k
    * non-neighbors ranked by shared-neighbor count — "customers who
    * bought these parts together also bought" / co-appointment
    * introduction candidates. Wedge enumeration joins the undirected
    * adjacency with itself on the MIDDLE node, so the cost is
    * Σ deg(m)² over middles; middles above `maxMiddleDeg` are EXCLUDED
    * — the standard heavy-middle cut (a hub co-purchased with
    * everything contributes no signal per pair and owns the whole
    * quadratic cost; the same reasoning as prefix-filter's stopword
    * drop). The cut is part of the operator's semantics, replayed by
    * the oracle, not a silent truncation. Existing edges anti-join
    * away; the per-node top-k uses the skew-proof TopK partial
    * aggregate (shuffle ≤ nodes × k).
    * Output: (node, rec, cn, rank), rank by (cn DESC, rec ASC). */
  def commonNeighbors(edges: DataFrame, k: Int,
      maxMiddleDeg: Long): DataFrame = {
    val und = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"), col("item_a").as("dst")))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val mid = und.join(deg.filter(col("deg") <= maxMiddleDeg), "src")
    val wedges = mid.select(col("src").as("m"), col("dst").as("a"))
      .join(mid.select(col("src").as("m"), col("dst").as("b")), Seq("m"))
      .filter(col("a") < col("b"))
    val cn = wedges.groupBy("a", "b").agg(count(lit(1)).as("cn"))
      // sharedKeyEdges emits canonical item_a < item_b pairs — anti-join
      // drops pairs already connected
      .join(edges.select(col("item_a").as("a"), col("item_b").as("b")),
        Seq("a", "b"), "left_anti")
    val perNode = cn.select(col("a").as("node"), col("b").as("rec"), col("cn"))
      .unionByName(cn.select(col("b").as("node"), col("a").as("rec"), col("cn")))
    val topk = TopK.topKW(k)
    perNode.groupBy("node")
      .agg(topk(col("cn").cast("double"), col("rec").cast("long"),
        col("cn").cast("double")).as("top"))
      .select(col("node"), posexplode(col("top")))
      .select(col("node"), col("col.id").as("rec"),
        col("col.w").cast("long").as("cn"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** PageRank over an undirected edge list, in 64-bit fixed point.
    *
    * Ranks are integers in units of 10⁻¹² (node starts at `Unit12` =
    * one full rank); each iteration is
    * `rank' = 0.15 + 0.85 · Σ contrib` computed as
    * `150e9 + (85 · Σ (rank DIV degree)) DIV 100` — integer division
    * and integer sums only. Floating-point PageRank is not reproducible
    * across engines or even across partitionings (double addition is
    * order-sensitive); fixed point makes every iteration bit-exact on
    * any engine and any shuffle order, which is what lets the DuckDB
    * oracle replay it. The truncation error is ≤ degree·10⁻¹² per node
    * per iteration — noise relative to rank magnitude 1.0.
    *
    * Scale shape: each iteration is one equi-join (ranks to directed
    * edges on src — both sides hash-partitioned on the same key) and
    * one groupBy(dst) sum. No driver-side state, no collect; the rank
    * vector stays distributed. Iteration count is a constant, so the
    * lineage stays shallow enough to skip checkpointing. */
  val Unit12 = 1000000000000L

  /** Multi-source BFS hop distance over the undirected item graph —
    * "how far is every product from the seed set" (the reference's
    * network screens walk 1 hop; this is the general k-hop reach).
    * Frontier expansion: seeds start at hop 0; each round joins ONLY
    * the current frontier to the adjacency, anti-joins what's already
    * reached (first discovery IS the min hop — the BFS invariant), and
    * unions the new layer in. maxHops rounds of equi-join + anti-join,
    * frontier-sized inputs — the standard distributed BFS. For deep
    * traversals add a localCheckpoint every few rounds (the
    * connectedComponents lineage lesson); at the small fixed depths a
    * reachability report uses, plain lineage is cheaper. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val directed = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"), col("item_a").as("dst")))
    var dist = seeds.select(col("node"), lit(0L).as("hop"))
    var frontier = dist.select("node")
    for (h <- 1 to maxHops) {
      val next = directed.join(frontier,
          directed("src") === frontier("node")).drop("node")
        .select(col("dst").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(h.toLong).as("hop"))
      dist = dist.unionByName(next)
      frontier = next.select("node")
    }
    dist
  }

  /** HYPERBALL (Boldi & Vigna 2013, "In-core computation of geometric
    * centralities with HyperBall"): the NEIGHBORHOOD FUNCTION N(t) —
    * how many (node, reached-node) pairs exist within t hops — via one
    * HLL counter per node, max-merged along edges each round. This is
    * the algorithm behind the "four degrees of separation" measurement
    * at web/social scale: exact |ball(v,t)| needs a BFS per node
    * (|V|·|E| work), while a mergeable sketch per node costs
    * |E|·registers shuffle per round, independent of ball size.
    *
    * Registers are the oracle-exact hash56 HLL geometry
    * ([[Sketches.hllRegisters]]): counters init to {v} itself, and
    * round t replaces each counter with the register-max of itself and
    * its neighbors' counters — max-merge IS the sketch's union, so
    * after t rounds node v's counter sketches exactly ball(v, t). Per
    * round the whole state is one equi-join (edges × register rows) +
    * one max groupBy, localCheckpoint-truncated like the other
    * iterative operators. Balls at small t sit in the
    * linear-counting range, so this also exercises the small-range
    * branch at per-node scale.
    *
    * Output: one row per hop 0..rounds — (hop, n_nodes,
    * ball_milli = Σ_v floor(1000·est|ball(v,hop)|) in exact fixed
    * point, summed as BIGINT so the cross-node reduction is
    * order-independent and engine-exact). */
  /** SAMPLED-SOURCE BETWEENNESS CENTRALITY (Brandes 2001's dependency
    * accumulation, over the source sample of Brandes & Pich 2007,
    * truncated at `depth` hops — the k-bounded variant): which nodes
    * sit on the most shortest paths? Exact all-pairs betweenness is
    * Θ(|V|·|E|); the standard at-scale estimator runs Brandes' two
    * passes from a fixed source sample (here the `nSources` smallest
    * node ids — deterministic, replayable) and bounds the BFS at
    * `depth` (path mass beyond a few hops is negligible on
    * small-world graphs and the bound caps every frontier). Pivots
    * are the `nSources` HIGHEST-DEGREE nodes (ties to the smaller id)
    * — Brandes & Pich's high-centrality pivot heuristic, and on a
    * sparse co-purchase graph the choice that actually covers path
    * mass (the smallest-id sample lands in leaf components and sees
    * almost nothing).
    *
    * Both passes are level-synchronous joins, all state keyed
    * (src, node) ≤ sources·|V| rows:
    *   forward  σ_t(v) = Σ_{u ∈ parents} σ_{t−1}(u)  (path counts,
    *            exact integers; parents = settled-at-t−1 neighbors)
    *   backward δ(v)   = Σ_{w ∈ successors} σ_v/σ_w · (1 + δ(w))
    * The backward division makes δ rational, and float summation
    * order would diverge cross-engine — so δ is held in 1e-6 FIXED
    * POINT with a per-edge floor: δ6(v) = Σ_w ⌊σ_v·(10⁶ + δ6(w))/σ_w⌋,
    * an order-independent integer sum both engines replay bit-exactly
    * (truncation ≤ 1e-6 per edge is part of the statistic's
    * definition, the t30/j19 fixed-point discipline). Products ride
    * DECIMAL(38,0)/HUGEINT; σ stays well under 2⁶³ for any depth-4
    * ball with degrees below ~2¹⁵.
    *
    * Returns the top-`topK` (node, b6 = Σ_sources δ6) by centrality,
    * ties to the smaller node id. */
  def betweennessSampled(edges: DataFrame, nSources: Int = 8,
      depth: Int = 4, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38(c: Column) = c.cast(DecimalType(38, 0))
    val und = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"),
        col("item_a").as("dst")))
      .localCheckpoint()
    val sources = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node")).limit(nSources)
      .select("node")
    // forward: one frame per level, (s, node, sigma)
    var levels = Vector(
      sources.select(col("node").as("s"), col("node"),
        lit(1L).as("sigma")).localCheckpoint())
    var settled = levels.head
    for (_ <- 1 to depth) {
      val next = levels.last.join(und, col("node") === und("src"))
        .groupBy(col("s"), col("dst").as("node"))
        .agg(sum("sigma").as("sigma"))
        .join(settled.select("s", "node"), Seq("s", "node"), "left_anti")
        .localCheckpoint()
      levels = levels :+ next
      settled = settled.unionByName(next)
    }
    // backward: deepest level's delta is 0 (successors out of bound);
    // level t pulls from level t+1 through the edge list
    var delta: DataFrame = levels.last.select(col("s"), col("node"),
      lit(0L).as("d6"))
    val perLevelDeltas = (depth - 1 to 1 by -1).map { t =>
      val cur = levels(t)
      val succ = levels(t + 1).select(col("s").as("s2"),
        col("node").as("w"), col("sigma").as("sigma_w"))
      val dw = delta.select(col("s").as("s3"), col("node").as("w3"),
        col("d6"))
      val dt = cur
        .join(und, cur("node") === und("src"))
        .join(succ, col("s") === col("s2") && col("w") === und("dst"))
        .join(dw, col("s") === col("s3") && col("w3") === col("w"), "left")
        .select(col("s"), col("node"),
          expr("CAST(sigma AS DECIMAL(38,0)) * (1000000 + coalesce(d6, CAST(0 AS BIGINT)))")
            .as("num"),
          d38(col("sigma_w")).as("den"))
        .groupBy("s", "node")
        .agg(sum(expr("num div den")).as("d6"))
        .localCheckpoint()
      delta = dt
      dt
    }
    // depth <= 1 has no interior vertex on any shortest path, so every
    // sampled dependency is zero: the per-level seq is empty and the
    // contract is an empty top-k, not a reduce() throw on the edge case
    perLevelDeltas.reduceOption(_.unionByName(_))
      .getOrElse(delta.limit(0))
      .groupBy("node").agg(sum("d6").as("b6"))
      .orderBy(col("b6").desc, col("node")).limit(topK)
  }

  def hyperBall(edges: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"),
        col("item_a").as("dst")))
    val nodes = und.select(col("src").as("node")).distinct()
    var regs = Sketches.hllRegisters(nodes, "node", "node")
      .withColumnRenamed("grp", "node").localCheckpoint()
    def roundStats(t: Int, r: DataFrame): DataFrame =
      Sketches.hllEstimate(r.withColumnRenamed("node", "grp"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(floor(col("hll_est") * 1000).cast("long")).as("ball_milli"))
        .select(lit(t.toLong).as("hop"), col("n_nodes"), col("ball_milli"))
    var out = roundStats(0, regs)
    for (t <- 1 to rounds) {
      val fromNbrs = und.join(regs.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("bucket"), col("reg"))
      regs = regs.unionByName(fromNbrs)
        .groupBy("node", "bucket").agg(max("reg").as("reg"))
        .localCheckpoint()
      out = out.unionByName(roundStats(t, regs))
    }
    out
  }

  /** DETERMINISTIC RANDOM WALKS — the corpus generator for graph
    * embeddings (DeepWalk/node2vec first-order walks, Perozzi et al.
    * 2014): one length-`steps` walk per seed, where step t moves to
    * neighbor number hash56(walk ':' t) mod degree under a SORTED
    * neighbor order. Hash-driven instead of rand(): any engine, any
    * re-run, any partitioning deals the identical walks (the txt_shuffle
    * / epochShuffle policy — determinism is what makes a 100 TB walk
    * corpus resumable and oracle-checkable), while hash56's avalanche
    * still gives each (walk, step) an independent uniform draw.
    *
    * Scale shape: the adjacency position index is one per-src window
    * (partitioned, never global); each step is one equi-join of the
    * walk frontier against degree + adjacency — walks × steps total
    * join rows, never materializing more than the frontier. */
  def randomWalks(edges: DataFrame, seeds: DataFrame,
      steps: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"),
        col("item_a").as("dst")))
    val adj = und.withColumn("pos",
      row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    var cur = seeds.select(col("node").as("walk"), col("node"))
    var out = cur.withColumn("step", lit(0L))
    for (t <- 1 to steps) {
      cur = cur
        .join(deg.withColumnRenamed("src", "node"), "node")
        .withColumn("pick",
          Dedup.hash56(concat(col("walk").cast("string"), lit(":"),
            lit(t.toString))) % col("deg"))
        .join(adj.withColumnRenamed("src", "node"), "node")
        .filter(col("pos") === col("pick"))
        .select(col("walk"), col("dst").as("node"))
      out = out.unionByName(cur.withColumn("step", lit(t.toLong)))
    }
    out.select("walk", "step", "node")
  }

  /** Bounded-horizon weighted shortest paths (Bellman–Ford): after k
    * relaxation rounds, `dist` is EXACTLY the cheapest path of at most
    * k edges from any seed — the fixed-iteration contract every other
    * iterative operator here uses ([[pagerankFixed]], [[bfsHops]]),
    * which is also what makes it oracle-able (the oracle unrolls the
    * same k rounds). [[bfsHops]] is the w≡1 special case, but hop
    * count is not cost: a 2-hop route through strong ties beats a
    * 1-hop weak tie under a strength-derived weight, which is the
    * point of running weighted.
    *
    * Scale shape: each round is one equi-join of the directed edges
    * against the current distance frame plus one min-combine groupBy —
    * both partial-aggregated map-side, no frontier state on the
    * driver; the edge relation is reused across rounds (lazy — one
    * materialization under ReuseExchange). Integer weights, so min is
    * exact on any engine. Edges are undirected (item_a, item_b, w). */
  def ssspFixed(edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    val directed = edges
      .select(col("item_a").as("src"), col("item_b").as("dst"), col("w"))
      .unionByName(edges
        .select(col("item_b").as("src"), col("item_a").as("dst"), col("w")))
    var dist = seeds.select(col("node"), lit(0L).as("dist"))
    for (_ <- 1 to iters) {
      val relaxed = directed.join(dist, directed("src") === dist("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
    }
    dist
  }

  /** Personalized PageRank — [[pagerankFixed]] with the teleport mass
    * pinned to a SEED set ("entities similar to THESE", the
    * recommendation/expansion primitive; global PageRank answers
    * "globally important"). Same 10⁻¹² integer units, same lazy
    * ReuseExchange iteration shape; two differences, both forced by
    * the semantics: ranks seed at Unit12·1[v∈S], and each step is a
    * LEFT join of the full node set against incoming contributions —
    * the inner-join form global PageRank uses would drop a seed with
    * no in-edges and lose its teleport mass. The node universe is the
    * edge endpoints UNION the seeds: a seed outside the edge list
    * entirely (the "expand from this cold entity" call) still holds
    * its teleport share and converges to 0.15·Unit12 rather than
    * silently vanishing from the output. */
  def personalizedPagerankFixed(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    val directed = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"), col("item_a").as("dst")))
    val deg = directed.groupBy("src").agg(count(lit(1)).as("deg"))
    val adj = directed.join(deg, "src")
    val base = deg.select(col("src").as("node"))
      .unionByName(seeds.select(col("node")))
      .distinct()
      .join(seeds.select(col("node")).distinct().withColumn("__s", lit(1L)),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("is_seed"))
    var ranks = base.select(col("node"),
      (col("is_seed") * lit(Unit12)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("pr DIV deg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
      ranks = base.join(contrib, base("node") === contrib("dst"), "left_outer")
        .select(base("node"),
          (col("is_seed") * lit(Unit12 * 15 / 100) +
            expr("(85 * coalesce(s, 0)) DIV 100")).as("pr"))
    }
    ranks
  }

  /** WARM-START PageRank maintenance — the graph half of the
    * incremental story that [[Dedup.applyComponentDelta]] opened for
    * clustering: after edges arrive, re-converge from the STORED ranks
    * instead of from the uniform vector (the power-method restart;
    * Langville & Meyer 2006 treat updated-graph restarts — the old
    * vector is close to the new fixed point when the update is small,
    * so far fewer iterations re-converge than a cold run needs).
    *
    * Nodes the store has never seen enter at the uniform unit; stored
    * nodes keep their rank. The recurrence is bit-for-bit
    * [[pagerankFixed]]'s integer step on the NEW graph, so the oracle
    * replays warm-start exactly: base unrolled, extend, warm iterations
    * unrolled. Cost per maintenance: `iters` joins over the updated
    * adjacency — with iters chosen smaller than a cold run's, which is
    * the entire point. */
  def pagerankWarm(stored: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    val directed = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"), col("item_a").as("dst")))
    val deg = directed.groupBy("src").agg(count(lit(1)).as("deg"))
    val adj = directed.join(deg, "src")
    var ranks = deg.select(col("src").as("node"))
      .join(stored.select(col("node"), col("pr").as("pr0")), Seq("node"), "left")
      .select(col("node"), coalesce(col("pr0"), lit(Unit12)).as("pr"))
    for (_ <- 1 to iters) {
      ranks = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("pr DIV deg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
        .select(col("dst").as("node"),
          (lit(Unit12 * 15 / 100) + expr("(85 * s) DIV 100")).as("pr"))
    }
    ranks
  }

  def pagerankFixed(edges: DataFrame, iters: Int): DataFrame = {
    val directed = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"), col("item_a").as("dst")))
    val deg = directed.groupBy("src").agg(count(lit(1)).as("deg"))
    // Deliberately LAZY: the final plan references `adj` once per
    // iteration, but every reference produces byte-identical Exchanges
    // over the edge build, and ReuseExchange dedups them inside the one
    // job — measured FASTER than an eager persist+count+localCheckpoint
    // variant (3.0 s vs 4.5 s at sf0.1: the eager form pays extra jobs,
    // cache writes, and a result re-scan to avoid a recompute that the
    // optimizer already avoids). Contrast triangleCount, where the
    // fan-out feeds exchanges with DIFFERENT shapes, reuse cannot fire,
    // and the persist is load-bearing (measured 4+ rebuilds without it).
    // If a future Spark's AQE gives the iteration legs divergent
    // partitionings, re-measure before reaching for persist.
    val adj = directed.join(deg, "src")
    var ranks = deg.select(col("src").as("node"), lit(Unit12).as("pr"))
    for (_ <- 1 to iters) {
      ranks = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("pr DIV deg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
        .select(col("dst").as("node"),
          (lit(Unit12 * 15 / 100) + expr("(85 * s) DIV 100")).as("pr"))
    }
    ranks
  }

  /** Synchronous label-propagation community detection (Raghavan,
    * Albert & Kumara 2007), made DETERMINISTIC for the oracle: every
    * node starts as its own label; each round every node adopts the
    * most frequent label among its neighbors, ties to the SMALLEST
    * label; all nodes update together (synchronous — the classic
    * oscillation caveat is why `iters` is fixed, not run to
    * convergence). Each round is one equi-join of the directed edges
    * against the label frame plus one two-level count/argmax groupBy —
    * both map-side combined, no driver state, the pagerankFixed
    * iteration shape (ReuseExchange dedups the adjacency build across
    * rounds). argmax via max_by over the (count, −label) struct — total
    * order, so the answer is unique and hash-checkable. */
  /** Bounded k-core peeling (Seidman 1983's coreness, the Batagelj–
    * Zaveršnik peel expressed as rounds): each round drops every node
    * whose surviving degree is < k, then every edge touching a dropped
    * node; `rounds` rounds of simultaneous peeling. Run to a fixpoint
    * this yields the exact k-core; bounded rounds are the distributed
    * form (the same trade as [[ssspFixed]]'s bounded horizon) and are
    * exactly what each synchronous Pregel superstep computes.
    *
    * Round shape: both endpoint degrees attach as per-partition WINDOW
    * counts (src-window, then dst-window — the directed view carries
    * both orientations, so in-degree == out-degree and the dst window
    * is the dst node's degree), then one filter keeps edges whose BOTH
    * endpoints survive. Two shuffles per round, and the edge frame is
    * referenced ONCE per round — the earlier degree-aggregate + two
    * semi-joins form referenced it three times, nesting two copies of
    * round r−1 inside round r's plan (measured 3.8 s vs 2.x s at sf0.1:
    * the exchange shapes differ, so ReuseExchange can't collapse them
    * the way it does for [[pagerankFixed]]'s identical adjacency legs).
    * Cost ∝ surviving edges, shrinking monotonically; no driver state.
    * Returns (node, degree) over the surviving edge set. */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var e = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"), col("item_a").as("dst")))
    for (_ <- 1 to rounds) {
      e = e.withColumn("ds", count(lit(1)).over(Window.partitionBy("src")))
        .withColumn("dd", count(lit(1)).over(Window.partitionBy("dst")))
        .filter(col("ds") >= k && col("dd") >= k)
        .select("src", "dst")
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .select(col("src").as("node"), col("degree"))
  }

  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val directed = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"), col("item_a").as("dst")))
    var labels = directed.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      labels = directed.join(labels, directed("src") === labels("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("n"))
        .groupBy(col("dst"))
        .agg(max_by(col("label"),
          struct(col("n"), (-col("label")).as("nl"))).as("label"))
        .select(col("dst").as("node"), col("label"))
    }
    labels
  }
}
