package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force cosine top-k is the exactness baseline; the LSH
  * (random-hyperplane) bucketed variant is the scale path: at 100 TB the
  * query side is broadcast and candidates are pruned to same-bucket rows,
  * turning O(Q×N) scoring into O(Q×N/2^planes) expected.
  *
  * All arithmetic is double-precision sequential folds so the DuckDB
  * oracle (list_reduce with the same operand order) reproduces results
  * bit-for-bit. Hyperplanes are integer-valued and deterministic.
  */
object Similarity {

  /** Elementwise float→double view of an embedding. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity (dot / (‖a‖·‖b‖)), 0.0 on zero norms. One-pass
    * codegen expression — bit-identical to the composed
    * sqrt(dot)/zip_with form (same fold order, same double ops), which
    * the DuckDB oracle keeps; the composed form traversed each array
    * five times and materialized two cast copies per row. */
  def cosine(aRaw: Column, bRaw: Column): Column =
    graft.plans.CosineSim.cosineSim(aRaw, bRaw)

  /** Brute-force cosine top-k: every query row scored against every
    * candidate row, ranked per query. Query side must be small (it is
    * broadcast); candidate side streams in one pass. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cos")
  }

  /** MAX-INNER-PRODUCT search via the augmentation reduction (Bachrach
    * et al. 2014, RecSys — "Speeding up the Xbox recommender system
    * using a Euclidean transformation for inner-product spaces"; the
    * trick every MIPS-serving recommender rests on): inner product is
    * NOT a metric (a vector can be its own worst neighbor), so cosine/
    * L2 index structures don't apply directly — but appending one
    * dimension, candidate c' = [c, √(M² − ‖c‖²)] with M = max‖c‖ and
    * query q' = [q, 0], makes every augmented candidate the same norm
    * M, and cos(q', c') = ⟨q,c⟩/(‖q‖·M) — a MONOTONE transform of the
    * inner product. Rank by augmented cosine and the whole cosine ANN
    * family (IVF/PQ/binary) becomes a MIPS index for free.
    *
    * This is the truth instrument: brute-force both the direct inner
    * product and the augmented cosine per (query, candidate), ranked
    * by the latter — emitting both lets the oracle (and the spec's
    * rank-parity check) pin that the reduction preserves order, ties
    * included (same cand_id tiebreak on both sides). The appended
    * terms fold LAST in the sequential dot (x + 0.0 == x in IEEE), so
    * augmented values are bit-derivable in both engines. M² rides a
    * 1-row broadcast; the query side broadcasts like every brute
    * instrument. */
  def mipsTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dbl(v: Column) = transform(v, x => x.cast("double"))
    val c = candidates.select(col(idCol).as("cand_id"),
      dbl(col(vecCol)).as("cv"))
    val m2 = c.agg(max(dot(col("cv"), col("cv"))).as("m2"))
    val cAug = c.crossJoin(broadcast(m2))
      .withColumn("cva",
        concat(col("cv"), array(sqrt(col("m2") - dot(col("cv"), col("cv"))))))
      .select("cand_id", "cv", "cva")
    val q = queries.select(col(idCol).as("query_id"),
      dbl(col(vecCol)).as("qv"))
      .withColumn("qva", concat(col("qv"), array(lit(0.0))))
    val scored = cAug.join(broadcast(q))
      .withColumn("ip", dot(col("qv"), col("cv")))
      .withColumn("cos_aug",
        dot(col("qva"), col("cva")) /
          (sqrt(dot(col("qva"), col("qva"))) *
            sqrt(dot(col("cva"), col("cva")))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_aug").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "ip", "cos_aug")
      .orderBy("query_id", "rank")
  }

  /** HARD-NEGATIVE mining for contrastive training: each query's k
    * most-similar candidates with a DIFFERENT label — the pairs an
    * embedding trainer wants precisely because the current geometry
    * confuses them (in-batch random negatives are mostly easy; hard
    * negatives carry the gradient). Anchor/positive pairs come free
    * from the label structure; this finds the negatives. Brute variant
    * with the query side broadcast — the truth instrument; at corpus
    * scale run the same label anti-filter after the IVF/LSH candidate
    * stage (serveTopK with k·headroom, then filter, then re-rank),
    * which keeps the mining ∝ probed cells exactly like serving. */
  def hardNegatives(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("q_label"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col(labelCol).as("c_label"))
    val scored = c.join(broadcast(q), col("q_label") =!= col("c_label"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "q_label", "cand_id", "c_label", "rank", "cos")
  }

  /** Symmetric int8 SCALAR quantization (SQ8) top-k — the third member
    * of the quantized-serve family (PQ = sim_pq_adc, binary =
    * sim_binary_*): per-dim corpus min/max is the train step, both
    * sides code as q_i = clamp(⌊(x_i − mn_i)·255 / (mx_i − mn_i)⌋, 0,
    * 255), candidates rank by the INTEGER code dot product. 4 bytes/dim
    * becomes 1, the scorer is integer MACs, and — unlike a float
    * ADC — the whole ranking is exact BIGINT arithmetic after two
    * exactly-rounded IEEE ops per dim, so the DuckDB oracle replays it
    * bit-for-bit. Query values outside the corpus range clamp to the
    * code boundary (the standard SQ contract); degenerate dims
    * (mx == mn) code to 0 on both sides. The 1-row stats frame is
    * broadcast; the query side is broadcast into one candidate pass. */
  def sq8TopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cD = candidates.select(col(idCol).as("cand_id"),
      asDouble(col(vecCol)).as("cv"))
    val qD = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val stats = cD.agg(
      array((1 to dims).map(i => min(element_at(col("cv"), i))): _*).as("mn"),
      array((1 to dims).map(i => max(element_at(col("cv"), i))): _*).as("mx"))
    def codes(v: String) = expr(
      s"""transform($v, (x, i) -> CASE
          WHEN element_at(mx, i + 1) = element_at(mn, i + 1)
            THEN CAST(0 AS BIGINT)
          ELSE least(greatest(CAST(floor(
              (x - element_at(mn, i + 1)) * 255.0D /
              (element_at(mx, i + 1) - element_at(mn, i + 1))) AS BIGINT),
            CAST(0 AS BIGINT)), CAST(255 AS BIGINT)) END)""")
    val qc = qD.crossJoin(broadcast(stats))
      .select(col("query_id"), codes("qv").as("qcode"))
    val cc = cD.crossJoin(broadcast(stats))
      .select(col("cand_id"), codes("cv").as("ccode"))
    val scored = cc.join(broadcast(qc), col("query_id") =!= col("cand_id"))
      .withColumn("dotq", expr(
        """aggregate(zip_with(qcode, ccode, (a, b) -> a * b),
           CAST(0 AS BIGINT), (s, x) -> s + x)"""))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dotq").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "dotq")
  }

  /** Deterministic integer hyperplane component for plane j, dim i —
    * shared with the oracle SQL builder. Values in [−504, 504]. */
  def planeCoeff(j: Int, i: Int): Long =
    ((i + 1).toLong * (j + 3).toLong * 2654435761L) % 1009L - 504L

  /** Sign-bit LSH bucket id from `planes` random hyperplanes. Integer
    * plane coefficients are exact in doubles, so the bucket id is
    * reproducible across engines. */
  def lshBucket(vRaw: Column, planes: Int, dims: Int): Column =
    lshBucketTable(vRaw, 0, planes, dims)

  /** Bucket id for hash TABLE `table` of a multi-table LSH index: bit p
    * comes from global hyperplane table·planes + p, so every table sees
    * an independent plane set and table 0 with `planes` planes is
    * exactly [[lshBucket]]. */
  def lshBucketTable(vRaw: Column, table: Int, planes: Int, dims: Int): Column = {
    val v = asDouble(vRaw)
    (0 until planes).map { p =>
      val j = table * planes + p
      val coeffs = array((0 until dims).map(i => lit(planeCoeff(j, i).toDouble)): _*)
      when(dot(v, coeffs) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k: brute-force ranking restricted to same-LSH-bucket
    * candidates. Recall < 1 by construction; the bucket join replaces the
    * all-pairs product. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "bucket", "rank", "cos")
  }

  /** OR-amplified multi-table LSH ANN top-k — the standard fix for the
    * single-table recall cliff ([[recallAtK]] measures table-of-8-planes
    * recall at 0.00 on near-uniform vectors): `tables` independent hash
    * tables of `planes` planes each, a candidate qualifies by
    * co-bucketing with the query in ANY table (OR construction —
    * Indyk & Motwani's E2LSH shape), then exact cosine re-rank over the
    * distinct candidate set. Collision odds per table are ~2^-planes for
    * a random pair but far higher for true neighbors, and the OR over
    * tables amplifies toward 1 − (1 − p^planes)^tables.
    *
    * Scale shape: both sides emit `tables` bucket rows per vector
    * (in-row posexplode, no shuffle); the candidate join is an equi-join
    * on (table, bucket) with the query side broadcast; the distinct
    * collapses multi-table hits BEFORE vectors are re-read, so each
    * candidate vector is fetched once via one shuffle-join on cand_id. */
  def lshMultiTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int, tables: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def buckets(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
          posexplode(array((0 until tables).map(t =>
            lshBucketTable(col(vecCol), t, planes, dims)): _*)))
        .select(col(id), col("pos").as("tbl"), col("col").as("bucket"))
    val cand = buckets(candidates, "cand_id")
      .join(broadcast(buckets(queries, "query_id")), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id")
      .distinct()
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = cand.join(broadcast(q), "query_id").join(c, "cand_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cos")
  }

  /** IVF-style ANN top-k: a deterministic coarse quantizer (seed
    * centroids = the vectors whose id ≡ 0 mod `seedStride`, no Lloyd
    * refinement — documented simplification), each vector assigned to
    * its nearest centroid cell, queries probing their `nprobe` nearest
    * cells, exact re-rank inside the probed cells.
    *
    * Scale shape: the centroid table is tiny and broadcast twice
    * (assignment + probe); the only wide operation is the equi-join on
    * cell id — candidates shrink by ~|cells|/nprobe versus brute force. */
  /** Nearest-centroid cell assignment — the shared IVF coarse quantizer:
    * each row of `df` keeps its `keep` max-cosine cells from the
    * broadcast centroid table (ties to the smaller cell id, the order
    * every oracle replays). Returns (id, v, cell). */
  /** Public: also the bucketizer for embedding-distribution drift
    * (sim_embed_drift feeds these assignments to Profile.driftReport). */
  def nearestCells(cents: DataFrame, df: DataFrame, id: String,
      v: String, keep: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(id).orderBy(col("cos_c").desc, col("cent_id"))
    df.crossJoin(broadcast(cents))
      .withColumn("cos_c", cosine(col(v), col("cent_v")))
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= keep)
      .select(col(id), col(v), col("cent_id").as("cell"))
  }

  def ivfTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, seedStride: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = candidates
      .filter(col(idCol) % seedStride === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
    val cellCand = nearestCells(cents, candidates.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv")), "cand_id", "cv", keep = 1)
    val cellQ = nearestCells(cents, queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")), "query_id", "qv", keep = nprobe)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    cellCand.join(cellQ, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cos")
  }

  /** IVF with SOFT ASSIGNMENT (spill) — the recall lift that beats
    * raw probe-widening on hard geometries. Each CANDIDATE is stored in
    * its `spill` nearest cells (the FAISS-replication / SPANN
    * boundary-duplication trade: Chen et al. 2021 replicate vectors
    * near cell boundaries exactly because nearest-neighbor misses
    * concentrate there), and each query probes its `nprobe` nearest
    * cells; a (query, candidate) pair colliding through several cells
    * dedupes BEFORE the exact re-rank (the lshMultiTopK OR-pattern).
    * Measured on the worst-case uniform sf0.01 geometry: keep=1/nprobe=2
    * recall 0.24; widening probes alone needs nprobe=12 for 0.52; spill=2
    * with nprobe=8 reaches 0.66 at ~2/3 the probe cost — storage ×spill
    * buys more recall than query-time fan-out, because a true neighbor
    * in an adjacent cell is found by EITHER side crossing the boundary.
    *
    * Scale shape: identical to ivfTopK — broadcast centroid table, one
    * equi-join on cell id; the posting lists are ×spill rows and the
    * candidate set per query ∝ nprobe·spill·cell-size. */
  def ivfMultiprobeTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, seedStride: Int, nprobe: Int,
      spill: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = candidates
      .filter(col(idCol) % seedStride === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cellCand = nearestCells(cents, c, "cand_id", "cv", keep = spill)
    val cellQ = nearestCells(cents, q, "query_id", "qv", keep = nprobe)
    val pairs = cellCand.select("cell", "cand_id")
      .join(broadcast(cellQ.select("cell", "query_id")), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id")
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    pairs.join(broadcast(q), "query_id").join(c, "cand_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cos")
  }

  /** Recall@k of an approximate top-k result against the verified
    * brute-force truth — the number that justifies (or indicts) an ANN
    * bucketing trade. For each truth (query_id, cand_id) pair, a hit is
    * its presence in `approx`; recall = hits / k per query. Composes two
    * already-computed result sets, so the only work is one equi-join on
    * (query_id, cand_id) and a groupBy on query_id — both tiny (k rows
    * per query) regardless of corpus size.
    * Returns (query_id, hits, recall). */
  def recallAtK(truth: DataFrame, approx: DataFrame, k: Int): DataFrame =
    truth.select("query_id", "cand_id")
      .join(approx.select(col("query_id"), col("cand_id"), lit(1).as("hit")),
        Seq("query_id", "cand_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits") / lit(k.toDouble)).as("recall"))

  /** SemDeDup-style semantic dedup pairs — the SCALE path for
    * embedding-space near-dup (dd_embed_cosine is the all-pairs
    * ground-truth baseline, honestly pinned to a bounded id slice):
    * assign every vector to its max-cosine coarse centroid (the
    * k-bounded broadcast codebook the IVF/k-means family uses), then
    * verify cosine ≥ `threshold` WITHIN cells only — the published
    * SemDeDup recipe (Abbas et al. 2023): semantic duplicates land in
    * the same cluster, so the quadratic verify runs per-cell, never
    * corpus-wide.
    *
    * Codebook selection is KMV-style: the `k` rows with the SMALLEST
    * md5-derived hash56(id) become the centroids — a deterministic
    * uniform sample of FIXED size, independent of corpus size (the
    * earlier id-stride form grew the codebook linearly with N, which
    * made the driver collect and the per-row argmax expression unbounded
    * at 100 TB). Oracle-replayable as `ORDER BY hash56(id), id LIMIT k`.
    *
    * Scale shape: the k-bounded codebook is a TakeOrdered of k rows
    * (collected once, k ≤ 4096 enforced) and the argmax is a PER-ROW
    * `greatest(struct(cos, -cid)…)` expression over centroid literals —
    * assignment does zero shuffle and zero row amplification (a
    * crossJoin+window form would shuffle rows × k by vector id). The
    * only wide operation is the pair equi-join on the cell id. Cell
    * sizes are corpus/k in expectation; the per-cell verify is the
    * SemDeDup trade — pick k so cells fit a task, exactly like IVF's
    * cell sizing (SemDeDup proper uses 50k clusters for web scale). */
  def semanticDupPairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 2 && k <= 4096,
      s"codebook size must be driver-bounded: 2 <= k <= 4096, got $k")
    val cents: Seq[(Long, Seq[Double])] = df
      .select(col(idCol).cast("long").as("vid"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"),
        Dedup.hash56(col(idCol).cast("string")).as("h"))
      .orderBy(col("h"), col("vid"))
      .limit(k)
      .select(col("vid"), col("v"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    semanticDupPairsWith(df, idCol, vecCol, cents, threshold)
  }

  /** [[semanticDupPairs]] against an EXPLICIT codebook — compose with
    * [[kmeansCentroids]] for Lloyd-refined cells (SemDeDup proper runs
    * k-means, not a raw sample; the KMV-seed default trades one
    * refinement pass for zero extra jobs). */
  def semanticDupPairsWith(df: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double])], threshold: Double): DataFrame = {
    require(cents.size >= 2,
      s"need at least two centroids, got ${cents.size}")
    require(cents.size <= 4096,
      s"codebook must stay a driver-bounded literal, got ${cents.size}")
    // struct comparison is lexicographic: max cosine first, then max
    // NEGATED centroid id — ties pick the smallest cid, matching the
    // oracle's ORDER BY cos_c DESC, cent_id ASC
    val best = greatest(cents.map { case (cid, cv) =>
      struct(cosine(col("v"), typedLit(cv)).as("c"), lit(-cid).as("nid"))
    }: _*)
    val cells = Scratch.cacheOnce(
      df.select(col(idCol).as("vid"), col(vecCol).as("v"))
        .withColumn("cell", -best.getField("nid"))
      ) // referenced by both sides of the pair join
    cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vid") < col("b.vid"))
      .withColumn("cos", cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.cell").as("cell"), col("a.vid").as("id_a"),
        col("b.vid").as("id_b"), col("cos"))
  }

  /** Fixed-point Lloyd k-means over an embedding column.
    *
    * Components are quantized once to integers (floor(x·10⁶)): every
    * distance is an integer sum of squared integer differences and
    * every centroid update is an integer-sum DIV count — both exact
    * and order-independent, so iterations are bit-reproducible across
    * engines and shuffle orders (floating-point Lloyd is neither: the
    * per-cluster mean depends on partition order). Quantization error
    * (≤10⁻⁶ per component) only perturbs assignments of points near a
    * Voronoi boundary — acceptable for a coarse quantizer, and the
    * determinism is what lets a SQL oracle replay the refinement.
    *
    * Seeds are the vectors with id ≡ 0 (mod seedStride) — the same
    * deterministic coarse init ivfTopK uses; this is its missing Lloyd
    * refinement. Cells keep their seed's id as label; a cell that loses
    * all members drops out.
    *
    * Scale shape per iteration (MLlib-style): the k·dims centroid table
    * is collected to the driver (bounded by construction — k is
    * data-size/seedStride by the caller's choice) and shipped back as a
    * single array literal, so ASSIGNMENT is a per-row argmin expression
    * with NO join and NO shuffle; the only wide operation is the
    * centroid UPDATE, a groupBy(cell, dim) whose output is exactly
    * k·dims rows. Iterations are driver-side actions, so lineage stays
    * one-iteration shallow (no 10-deep plan to re-optimize).
    *
    * Returns per-cluster stats after `iters` refinements: cluster id,
    * member count, and the exact fixed-point within-cluster squared
    * distance (units of 10⁻¹²). */
  /** Per-row nearest-centroid assignment over a shipped codebook
    * (codegen argmin, no join, no shuffle); expects (vid, qv). */
  private def assignTo(q: DataFrame,
      cents: Seq[(Long, Seq[Long])]): DataFrame =
    q.withColumn("best", graft.plans.NearestCentroid.nearest(col("qv"), cents))
      .select(col("vid"), col("qv"),
        col("best").getField("cid").as("cell"),
        col("best").getField("d").as("dist"))

  /** The Lloyd refinement of [[kmeansFixed]] surfaced as a codebook:
    * `iters` fixed-point refinements of the stride seeds, returned as
    * the (cid, components) list the IVF/PQ/semantic family ships as
    * literals. Bit-reproducible across engines (see kmeansFixed).
    * NOTE the stride seeding makes |codebook| = N/seedStride — the
    * caller owns the bound (kmeansFixed's documented contract); pipe
    * through [[kmeansCentroidsKmv]] when a FIXED size is required. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      seedStride: Int, iters: Int): Seq[(Long, Seq[Long])] = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.select(col(idCol).as("vid"), quantized(vecCol).as("qv"))
    val seeds = q.filter(col("vid") % seedStride === 0)
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    refine(q, seeds, iters)
  }

  /** [[kmeansCentroids]] with a SIZE-BOUNDED seed set: the k rows with
    * the smallest (hash56(id), id) — the same KMV-style deterministic
    * sample semanticDupPairs uses — Lloyd-refined `iters` times. The
    * codebook is exactly ≤ k regardless of corpus size, so consumers
    * with a driver-bounded-literal contract (semanticDupPairsWith's
    * per-row argmax) can never be fed an N-proportional centroid list. */
  def kmeansCentroidsKmv(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Seq[(Long, Seq[Long])] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 2 && k <= 4096, s"codebook size must be 2 <= k <= 4096, got $k")
    val q = df.select(col(idCol).as("vid"), quantized(vecCol).as("qv"))
    val seeds = df
      .select(col(idCol).cast("long").as("vid"), quantized(vecCol).as("qv"),
        Dedup.hash56(col(idCol).cast("string")).as("h"))
      .orderBy(col("h"), col("vid"))
      .limit(k)
      .select(col("vid"), col("qv"))
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    refine(q, seeds, iters)
  }

  /** Shared Lloyd loop over a pre-quantized (vid, qv) frame. */
  private def refine(q: DataFrame, seeds: Seq[(Long, Seq[Long])],
      iters: Int): Seq[(Long, Seq[Long])] = {
    val spark = q.sparkSession
    import spark.implicits._
    var cents = seeds
    for (_ <- 1 to iters) {
      cents = assignTo(q, cents)
        .select(col("cell"), posexplode(col("qv")))
        .groupBy("cell", "pos")
        .agg(sum("col").as("s"), count(lit(1)).as("n"))
        .select(col("cell"), col("pos"), expr("s DIV n").as("comp"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("pos"), col("comp")))).as("pc"))
        .select(col("cell"), expr("transform(pc, p -> p.comp)").as("cv"))
        .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
    }
    cents
  }

  def kmeansFixed(df: DataFrame, idCol: String, vecCol: String,
      seedStride: Int, iters: Int): DataFrame = {
    val q = df.select(col(idCol).as("vid"), quantized(vecCol).as("qv"))
    val cents = kmeansCentroids(df, idCol, vecCol, seedStride, iters)
    assignTo(q, cents)
      .groupBy(col("cell").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), sum("dist").as("ssd"))
  }

  /** Product-quantization encode: split each embedding into `subspaces`
    * contiguous sub-vectors and replace each with the id of its nearest
    * codebook entry (codebook = the seed vectors' sub-vectors, ids ≡ 0
    * mod seedStride — the same deterministic init the IVF/k-means family
    * uses; compose with kmeansFixed for refined codebooks).
    *
    * PQ is the compression step that makes billion-vector ANN feasible:
    * a 64-dim float vector becomes `subspaces` small ints plus a
    * reconstruction error. Same fixed-point quantization as kmeansFixed,
    * so codes and errors are bit-reproducible across engines.
    *
    * Scale shape: per-subspace codebooks are collected once (k·dims
    * driver-side, bounded by seedStride) and shipped as array literals;
    * encoding is a pure per-row expression — NO join, NO shuffle, and
    * it pipelines inside whole-stage codegen with the scan. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      seedStride: Int, subspaces: Int): DataFrame = {
    val q = df.select(col(idCol).as("vid"), quantized(vecCol).as("qv"))
    pqEncodeWith(q, collectSeeds(q, seedStride), subspaces)
  }

  /** [[pqEncode]] against an ALREADY-collected codebook over a
    * pre-quantized (vid, qv) frame — callers that also need the seeds
    * for an ADC LUT (pqAdcTopK, ivfAdcTopK) collect them exactly once
    * instead of paying a second driver collect + candidate scan. */
  private def pqEncodeWith(q: DataFrame, seeds: Seq[(Long, Seq[Long])],
      subspaces: Int): DataFrame =
    pqEncodeCbs(q, sliceCodebooks(seeds, subspaces))

  /** A full-width seed codebook viewed as `subspaces` independent
    * per-subspace codebooks (entry j holds each seed's j-th slice) —
    * the shared currency of the PQ family: raw seeds slice into it,
    * Lloyd refinement ([[pqRefineCodebooks]]) transforms within it. */
  private def sliceCodebooks(seeds: Seq[(Long, Seq[Long])],
      subspaces: Int): Seq[Seq[(Long, Seq[Long])]] = {
    val d = seeds.head._2.length / subspaces
    (0 until subspaces).map(j =>
      seeds.map { case (id, v) => (id, v.slice(j * d, j * d + d)) })
  }

  /** [[pqEncodeWith]] over per-subspace codebooks whose entries may
    * differ across subspaces (what Lloyd refinement produces — a cell
    * that empties in one subspace drops out of that subspace only). */
  private def pqEncodeCbs(q: DataFrame,
      cbs: Seq[Seq[(Long, Seq[Long])]]): DataFrame = {
    val d = cbs.head.head._2.length
    // One struct(minDist, code) per subspace — a codegen argmin over
    // that subspace's codebook.
    val best = cbs.zipWithIndex.map { case (cb, j) =>
      graft.plans.NearestCentroid.nearest(slice(col("qv"), j * d + 1, d), cb)
    }
    q.select(col("vid").as("vec_id"),
      array(best.map(_.getField("cid")): _*).as("codes"),
      best.map(_.getField("d")).reduce(_ + _).as("err"))
  }

  /** 10⁶-fixed-point integer view of an embedding column. */
  private def quantized(vecCol: String): Column =
    expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")

  /** Quantized seed vectors (id ≡ 0 mod seedStride), collected to the
    * driver — the bounded k·dims codebook the PQ/k-means family ships
    * back as a literal. Expects columns (vid, qv). */
  private def collectSeeds(q: DataFrame, seedStride: Int): Seq[(Long, Seq[Long])] = {
    val spark = q.sparkSession
    import spark.implicits._
    q.filter(col("vid") % seedStride === 0)
      .as[(Long, Seq[Long])].collect().toSeq.sortBy(_._1)
  }

  /** PQ top-k search with asymmetric distance computation (ADC) — the
    * billion-vector ANN serving pattern: candidates are represented ONLY
    * by their PQ codes; each query computes one small lookup table
    * (subspace × codebook entry → exact sub-distance to the query), and
    * a candidate's distance is the sum of `subspaces` table lookups.
    *
    * Scale shape: the LUT side is queries × subspaces × k rows —
    * broadcast; candidates' exploded codes hash-join it on
    * (subspace, code) and re-aggregate by (query, candidate). No
    * candidate vector is ever read after encoding, no shuffle wider
    * than candidates × subspaces, and the full-vector product never
    * materializes. Distances are exact fixed-point integers (ADC is
    * exact w.r.t. the quantized codes, approximate w.r.t. the original
    * vectors — the standard PQ trade). */
  /** Per-query ADC lookup table (query_id, cj, cid, dist): exact
    * fixed-point distance from each query's subspace slice to every
    * codebook entry — queries × subspaces × |codebook| rows, broadcast
    * material. */
  private def adcLut(queries: DataFrame, idCol: String, vecCol: String,
      seeds: Seq[(Long, Seq[Long])], subspaces: Int, d: Int): DataFrame =
    adcLutCbs(queries, idCol, vecCol, sliceCodebooks(seeds, subspaces), d)

  /** [[adcLut]] over per-subspace codebooks ([[sliceCodebooks]] form). */
  private def adcLutCbs(queries: DataFrame, idCol: String, vecCol: String,
      cbs: Seq[Seq[(Long, Seq[Long])]], d: Int): DataFrame = {
    val flat: Seq[(Long, Int, Seq[Long])] =
      for ((cb, j) <- cbs.zipWithIndex; (id, sv) <- cb) yield (id, j, sv)
    queries
      .select(col(idCol).as("query_id"), quantized(vecCol).as("qv"))
      .select(col("query_id"), col("qv"), explode(typedLit(flat)).as("cb"))
      .select(col("query_id"),
        col("cb._1").as("cid"), col("cb._2").as("cj"),
        aggregate(zip_with(
          slice(col("qv"), col("cb._2") * lit(d) + lit(1), lit(d)),
          col("cb._3"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("dist"))
  }

  def pqAdcTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, seedStride: Int, subspaces: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val candQ = candidates.select(col(idCol).as("vid"), quantized(vecCol).as("qv"))
    val seeds = collectSeeds(candQ, seedStride)
    val d = seeds.head._2.length / subspaces
    val codes = pqEncodeWith(candQ, seeds, subspaces)
      .select(col("vec_id").as("cand_id"), posexplode(col("codes")).as(Seq("j", "code")))
    val lut = adcLut(queries, idCol, vecCol, seeds, subspaces, d)
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("cand_id"))
    codes.join(broadcast(lut), col("j") === col("cj") && col("code") === col("cid"))
      .groupBy("query_id", "cand_id")
      .agg(sum("dist").as("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "adc")
  }

  /** Per-subspace Lloyd refinement of the PQ codebooks — k-means run in
    * each subspace independently over the sub-vectors, the codebook
    * training step Jégou et al. 2011 actually prescribe (the raw stride
    * seeds alone are the unrefined baseline sim_pq_adc ships).
    *
    * One Spark job per iteration: ASSIGNMENT is the same shipped-literal
    * codegen argmin pqEncode uses (per-row expression, no join, no
    * shuffle — all `subspaces` argmins emit in one pass over the data);
    * the UPDATE groups at most subspaces·k·d rows, collected once per
    * round, so the driver-side codebook stays bounded by the seed count
    * regardless of corpus size. A cell that loses all members in some
    * subspace drops out of that subspace's codebook only — exactly the
    * GROUP BY semantics the oracle replays. Integer fixed-point DIV
    * means every round is bit-reproducible across engines. */
  def pqRefineCodebooks(df: DataFrame, idCol: String, vecCol: String,
      seedStride: Int, subspaces: Int, iters: Int): Seq[Seq[(Long, Seq[Long])]] = {
    val q = df.select(col(idCol).as("vid"), quantized(vecCol).as("qv"))
    refinePq(q, collectSeeds(q, seedStride), subspaces, iters)
  }

  /** Shared per-subspace Lloyd loop over a pre-quantized (vid, qv)
    * frame; iters = 0 returns the sliced seeds unchanged. */
  private def refinePq(q: DataFrame, seeds: Seq[(Long, Seq[Long])],
      subspaces: Int, iters: Int): Seq[Seq[(Long, Seq[Long])]] = {
    val spark = q.sparkSession
    import spark.implicits._
    val d = seeds.head._2.length / subspaces
    var cbs = sliceCodebooks(seeds, subspaces)
    for (_ <- 1 to iters) {
      val rows = q
        .select(posexplode(array(cbs.zipWithIndex.map { case (cb, j) =>
          struct(
            graft.plans.NearestCentroid.nearest(slice(col("qv"), j * d + 1, d), cb)
              .getField("cid").as("cell"),
            slice(col("qv"), j * d + 1, d).as("sv"))
        }: _*)).as(Seq("j", "a")))
        .select(col("j"), col("a.cell").as("cell"),
          posexplode(col("a.sv")).as(Seq("pos", "x")))
        .groupBy("j", "cell", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .select(col("j"), col("cell"), col("pos"), expr("s DIV n").as("comp"))
        .groupBy("j", "cell")
        .agg(sort_array(collect_list(struct(col("pos"), col("comp")))).as("pc"))
        .select(col("j"), col("cell"), expr("transform(pc, p -> p.comp)").as("cv"))
        .as[(Int, Long, Seq[Long])].collect()
      cbs = (0 until subspaces).map(j =>
        rows.filter(_._1 == j).map(r => (r._2, r._3)).sortBy(_._1).toSeq)
    }
    cbs
  }

  /** [[pqAdcTopK]] with Lloyd-refined per-subspace codebooks: `iters`
    * k-means rounds per subspace before encoding, then the identical
    * codes-only ADC serving path. iters = 0 is bit-identical to
    * pqAdcTopK (pinned in tests); each round tightens the codes around
    * the candidate distribution, which is what lifts ADC recall without
    * touching the serving shape — same broadcast LUT, same worst
    * shuffle of candidates × subspaces code rows. */
  def pqAdcTopKRefined(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, seedStride: Int, subspaces: Int,
      iters: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val candQ = candidates.select(col(idCol).as("vid"), quantized(vecCol).as("qv"))
    val seeds = collectSeeds(candQ, seedStride)
    val d = seeds.head._2.length / subspaces
    val cbs = refinePq(candQ, seeds, subspaces, iters)
    val codes = pqEncodeCbs(candQ, cbs)
      .select(col("vec_id").as("cand_id"), posexplode(col("codes")).as(Seq("j", "code")))
    val lut = adcLutCbs(queries, idCol, vecCol, cbs, d)
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("cand_id"))
    codes.join(broadcast(lut), col("j") === col("cj") && col("code") === col("cid"))
      .groupBy("query_id", "cand_id")
      .agg(sum("dist").as("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "adc")
  }

  /** Exact fixed-point squared-L2 top-k — the ground truth for the PQ
    * family's recall instrument: candidates scored against queries on
    * the SAME 10⁻⁶-quantized integers the PQ codes approximate, so
    * recall@k against it isolates pure quantization loss (a cosine
    * truth would conflate metric mismatch with code coarseness — ADC
    * ranks by L2). Query side broadcast, candidates stream in one
    * pass — the bruteForceTopK shape with an integer distance. */
  def bruteForceL2TopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), quantized(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), quantized(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("dist", aggregate(zip_with(col("qv"), col("cv"),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v))
    val w = Window.partitionBy("query_id").orderBy(col("dist"), col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "dist")
  }

  /** IVF + ADC — the composed billion-vector serving shape (IVFADC,
    * Jégou et al. 2011): the coarse quantizer prunes each query's
    * candidate set to its `nprobe` nearest cells, and the survivors are
    * scored from PQ CODES ALONE via the per-query lookup table. Neither
    * approximation reads a full candidate vector at query time.
    *
    * Scale shape: coarse assignment is the broadcast-centroid pattern
    * (ivfTopK); codes join their cell in one narrow pass; the probe is
    * an equi-join on cell id and the scoring join is broadcast LUT on
    * (query, subspace, code). Worst shuffle = candidate codes ×
    * (nprobe/|cells|) × subspaces — candidate vectors never move. */
  def ivfAdcTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, seedStride: Int, subspaces: Int, nprobe: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = candidates
      .filter(col(idCol) % seedStride === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
    val candCell = nearestCells(cents, candidates.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv")), "cand_id", "cv", keep = 1).select("cand_id", "cell")
    val qCell = nearestCells(cents, queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")), "query_id", "qv", keep = nprobe)
      .select("query_id", "cell")
    val candQ = candidates.select(col(idCol).as("vid"), quantized(vecCol).as("qv"))
    val seeds = collectSeeds(candQ, seedStride)
    val d = seeds.head._2.length / subspaces
    val codes = pqEncodeWith(candQ, seeds, subspaces)
      .select(col("vec_id").as("cand_id"), posexplode(col("codes")).as(Seq("j", "code")))
      .join(candCell, "cand_id")
    val lut = adcLut(queries, idCol, vecCol, seeds, subspaces, d)
      .select(col("query_id"), col("cj").as("j"), col("cid").as("code"),
        col("dist"))
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("cand_id"))
    codes.join(qCell, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .join(broadcast(lut), Seq("query_id", "j", "code"))
      .groupBy("query_id", "cand_id")
      .agg(sum("dist").as("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "adc")
  }

  /** Matryoshka truncation search (Kusupati et al. 2022's MRL serving
    * trick): score on the FIRST `dims` dimensions only — cosine
    * renormalizes by construction, so slicing the array IS
    * truncate-and-renormalize. A 4× dimension cut is a 4× scan-width
    * and FLOP cut; recall against the full-dimension truth is the
    * instrument that prices it (see sim_matryoshka). */
  def matryoshkaTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int): DataFrame = {
    def trunc(df: DataFrame) =
      df.withColumn(vecCol, slice(col(vecCol), 1, dims))
    bruteForceTopK(trunc(queries), trunc(candidates), idCol, vecCol, k)
  }

  /** Johnson–Lindenstrauss RANDOM-PROJECTION top-k — the
    * data-INDEPENDENT member of the dimension-reduction family
    * ([[matryoshkaTopK]] is the learned-prefix member): both sides
    * project to `outDims` through the deterministic integer hyperplane
    * matrix ([[planeCoeff]] — the same family the LSH buckets use, JL
    * 1984's distance-preserving map), then exact cosine in the
    * projected space. Integer planes keep every projection one
    * exactly-rounded fold, so the oracle replays the ranking
    * bit-for-bit; recall vs the full-dim truth is the price tag the
    * sim_rp harness measures. */
  def rpTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, outDims: Int, dims: Int): DataFrame = {
    def proj(df: DataFrame) = df.withColumn(vecCol,
      array((0 until outDims).map(j =>
        dot(asDouble(col(vecCol)),
          array((0 until dims).map(i =>
            lit(planeCoeff(j, i).toDouble)): _*))): _*))
    bruteForceTopK(proj(queries), proj(candidates), idCol, vecCol, k)
  }

  // ---- binary (sign-bit) quantization -----------------------------------

  /** SQL fragment for sign-bit code word `w` over vector column `vec`:
    * bit i (i < bits) is set iff vec[32w+i+1] > 0. Words are 32-bit so
    * the packed value never touches the BIGINT sign bit — DuckDB
    * refuses `1::BIGINT << 63`, and staying in 32-bit words keeps the
    * Spark and oracle arithmetic trivially identical. Shared with the
    * oracle SQL builder (same literals, same order). */
  def signWordExpr(vec: String, w: Int, bits: Int): String =
    // try_element_at: out-of-bounds dims read NULL (never throw under
    // ANSI), and NULL > 0 is NULL → the bit stays 0 — exactly DuckDB's
    // list[i] OOB semantics, so short vectors pack identically in both
    // engines
    (0 until bits).map(i =>
      s"IF(try_element_at($vec, ${32 * w + i + 1}) > 0, ${1L << i}L, 0L)")
      .mkString("(", " + ", ")")

  /** (id, b0, b1, …) sign-bit binary codes: ceil(dims/32) BIGINT words
    * per vector. 64 float dims collapse to 2 longs — a 16× scan-width
    * cut, which is the whole point: the Hamming pass reads codes, never
    * vectors. */
  def binaryCodes(df: DataFrame, idCol: String, vecCol: String,
      outId: String, dims: Int, pre: String): DataFrame = {
    val words = (dims + 31) / 32
    df.select(col(idCol).as(outId) +:
      (0 until words).map(w => expr(
        signWordExpr(vecCol, w, math.min(32, dims - 32 * w)))
        .as(s"$pre$w")): _*)
  }

  /** Binary-quantized top-k: Hamming distance over sign-bit codes
    * (Charikar 2002's sign-random-projection view with the identity
    * basis — the "binary quantization" serving trick of modern vector
    * stores). The candidate scan reads ceil(dims/32) longs per row
    * instead of `dims` floats; queries are broadcast. Ties break by
    * ascending cand_id. */
  def hammingTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = (dims + 31) / 32
    val q = binaryCodes(queries, idCol, vecCol, "query_id", dims, "qb")
    val c = binaryCodes(candidates, idCol, vecCol, "cand_id", dims, "cb")
    val ham = (0 until words)
      .map(w => bit_count(col(s"qb$w").bitwiseXOR(col(s"cb$w"))).cast("long"))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming"), col("cand_id"))
    c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("hamming", ham)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "hamming")
  }

  /** Hamming shortlist → exact cosine rerank: the standard two-stage
    * binary-quantized serve. Stage 1 scans only the packed codes and
    * keeps `shortlist` candidates per query (deterministic boundary:
    * Hamming asc, cand_id asc); stage 2 re-reads the float vectors for
    * the ≤ Q×shortlist survivors ONLY (equi-join on cand_id) and ranks
    * by exact cosine. At 100 TB the float table is touched ∝ shortlist,
    * never ∝ corpus. */
  def hammingRerankTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val short = hammingTopK(queries, candidates, idCol, vecCol,
      k = shortlist, dims = dims).select("query_id", "cand_id")
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    short.join(cv, "cand_id")
      .join(broadcast(qv), "query_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cos")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.
    * Exact all-pairs here; at scale, run through lshTopK-style bucketing
    * first. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
