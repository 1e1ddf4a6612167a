package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the deterministic
  * sibling of a18's HyperLogLog (reference dashboard "unique X" counters,
  * database.py terms aggregations, at sketch scale).
  *
  * Keep the k smallest DISTINCT md5-derived hash56 values of the keys;
  * with h_k the k-th smallest in the [0, 2^56) domain, the distinct
  * estimate is (k-1)·2^56 / h_k (exact count when fewer than k values
  * survive). Standard error ~1/√k.
  *
  * Why it exists next to approx_count_distinct: HLL register contents are
  * implementation-specific, so DuckDB can't replay Spark's HLL and a18
  * is forever a rows-only check. KMV's state is just "k smallest hashes"
  * of a hash both engines compute bit-identically — a REAL bounded-memory
  * mergeable sketch whose output is oracle-EXACT (integer arithmetic
  * only).
  *
  * Scale shape: an Aggregator with map-side combine — every map partition
  * holds at most k longs per group, shuffle volume is groups×k regardless
  * of cardinality; no full distinct shuffle ever happens (the exact twin
  * a6 pays that). The buffer insert is O(1) for hashes above the current
  * k-th value — the overwhelming majority once the buffer warms. */
object Sketches {

  /** Largest k for which (k-1)·2^56 fits a signed long; beyond it the
    * estimate arithmetic routes through DECIMAL(38,0) (Spark) /
    * HUGEINT (the oracle) — identical integer values, so exactness is
    * unchanged, at a slightly costlier per-group division. */
  val MaxLongK = 128

  /** Hard k ceiling: sketches cost groups×k memory and the union/
    * intersect helpers materialize k-long arrays per row — 2^16 is far
    * above any sensible production k (error ∝ 1/√k is already 0.4%). */
  val MaxK = 1 << 16

  /** `scale div h` for scale = (k−1)·2^56, overflow-free at any
    * allowed k: long literals below [[MaxLongK]], an exact
    * DECIMAL(38,0) literal above (div on decimals is Spark's
    * IntegralDivide — exact integral result, LongType out). */
  private def scaleDivSql(k: Int, h: String): String =
    if (k <= MaxLongK) s"${(k - 1).toLong * Dedup.M56} div $h"
    else s"CAST('${BigInt(k - 1) * Dedup.M56}' AS DECIMAL(38,0)) div $h"

  final class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2 && k <= MaxK, s"KMV k must be in [2, $MaxK]; got $k")
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.size == k && h >= buf.last) buf // covers duplicates of buf.last
      else if (buf.contains(h)) buf
      else ((buf :+ h).sorted).take(k)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** `kmv(64)(hashCol)` inside groupBy().agg — array of the group's k
    * smallest distinct hash values (feed [[estimate]]). */
  def kmv(k: Int): Column => Column = {
    val fn = udaf(new KmvAgg(k), Encoders.scalaLong)
    h => fn(h)
  }

  /** Distinct-count estimate from a k-min array column (by name): exact
    * size when the group never filled the sketch, else (k-1)·2^56 div
    * h_k. All-integer — bit-identical on any engine. */
  def estimate(kmvName: String, k: Int): Column = {
    require(k >= 2 && k <= MaxK, s"KMV k must be in [2, $MaxK]; got $k")
    org.apache.spark.sql.functions.expr(
      s"""CASE WHEN size($kmvName) < $k THEN CAST(size($kmvName) AS BIGINT)
          ELSE ${scaleDivSql(k, s"element_at($kmvName, $k)")} END""")
  }

  /** The UNION sketch of two k-min arrays: k smallest of the combined
    * hash sets — the merge that makes KMV state composable across
    * partitions, days, or tables (sketch once per shard, answer
    * set-cardinality questions forever without re-scanning). */
  def kmvUnion(a: Column, b: Column, k: Int): Column = {
    require(k >= 2 && k <= MaxK, s"KMV k must be in [2, $MaxK], got $k")
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** Intersection-cardinality estimate from two k-min arrays and their
    * union sketch (Beyer et al. 2007, "On synopses for distinct-value
    * estimation under multiset operations"): of the union sketch's k
    * values, the fraction present in BOTH input sketches estimates the
    * Jaccard similarity, scaled by the union estimate. Exact (not an
    * estimate) whenever the union sketch never filled — then every
    * hash of both sets is present and the overlap count IS the
    * intersection. All-integer, so oracle-replayable bit-exactly. */
  def kmvIntersectEstimate(mergedName: String, aName: String,
      bName: String, k: Int): Column = {
    require(k >= 2 && k <= MaxK, s"KMV k must be in [2, $MaxK], got $k")
    val common = s"CAST(size(filter($mergedName, " +
      s"x -> array_contains($aName, x) AND array_contains($bName, x))) AS BIGINT)"
    org.apache.spark.sql.functions.expr(
      s"""CASE WHEN size($mergedName) < $k THEN $common
          ELSE ($common * (${scaleDivSql(k, s"element_at($mergedName, $k)")})) div $k END""")
  }

  // ---- count-min sketch ----------------------------------------------------
  //
  // KMV answers "how many DISTINCT keys"; count-min answers "how OFTEN is
  // this key" (reference dashboard per-term counters at a cardinality
  // where the exact groupBy stops fitting). d hash rows × w buckets of
  // plain counts: fixed d·w memory, mergeable by cell-wise addition,
  // point estimate = min over the d cells holding the key — always ≥ the
  // truth, within 2N/w at confidence 1 − 2^−d (Cormode & Muthukrishnan
  // 2005). Production CMS hash families are engine-private; deriving the
  // buckets from the md5-based hash56 makes the WHOLE sketch replayable
  // by an external engine — same cells, same estimates, oracle-EXACT.

  /** Bucket of `key` in hash row `j` (of `w` buckets): hash56 of the
    * row-tagged key string — deterministic on any engine. */
  def cmsBucket(key: Column, j: Int, w: Int): Column =
    Dedup.hash56(concat(lit(j.toString), lit(":"), key.cast("string"))) % w

  /** All d row-tagged buckets of `key` as one exploded-ready array. */
  private def cmsStructs(key: Column, d: Int, w: Int): Column =
    array((0 until d).map(j =>
      struct(lit(j).as("j"), cmsBucket(key, j, w).as("b"))): _*)

  /** Build the sketch: the d·w cell table (j, b, n).
    *
    * Scale shape: the explode amplifies rows ×d BEFORE a partial
    * aggregate, so each map task emits at most d·w cells and the shuffle
    * carries d·w rows per partition regardless of input size — the same
    * map-side-combine contract as the KMV Aggregator. No distinct, no
    * full key shuffle (the exact groupBy twin pays that). */
  def cmsCells(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, s"unreasonable CMS geometry d=$d w=$w")
    df.select(explode(cmsStructs(col(keyCol), d, w)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** Frequency point-estimates for `probes`: append `cms_n` = min over
    * the d cells addressed by each probe key. The cell table is d·w rows
    * — broadcast; probes stream past it unshuffled except the final
    * per-probe min (keyed on the probe ROW: a generated row id, so
    * duplicate probe rows each keep their own output row, and the probe
    * frame's own columns never collide with the sketch internals — all
    * temporaries are __cms_-namespaced and the cell columns are renamed
    * before the join).
    *
    * LEFT join: cmsCells only emits observed cells, so a probe key the
    * sketch never saw addresses absent cells — those count as 0 (the
    * CMS-correct answer), not as "drop the probe" (inner join) or "min
    * over whichever cells happen to collide" (partial overcount). */
  def cmsEstimate(probes: DataFrame, keyCol: String, cells: DataFrame,
      d: Int, w: Int): DataFrame = {
    val keyed = probes
      .withColumn("__cms_rid", monotonically_increasing_id())
      .withColumn("__cms_jb", explode(cmsStructs(col(keyCol), d, w)))
      .withColumn("__cms_j", col("__cms_jb.j"))
      .withColumn("__cms_b", col("__cms_jb.b"))
      .drop("__cms_jb")
    val c = cells.select(col("j").as("__cms_j"), col("b").as("__cms_b"),
      col("n").as("__cms_n"))
    keyed.join(broadcast(c), Seq("__cms_j", "__cms_b"), "left_outer")
      .groupBy((col("__cms_rid") +: probes.columns.map(col)).toIndexedSeq: _*)
      .agg(min(coalesce(col("__cms_n"), lit(0L))).as("cms_n"))
      .drop("__cms_rid")
  }

  /** Join-cardinality estimate from two CMS cell tables — the
    * pre-flight guard that answers "how many rows will this join emit?"
    * BEFORE paying its shuffle. The inner product of two sketches
    * (Cormode & Muthukrishnan 2005 §4.2): per hash row j,
    * dot_j = Σ_b nA(j,b)·nB(j,b); the estimate is min_j dot_j. Always ≥
    * the true Σ_k fA(k)·fB(k) (collisions only add), within
    * N_A·N_B/w at confidence 1 − 2⁻ᵈ.
    *
    * Scale shape: each side's cells are one map-side-combined shuffle of
    * ≤ d·w rows per partition (cmsCells); the product itself touches two
    * d·w tables — the 100 TB self-join that would emit 10¹⁸ rows costs
    * d·w integers to detect. Products go through DECIMAL(18,0)·(18,0)
    * → DECIMAL(37,0), so counts up to 10¹⁸ per cell cannot overflow the
    * dot product. All-integer, hence oracle-exact.
    *
    * A hash row where the two sides share NO cells has dot = 0 — the
    * true minimum — so the dots are LEFT-joined from the full hash-row
    * domain (cellsA's distinct j: every key addresses every row, so a
    * non-empty sketch populates all d) with missing dots as 0, and a
    * fully-disjoint pair estimates 0, not the inner-join's inflated
    * min-over-survivors (or a null). Largely-disjoint key sets are
    * exactly what a pre-flight join guard most needs to catch. */
  def cmsJoinSize(cellsA: DataFrame, cellsB: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val a = cellsA.select(col("j"), col("b"),
      col("n").cast(DecimalType(18, 0)).as("__cms_na"))
    val b = cellsB.select(col("j"), col("b"),
      col("n").cast(DecimalType(18, 0)).as("__cms_nb"))
    val dots = a.join(b, Seq("j", "b"))
      .groupBy("j")
      .agg(sum(col("__cms_na") * col("__cms_nb")).as("__cms_dot"))
    cellsA.select("j").distinct()
      .join(dots, Seq("j"), "left_outer")
      .agg(coalesce(min(coalesce(col("__cms_dot"),
          lit(0).cast(DecimalType(38, 0)))).cast("long"), lit(0L))
        .as("est_rows"))
  }

  // ---- HyperLogLog with EXPLICIT registers ---------------------------------
  //
  // Spark's approx_count_distinct is HLL too, but its register encoding
  // is engine-private — an oracle can never replay it (a18 is rows-only
  // for exactly that reason). This one keeps the registers as plain
  // (group, bucket, reg) rows derived from hash56, so DuckDB computes
  // the identical registers and the identical estimate: m = 64 buckets
  // from the hash's top 6 bits, rho = leading-zero rank of the
  // remaining 50 bits (via length(bin(w)) — same builtin both engines),
  // registers = max(rho) per bucket (Flajolet et al. 2007). The
  // estimate's harmonic sum is EXACT 2^-51 fixed point (Σ 2^(51-reg) in
  // BIGINT), so the only float ops are one multiply chain and one
  // division of exact operands — bit-identical cross-engine. Registers
  // max-merge, so distributed build == sequential build == union of
  // shards; ~1.04/√64 = 13% standard error.

  /** 2^50 / 2^51 — the bucket split and fixed-point scale. */
  val HllW: Long = 1L << 50
  val HllZScale: Long = 1L << 51

  /** Per-(group, bucket) HLL registers of `keyCol`'s hash56 values. */
  def hllRegisters(df: DataFrame, grpCol: String, keyCol: String): DataFrame =
    df.select(col(grpCol).as("grp"),
        Dedup.hash56(col(keyCol).cast("string")).as("h"))
      // null keys hash to null → a phantom (grp, null-bucket) register
      // row that inflates nb in the estimate's (64 − nb) missing-bucket
      // term; a null key is no observation, drop it at the source
      .filter(col("h").isNotNull)
      // INTEGER division: `/` is double division, and h reaches 2^56 —
      // beyond 2^53 the double rounds, so a near-boundary hash could
      // land in the wrong bucket (even a phantom bucket 64), silently
      // diverging from the oracle's exact `//`
      .select(col("grp"), expr(s"h DIV $HllW").as("bucket"),
        (col("h") % HllW).as("w"))
      .select(col("grp"), col("bucket"),
        when(col("w") === 0, lit(51L))
          .otherwise(lit(51L) - length(bin(col("w")))).as("rho"))
      .groupBy("grp", "bucket").agg(max("rho").as("reg"))

  /** HLL union: register-wise max — merge(sketch(A), sketch(B)) ==
    * sketch(A ∪ B) identically, which is what makes the estimate of a
    * maintained sketch equal the full-rebuild oracle. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("grp", "bucket").agg(max("reg").as("reg"))

  /** Small-range (linear counting) branch as a flat CASE over the 64
    * possible empty-bucket counts: E = m·ln(m/V), V = m − nb empty
    * buckets. V is an INTEGER in 1..64, so every possible ln lands in
    * one of 64 precomputed JVM doubles shipped as round-trip literals —
    * both engines parse the identical IEEE value and no transcendental
    * is ever evaluated in-engine (the PortableLn rationale, collapsed
    * to a finite domain). */
  def hllLinearCaseSql: String =
    (1 to 64).map { v =>
      val e = graft.functions.PortableLn.dbl(64.0 * math.log(64.0 / v))
      s"WHEN nb = ${64 - v} THEN $e"
    }.mkString("CASE ", " ", " END")

  /** Per-group estimate: α₆₄·m² / Z, Z = Σⱼ 2^(−Mⱼ) with absent buckets
    * at M = 0, summed exactly at 2^51 scale — then the standard
    * small-range correction (Flajolet et al. 2007 §4): when the raw
    * estimate falls under 2.5·m = 160 and empty buckets remain, switch
    * to linear counting m·ln(m/V), which is unbiased where the raw
    * formula reads low. The 13% standard error holds mid-range; the
    * correction extends it down to single-digit cardinalities. Both
    * branches are exact-integer inputs into literal-deterministic float
    * ops, so the whole estimator stays bit-identical cross-engine. */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy("grp").agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - reg AS INT))")).as("zp"),
        count(lit(1)).as("nb"))
      .withColumn("raw_e",
        lit(0.709) * lit(4096.0) * lit(HllZScale.toDouble) /
          (col("zp") + (lit(64L) - col("nb")) * lit(HllZScale))
            .cast("double"))
      .select(col("grp"),
        when(col("raw_e") <= lit(160.0) && col("nb") < lit(64L),
          expr(hllLinearCaseSql)).otherwise(col("raw_e")).as("hll_est"))

  // ---- Bloom filter --------------------------------------------------------
  //
  // KMV counts distinct keys, CMS counts key frequency; the Bloom filter
  // answers the JOIN-PRUNING question: "could this fact row possibly
  // match the dim side?" — the shuffle-reduction workhorse for joins
  // whose dim side is too large to broadcast as ROWS but whose key SET
  // compresses to a few KiB of bits (Bloom 1970; what Spark's AQE
  // runtime-filter and every warehouse's join-index do internally, here
  // as an explicit operator). md5-derived bit positions make the whole
  // filter oracle-replayable: an external engine sets the same bits and
  // reaches the same keep/drop verdicts, false positives included.

  /** Bit position of `key` in hash row `j` of an m-bit Bloom filter:
    * hash56 of the row-tagged key string (tag "b<j>:" — disjoint from
    * the CMS "<j>:" tag family). Deterministic on any engine. */
  def bloomPos(key: Column, j: Int, m: Int): Column =
    Dedup.hash56(concat(lit(s"b$j:"), key.cast("string"))) % m

  /** Build the filter over `df`'s `keyCol`: the m-bit bitmap as packed
    * little-endian long words.
    *
    * Scale shape: the build aggregates DISTINCT bit positions — the
    * collect is bounded by m (≤ 2^20 enforced), never by the key count;
    * a billion dim keys still collect at most m/8 bytes. The bitmap then
    * ships to probe tasks as a broadcast literal, exactly like a
    * codebook. */
  def bloomBuild(df: DataFrame, keyCol: String, m: Int, k: Int): Array[Long] = {
    require(m >= 64 && m % 64 == 0 && m <= (1 << 20),
      s"bloom bits m=$m must be a multiple of 64 in [64, 2^20]")
    require(k >= 1 && k <= 8, s"bloom hash count k=$k out of [1, 8]")
    val words = new Array[Long](m / 64)
    df.select(explode(array((0 until k).map(j =>
        bloomPos(col(keyCol), j, m)): _*)).as("p"))
      .distinct().collect() // bounded: ≤ m distinct bit positions
      .foreach { r =>
        val p = r.getLong(0).toInt
        words(p >> 6) |= (1L << (p & 63))
      }
    words
  }

  /** Membership test against a built bitmap: all k positions set.
    * Never false-negative; false positives at the standard Bloom rate
    * (~(1−e^{−kn/m})^k) — callers MUST treat a hit as "maybe" and let
    * the real join eliminate impostors. Pure integer bit arithmetic over
    * an array literal — codegen-friendly, runs map-side before any
    * shuffle. */
  def bloomMightContain(key: Column, words: Array[Long], k: Int): Column = {
    val m = words.length * 64
    val bm = typedLit(words.toSeq)
    (0 until k).map { j =>
      val p = bloomPos(key, j, m)
      call_function("shiftright",
        element_at(bm, (p / 64).cast("int") + 1), (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Oracle-EXACT approximate QUANTILES — the KMV idea applied to
    * percentiles, and the deterministic sibling of a18's t-digest
    * (whose centroid state is engine-private, so its oracle can only be
    * a tolerance contract). Per group, keep the values of the k rows
    * with the SMALLEST hash56(id) — a uniform sample because the hash
    * is uniform on ids and independent of the values — then take exact
    * interpolated percentiles OF THE SAMPLE. Every step is replayable:
    * both engines compute the same hashes, pick the same k rows (ties
    * by id), and interpolate identically (percentile vs quantile_cont,
    * the a17-proven bit-exact pair) — so the sketch's OUTPUT hashes
    * exactly, not merely within tolerance. Error vs the true quantile
    * is the standard sampling error (~1/√k quantile deviation).
    *
    * Scale/merge shape: the bottom-k-by-hash sample is a mergeable
    * summary (merge = union, keep k smallest — exactly KMV), computed
    * here with the TopKW partial aggregate (score = −u, value in the
    * payload slot): map-side combine caps shuffle at groups × k rows;
    * no per-group sort of the full data ever happens (the exact twin
    * a17 pays it). */
  def hashSampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int, qs: Seq[Double]): DataFrame = {
    val u = Dedup.hash56(col(idCol).cast("string")).cast("double") /
      lit(Dedup.M56.toDouble)
    val topk = TopK.topKW(k)
    val sampled = df
      .select(col(groupCol).as("__g"), (-u).as("score"),
        col(idCol).cast("long").as("id"), col(valueCol).cast("double").as("w"))
      .groupBy("__g")
      .agg(topk(col("score"), col("id"), col("w")).as("top"),
        count(lit(1)).as("n"))
      .select(col("__g"), col("n"), explode(col("top")).as("c"))
    val aggs = qs.map(q => expr(s"percentile(c.w, ${q}D)")
      .as(s"p${(q * 100).round}_est"))
    sampled.groupBy("__g", "n")
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__g", groupCol)
  }
}
