package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the SCALE REHEARSAL: writes an
  * `N×` replica of a source testdata directory with join structure,
  * selectivities, and modular key semantics preserved, so the bench
  * suite can be timed at 10× (sf1) without the driver's generator.
  *
  * Replication scheme (replica r of R):
  *  - every surrogate key shifts by `r · stride(table)`, stride = the
  *    smallest multiple of 25 200 above the table's max key. 25 200 is
  *    divisible by 1..10 and 100, so `key % m` selectivities (user_id
  *    % 2 segments, event_id % 10 splits, id-stride ANN centroid
  *    seeding) are IDENTICAL in every replica;
  *  - foreign keys shift by the referenced table's stride — replica
  *    r's lineitems join replica r's orders/parts/suppliers, so join
  *    fan-outs are preserved exactly;
  *  - dimension tables small enough to broadcast (region, nation) copy
  *    unchanged — at any real scale factor they stay fixed, and
  *    growing them would distort the broadcast-join shape;
  *  - `documents.text` in replicas r > 0 is token-SHUFFLED (each token
  *    ranked by a per-replica hash): unigram statistics — language id,
  *    quality ratios, token counts, BPE pair pools — stay realistic,
  *    but shingle/minhash near-dup structure does NOT replicate, so
  *    dedup candidate counts grow linearly with corpus size instead of
  *    quadratically in the replica count (10 verbatim copies of every
  *    doc would manufacture dup groups no real 10× corpus has);
  *  - `embeddings.embedding` gets per-(replica, id, dim) hash jitter
  *    at 1e-4 scale: cluster geometry (labels) survives, but replicas
  *    are not the exact same point, so ANN probe/top-k work is honest;
  *  - event/order timestamps copy unchanged: a 10× corpus over the
  *    same wall-clock span has 10× daily density, which is exactly how
  *    per-day rollups and sessionization should be stressed.
  *
  * Everything is hash-derived — no rand(), no now() — so two runs (or
  * two machines) produce byte-identical tables.
  *
  * Usage: runMain graft.DataGen <srcDir> <outDir> [replicas=10]
  */
object DataGen {

  /** lcm(1..10, 100) — key strides stay ≡ 0 (mod m) for every small m
    * the query suite uses in predicates. */
  val StrideQuantum = 25200L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("graft-datagen", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, replicas)
    spark.stop()
  }

  private def src(spark: SparkSession, dir: String, t: String): DataFrame =
    Tables.load(spark, dir, t)

  private def stride(df: DataFrame, key: String): Long = {
    val mx = df.agg(max(col(key)).cast("long")).collect().head.getLong(0)
    ((mx / StrideQuantum) + 1L) * StrideQuantum
  }

  /** Union of `n` replicas of `df` with the per-replica transform
    * applied; `withColumn("__r", …)` carries the replica index. */
  private def replicate(df: DataFrame, n: Int)(
      f: DataFrame => DataFrame): DataFrame =
    (0 until n).map(r => f(df.withColumn("__r", lit(r.toLong))))
      .reduce(_.unionByName(_)).drop("__r")

  def generate(spark: SparkSession, srcDir: String, outDir: String,
      replicas: Int): Unit = {
    val cust = src(spark, srcDir, "customer")
    val supp = src(spark, srcDir, "supplier")
    val part = src(spark, srcDir, "part")
    val ord = src(spark, srcDir, "orders")
    val li = src(spark, srcDir, "lineitem")
    val ev = src(spark, srcDir, "events")
    val docs = src(spark, srcDir, "documents")
    val emb = src(spark, srcDir, "embeddings")

    val sCust = stride(cust, "c_custkey")
    val sSupp = stride(supp, "s_suppkey")
    val sPart = stride(part, "p_partkey")
    val sOrd = stride(ord, "o_orderkey")
    val sEv = stride(ev, "event_id")
    val sUser = stride(ev, "user_id")
    val sDoc = stride(docs, "doc_id")
    val sVec = stride(emb, "vec_id")

    def shifted(c: String, s: Long) = (col(c) + col("__r") * s).as(c)

    def write(df: DataFrame, name: String, files: Int): Unit = {
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      println(s"[datagen] wrote $name x$replicas")
    }

    // fixed dimensions: copy through
    write(src(spark, srcDir, "region"), "region", 1)
    write(src(spark, srcDir, "nation"), "nation", 1)

    write(replicate(cust, replicas)(d => d.select(
      shifted("c_custkey", sCust), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"), col("__r"))), "customer", 8)

    write(replicate(supp, replicas)(d => d.select(
      shifted("s_suppkey", sSupp), col("s_name"), col("s_nationkey"),
      col("s_acctbal"), col("__r"))), "supplier", 4)

    write(replicate(part, replicas)(d => d.select(
      shifted("p_partkey", sPart), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice"), col("__r"))),
      "part", 8)

    write(replicate(ord, replicas)(d => d.select(
      shifted("o_orderkey", sOrd), shifted("o_custkey", sCust),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"), col("__r"))), "orders", 16)

    write(replicate(li, replicas)(d => d.select(
      shifted("l_orderkey", sOrd), shifted("l_partkey", sPart),
      shifted("l_suppkey", sSupp), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
      col("__r"))), "lineitem", 32)

    write(replicate(ev, replicas)(d => d.select(
      shifted("event_id", sEv), col("ts"), shifted("user_id", sUser),
      col("event_type"), col("value"), col("props"), col("__r"))),
      "events", 16)

    // replica 0 keeps the original text; r > 0 rank every token by a
    // per-(replica, doc, position) hash — a deterministic shuffle
    val shuffledText = when(col("__r") === 0, col("text")).otherwise(
      array_join(expr(
        """transform(
             array_sort(
               transform(split(text, ' '), (w, i) ->
                 struct(hash(concat(__r, ':', doc_id, ':', i, ':', w)) AS h,
                        w AS w))),
             s -> s.w)"""), " "))
    write(replicate(docs, replicas)(d => d.select(
      shifted("doc_id", sDoc), shuffledText.as("text"), col("lang"),
      col("source"), col("n_chars"), col("__r"))), "documents", 8)

    // ±5e-2 hash jitter per dimension: separates replica points without
    // moving them across cluster boundaries
    val jittered = expr(
      """transform(embedding, (x, i) ->
           CAST(x + (pmod(hash(concat(__r, ':', vec_id, ':', i)), 1000)
                     - 500) / 10000.0 AS FLOAT))""")
    write(replicate(emb, replicas)(d => d.select(
      shifted("vec_id", sVec), jittered.as("embedding"), col("label"),
      col("__r"))), "embeddings", 4)
  }
}
