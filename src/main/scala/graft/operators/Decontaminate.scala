package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-pipeline step that finds
  * corpus documents overlapping an evaluation/benchmark set, so they can
  * be dropped before training (the n-gram overlap procedure described in
  * the GPT-3 and Llama papers' contamination appendices).
  *
  * Shape, chosen for 100 TB: the benchmark side is ALWAYS small (eval
  * suites are thousands of docs, not billions), so membership is a
  * broadcast semi-join of the corpus' exploded shingle hashes against
  * the benchmark's distinct shingle-hash set — never a corpus×benchmark
  * product, and the corpus is read once. Overlap is counted on hashed
  * char n-grams (graft.plans.ShingleHash: one fused pass, no
  * intermediate shingle strings), matching the exact-parity hash the
  * dedup operators use, so a DuckDB oracle can replay it bit-exactly. */
object Decontaminate {

  /** Per-corpus-doc overlap stats against `benchmark`: documents sharing
    * at least one hashed char `n`-gram, with `contaminated` set when the
    * count of distinct shared shingles reaches `minOverlap`. Documents
    * with zero overlap are absent (the clean-keep side of the funnel is
    * `corpus.join(result.filter('contaminated), ids, "left_anti")`). */
  def overlap(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 12, minOverlap: Int = 20): DataFrame = {
    val sh = graft.plans.ShingleHash.shingleHash(col(textCol), n)
    val benchSet = benchmark.select(explode(sh).as("h")).distinct()
    // hs is distinct within a doc and benchSet is distinct overall, so
    // the join emits each (doc, shared shingle) exactly once: a plain
    // count is the distinct-overlap count — no countDistinct shuffle
    corpus
      .select(col(idCol), sh.as("hs"))
      .select(col(idCol), size(col("hs")).cast("long").as("n_shingles"),
        explode(col("hs")).as("h"))
      .join(broadcast(benchSet), Seq("h"))
      .groupBy(idCol, "n_shingles")
      .agg(count(lit(1)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }
}
