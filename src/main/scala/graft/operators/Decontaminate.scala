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
    // ShingleExplode emits distinct hashed shingles row-wise in ONE md5
    // pass (the array+explode form pays the pass three times once
    // Catalyst inlines it into the inferred size()>0 filter); benchSet
    // is distinct overall, so after the left join each (doc, shingle)
    // row carries at most one match — plain sums give distinct counts
    def shingles(df: DataFrame) = df.select(col(idCol),
      graft.plans.ShingleHash.shingleExplode(col(textCol), n).as("h"))
    val benchSet = shingles(benchmark).select("h").distinct()
    shingles(corpus)
      .join(broadcast(benchSet.withColumn("m", lit(1))), Seq("h"), "left_outer")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("m"), lit(0))).cast("long").as("n_overlap"))
      .filter(col("n_overlap") >= 1)
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
      .select(col(idCol), col("n_shingles"), col("n_overlap"),
        col("contaminated"))
  }
}
