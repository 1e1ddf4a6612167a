package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is Zipfian (SURVEY.md
  * §4 physical notes). AQE's skew-join handles sort-merge cases at
  * runtime; explicit salting is the deterministic fallback when one key
  * dominates (the reference's "one officer on every board" shape).
  *
  * left ⋈ right on k becomes
  * left(k, salt=rand mod S) ⋈ right(k, salt=explode(0..S-1)) on (k, salt):
  * the hot key's rows spread over S reducers; the right side replicates
  * S× (keep it the smaller relation). */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // The right side is replicated `salts`×, so any join type that emits
    // unmatched RIGHT rows (right/full outer) would duplicate them, and
    // anti/semi flip which side is probed — only inner/left shapes are
    // salt-compatible.
    require(Set("inner", "left", "left_outer", "leftouter")(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    // pmod of a deterministic per-row hash, not rand(): reproducible plans
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
