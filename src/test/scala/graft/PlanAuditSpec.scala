package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide physical-plan audit: every registered query — current and
  * future — is checked for the plan shapes that do not survive scale.
  * PlanSpec pins specific good plans; this spec guarantees no query
  * anywhere in the registry regresses into the known scale-killers. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * each is a deliberate bounded product with the small side broadcast
    * (a baseline, or a top-k against a handful of broadcast queries). */
  private val bnljAllowed = Set(
    "sim_topk_bruteforce", // O(Q×N) by definition; query side broadcast
    "sim_ivf_topk",        // probe rows × broadcast centroid cells
    "sim_ivf_pq",          // same broadcast-centroid coarse stage as ivf_topk
    "sim_recall",          // composes bruteforce truth + ivf (both above)
    "dd_ngram_jaccard",    // ground-truth baseline, pinned to id<1000
    "dd_embed_cosine",     // ground-truth baseline, pinned to id<1000
    "txt_tfidf"            // 1-row corpus-size frame broadcast into the scorer
  )

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian plans (death at scale): ${offenders.mkString(", ")}")
  }

  /** Queries allowed an unpartitioned WindowExec: each windows over an
    * input already bounded to a constant number of rows (pinned by a
    * PlanSpec TakeOrderedAndProject/limit assertion), so the single
    * task sees k rows, not the table. */
  private val globalWindowAllowed = Set(
    "a12_trend", "o3_pagination",
    "txt_vocab", "txt_encode" // rank the LIMIT-1000 vocab slice only
  )

  test("no registered query windows the full relation on one task") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(p: SparkPlan): Seq[WindowExec] = {
      val here = p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      val nested = p.collect { case a: AdaptiveSparkPlanExec => a }
        .flatMap(a => globalWindows(a.initialPlan))
      here ++ nested
    }
    val offenders = SparkEntry.registry.flatMap { q =>
      if (globalWindows(q.run(spark, sf).queryExecution.executedPlan).nonEmpty
          && !globalWindowAllowed(q.name)) Some(q.name)
      else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows over unbounded input: ${offenders.mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin only in the deliberate bounded products") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(q.name))
        Some(q.name)
      else None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins: ${offenders.mkString(", ")}")
  }
}
