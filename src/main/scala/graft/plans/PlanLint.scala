package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, SortExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Pre-flight plan lint — the scale-killer checks the test suite runs
  * fleet-wide (PlanAuditSpec), packaged as a LIBRARY call so a user can
  * vet any DataFrame BEFORE launching it against 100 TB: a plan that
  * passes on 60k rows and then cartesians on a cluster is a bill, not a
  * test failure. Flags exactly the shapes that do not survive scale:
  *
  *  - cartesian-product: O(|L|·|R|) row blowup — always a rewrite
  *    (equi-join key, broadcast hint, or pre-aggregation);
  *  - nested-loop-join: the broadcast side is re-scanned per row; fine
  *    for deliberate bounded products (a 1-row stats frame, a k-row
  *    centroid table), fatal when it sneaks in via a non-equi condition;
  *  - global-window: an unpartitioned window function moves EVERY row
  *    to one task — the single most common "worked in dev" failure.
  *
  * A finding is advice, not an error: the registry itself whitelists
  * deliberate bounded products (see PlanAuditSpec) — the point is that
  * the decision is EXPLICIT. Walks adaptive sub-plans and subqueries. */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String)

  def lint(df: DataFrame): Seq[Finding] =
    walk(df.queryExecution.executedPlan).distinct

  /** The findings as a DataFrame (for dashboards / CI gates). */
  def lintDf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    lint(df).toDF("rule", "node", "detail")
  }

  private def walk(p: SparkPlan): Seq[Finding] = {
    val here: Seq[Finding] = p match {
      case _: CartesianProductExec => Seq(Finding("cartesian-product",
        p.nodeName, "every-pair product: O(|left|*|right|) output rows"))
      case j: BroadcastNestedLoopJoinExec => Seq(Finding("nested-loop-join",
        p.nodeName,
        s"${j.joinType} without an equi-key: broadcast side rescanned per row"))
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(Finding(
        "global-window", p.nodeName,
        "unpartitioned window moves ALL rows to one task"))
      case s: SortExec if s.global && s.child.isInstanceOf[WindowExec] =>
        Nil // the window case above already covers its feeding sort
      case _ => Nil
    }
    val nested = p match {
      case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
      case _ => Nil
    }
    here ++ nested ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
  }
}
