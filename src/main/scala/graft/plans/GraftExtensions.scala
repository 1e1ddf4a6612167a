package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a Filter conjunct `lev_similarity(a, b) >= t` implies
  * the far cheaper length band |len(a) − len(b)| ≤ (1−t)·max(len) —
  * because edit distance is bounded below by the length difference. The
  * rule conjoins that band ahead of the similarity term, so codegen's
  * short-circuit AND skips the O(len²) DP for pairs that can't reach the
  * threshold, and Catalyst may push the band further down on its own.
  * (SURVEY.md §4: the reference's "search first, score second"
  * candidate-pruning shape as a Catalyst rewrite.) */
object SimilarityPrefilter extends Rule[LogicalPlan] {

  private def band(a: Expression, b: Expression, t: Double): Expression = {
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    LessThanOrEqual(Abs(Subtract(la, lb)),
      Multiply(Literal(1.0 - t), Greatest(Seq(la, lb))))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Idempotent: the bands implied by the similarity conjuncts, minus any
    * already present (semanticEquals) — so the fixed-point optimizer batch
    * converges after one pass instead of re-prepending every iteration. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val implied = existing.collect {
        case GreaterThanOrEqual(LevenshteinSimilarity(a, b), Literal(t: Double, DoubleType)) =>
          band(a, b, t)
        case GreaterThan(LevenshteinSimilarity(a, b), Literal(t: Double, DoubleType)) =>
          band(a, b, t)
      }
      val missing = implied.foldLeft(Seq.empty[Expression]) { (acc, bd) =>
        if ((existing ++ acc).exists(_.semanticEquals(bd))) acc else acc :+ bd
      }
      if (missing.isEmpty) f
      else Filter(And(missing.reduce(And), cond), child)
  }
}

/** Session extensions: SQL-visible functions for the custom expressions
  * plus the similarity pre-filter rule.
  *
  * ```
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  * ```
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_hash56"),
      new ExpressionInfo(classOf[StableHash56].getName, "graft_hash56"),
      (args: Seq[Expression]) => StableHash56(args.head)))
    ext.injectFunction((
      FunctionIdentifier("lev_similarity"),
      new ExpressionInfo(classOf[LevenshteinSimilarity].getName, "lev_similarity"),
      (args: Seq[Expression]) => LevenshteinSimilarity(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimhashBits].getName, "simhash_bits"),
      (args: Seq[Expression]) => SimhashBits(args.head)))
    // F-series name functions, SQL-callable as EXPRESSION EXPANSIONS:
    // each call site inlines the same built-in expression tree the
    // Column library builds (regexp_replace/split/filter…), so SQL users
    // get identical semantics AND whole-stage codegen — these are macro
    // expansions at analysis time, not UDF calls at run time.
    def expand1(name: String, f: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.TextFunctions", name),
        (args: Seq[Expression]) => {
          import org.apache.spark.sql.classic.GraftShim
          GraftShim.toExpressionTree(f(GraftShim.toColumn(args.head)))
        }))
    expand1("normalize_name", graft.functions.TextFunctions.normalizeName)
    expand1("strip_company_suffixes",
      graft.functions.TextFunctions.removeCompanySuffixes)
    expand1("is_likely_individual",
      graft.functions.TextFunctions.isLikelyIndividual)
    expand1("name_tokens", c => graft.functions.TextFunctions.nameTokens(c))
    ext.injectFunction((
      FunctionIdentifier("token_jaccard"),
      new ExpressionInfo("graft.functions.TextFunctions", "token_jaccard"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.classic.GraftShim
        GraftShim.toExpressionTree(graft.functions.TextFunctions.tokenJaccard(
          GraftShim.toColumn(args.head), GraftShim.toColumn(args(1))))
      }))
    ext.injectOptimizerRule(_ => SimilarityPrefilter)
  }
}
