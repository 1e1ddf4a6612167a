package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the ingest gate a 100 TB
  * pipeline runs before data is allowed downstream (the reference's
  * scattered per-field validation — its company-number checks, date
  * parses, confidence clamps — expressed as one audited ruleset; see
  * reference utils.py validation helpers and database.py's per-sync
  * sanity counts).
  *
  * Rules come in two cost classes, and the implementation keeps them
  * separate on purpose:
  *
  *  - ROW-LOCAL rules (not-null, range, accepted values, regex): all of
  *    them fold into ONE aggregate pass over the table — a single scan,
  *    map-side combined, no shuffle beyond the 1-row final combine, no
  *    matter how many rules.
  *  - RELATIONAL rules (key uniqueness, referential integrity): each is
  *    irreducibly a shuffle (groupBy on the key) or a join (left-anti
  *    against the dimension) — but the key-uniqueness shuffle carries
  *    only the key columns, and the anti-join broadcasts when the
  *    dimension side permits.
  *
  * Output is the long audit format the funnel jobs use: one row per
  * rule, `(rule, violations)` — zero-violation rules still emit their
  * row, so a silently-dropped rule is a row-count mismatch, not a
  * missing alert.
  */
object Expectations {

  /** A row-local predicate that must hold; `violated` is the negation,
    * evaluated per row inside the shared aggregate. */
  final case class RowRule(name: String, violated: Column)

  def notNull(name: String, c: Column): RowRule =
    RowRule(name, c.isNull)

  def inRange(name: String, c: Column, lo: Double, hi: Double): RowRule =
    RowRule(name, c.isNull || c < lo || c > hi)

  def accepted(name: String, c: Column, vals: Seq[String]): RowRule =
    RowRule(name, c.isNull || !c.isin(vals: _*))

  def matches(name: String, c: Column, regex: String): RowRule =
    RowRule(name, c.isNull || !c.rlike(regex))

  /** All row-local rules in one scan: each rule is a conditional sum in
    * the same aggregate, and the long format comes from EXPLODING a
    * struct array built over that single 1-row frame — the plan holds
    * exactly one Aggregate over one scan of `df`, no matter how many
    * rules. (The first cut selected one row per rule from the same
    * aggregate and unionAll'd them, which put N copies of the aggregate
    * subtree in the plan and left "one scan" to ReuseExchange's
    * discretion — PlanSpec now pins the single-scan shape instead.) */
  def checkRowRules(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggs = rules.map(r =>
      sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map(r =>
        struct(lit(r.name).as("rule"),
          coalesce(col(r.name), lit(0L)).as("violations"))): _*)).as("x"))
      .select(col("x.rule").as("rule"), col("x.violations").as("violations"))
  }

  /** Key-uniqueness: violations = number of EXTRA rows beyond one per
    * key (so a clean table scores 0 and each duplicate row counts
    * once). Shuffles only the key columns. */
  def checkUnique(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** Referential integrity: fact rows whose non-null `factKey` has no
    * match in the dimension. Null keys are notNull's business, not an
    * RI violation. */
  def checkRef(fact: DataFrame, name: String, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame =
    fact.select(col(factKey)).filter(col(factKey).isNotNull)
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** The full audit: row-local rules in one pass, plus any relational
    * rules, one long row per rule. */
  def audit(rowPass: Option[(DataFrame, Seq[RowRule])],
      relational: Seq[DataFrame]): DataFrame = {
    val parts = rowPass.map { case (df, rs) => checkRowRules(df, rs) }.toSeq ++
      relational
    require(parts.nonEmpty, "empty audit")
    parts.reduce(_ unionAll _)
  }

  /** PLAN-quality expectations in the same long audit format — the
    * [[graft.plans.PlanLint]] scale-killer pre-flight surfaced as
    * `(rule, violations)` rows so a pipeline gates on plan shape with
    * the same machinery it gates on data quality (union this into
    * [[audit]]'s output, alert on violations > 0). One row per lint
    * rule that fired, with the finding count; a clean plan emits the
    * single row `plan:<name>:clean` with 0 violations — like the data
    * rules, "no alert" is a visible row, never a missing one. Cost:
    * driver-side plan inspection only, the frame is never executed. */
  def planAudit(name: String, df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val found = graft.plans.PlanLint.lint(df)
      .groupBy(_.rule).toSeq
      .map { case (r, xs) => (s"plan:$name:$r", xs.size.toLong) }
      .sortBy(_._1)
    val rows = if (found.isEmpty) Seq((s"plan:$name:clean", 0L)) else found
    rows.toDF("rule", "violations")
  }
}
