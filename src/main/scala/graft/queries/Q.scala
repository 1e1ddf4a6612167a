package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator query: a Spark implementation plus (usually) an
  * equivalent DuckDB oracle SQL. Names key into `SparkEntry.queries`.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact-decimal view of a 2-decimal double column.
    *
    * The synthetic data carries money-like doubles with exactly two decimal
    * digits; casting to DECIMAL(18,2) is unambiguous (no representable
    * midpoints), and summing decimals is order-independent — so a final cast
    * back to double is bit-identical between Spark and DuckDB. Raw
    * double-sum would differ in the last ulps depending on partition order.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec(name: String): Column = dec(col(name))

  /** Decimal-exact sum surfaced as a double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
  def dsum(name: String): Column = dsum(col(name))

  /** Decimal-exact average surfaced as a double (sum/count in double —
    * identical operands give identical IEEE result on both engines). */
  def davg(c: Column): Column =
    sum(dec(c)).cast("double") / count(c).cast("double")
}
