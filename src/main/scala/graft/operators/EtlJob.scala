package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.util.LongAccumulator

/** Validation pass with accumulator-backed stats (SURVEY.md §2.4 A14;
  * reference applicant_pipeline.py:45-124 counter dicts,
  * weekly_scheduler.py:338-394 run stats). Valid rows stream through;
  * counts accumulate executor-side without a second scan. */
object EtlJob {

  final case class Stats(valid: LongAccumulator, invalid: LongAccumulator)

  /** Filter to rows where `isValid` holds, counting both outcomes in one
    * pass. NOTE: accumulator values are defined only after an action on
    * the returned frame, and re-executions re-add (standard Spark
    * accumulator semantics) — read stats once, right after the action. */
  def validate(spark: SparkSession, df: DataFrame, isValid: Column): (DataFrame, Stats) = {
    val stats = Stats(
      spark.sparkContext.longAccumulator("valid_rows"),
      spark.sparkContext.longAccumulator("invalid_rows"))
    val flagged = df.withColumn("__valid", isValid)
    val idx = flagged.schema.fieldIndex("__valid")
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(flagged.schema))
    val counted = flagged.mapPartitions { it =>
      it.filter { r =>
        val ok = !r.isNullAt(idx) && r.getBoolean(idx)
        if (ok) stats.valid.add(1L) else stats.invalid.add(1L)
        ok
      }
    }
    (counted.drop("__valid"), stats)
  }
}
