package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** File-backed sources/sinks (SURVEY.md §2.1). The reference's live REST
  * sources are out of scope in a zero-egress environment (SURVEY §7.1);
  * their schemas live here so a DataSourceV2 with pushdown can slot in
  * later without touching operator code.
  */
object Sources {

  /** S1 — the lender CSV import schema (FIXTURES.md §1;
    * reference app.py:2066-2120). */
  val LenderCsvSchema: StructType = StructType(Seq(
    StructField("CompanyNumber", StringType),
    StructField("CompanyName", StringType),
    StructField("RegisteredOffice", StringType),
    StructField("LatestChargeID", StringType),
    StructField("LatestChargeStatus", StringType),
    StructField("LatestChargeRegisteredDate", StringType), // dd/MM/yyyy
    StructField("PersonsEntitled", StringType),
    StructField("Officers", StringType)))

  /** S10 — LinkedHelper webhook event schema (FIXTURES.md §7). */
  val WebhookEventSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("timestamp", StringType),
    StructField("contact", StructType(Seq(
      StructField("full_name", StringType),
      StructField("first_name", StringType),
      StructField("last_name", StringType),
      StructField("company", StringType),
      StructField("position", StringType),
      StructField("linkedin_url", StringType),
      StructField("last_message", StringType))))))

  /** S1: schema-explicit CSV read — never infer on a 100 TB scan. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S2: CSV export (reference app.py:1584-1595). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** S11: JSON-lines read with explicit schema (webhook batches). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
