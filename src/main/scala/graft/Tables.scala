package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet-backed table catalog over a scale-factor directory.
  *
  * The reference keeps 16 SQLAlchemy tables behind a Postgres catalog
  * (reference: DatabaseConverter/models.py:14-459); here the catalog is a
  * directory of parquet files (TESTDATA.md) — one `spark.read.parquet` per
  * table, letting Catalyst push filters/projections into the scan. At
  * cluster scale the same layout maps onto partitioned parquet/warehouse
  * tables without touching operator code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Load one table from `dir` (e.g. /root/testdata/sf0.01).
    *
    * `events.ts` has been generated two ways across driver runs:
    *  - parquet TIMESTAMP(NANOS), which Spark refuses to read natively —
    *    read as epoch-nanos long and truncate to micros (integer DIV; a
    *    double division would lose precision above 2^53), matching
    *    DuckDB's own nanos→micros truncation;
    *  - parquet timestamp[us] without isAdjustedToUTC, which Spark's
    *    NTZ inference reads as TIMESTAMP_NTZ — cast to TIMESTAMP so
    *    instant functions (unix_micros, window, watermarks) keep
    *    working. The session zone is pinned UTC (GraftSession), so the
    *    cast reinterprets the same micros value and matches DuckDB,
    *    which treats the column as a naive TIMESTAMP throughout.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast(TimestampType))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
