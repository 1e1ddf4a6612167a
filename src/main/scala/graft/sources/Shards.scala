package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded training-data export with a verifiable manifest — the
  * delivery format a trainer's data loader actually consumes: N
  * similar-sized parquet shards plus one manifest listing every shard's
  * row count and byte size, so the consumer can verify completeness
  * BEFORE streaming 100 TB (a missing shard is a wrong run, found in
  * milliseconds from the manifest, not hours into the epoch).
  *
  * Reference: the export flows (utils.py workbook/CSV) deliver one
  * file; at pipeline scale delivery is always sharded + manifested
  * (WebDataset/TFRecord convention, re-expressed for parquet).
  *
  * Scale shape: the write is `repartition(shards)` on a a hash of the
  * id — even shards without a global sort; the manifest's row counts
  * come from one `input_file_name` group over the written files and its
  * byte sizes from the FileSystem listing — a per-shard metadata pass,
  * driver state = one row per shard. */
object Shards {

  /** Write `df` as `shards` hash-sharded parquet files under `dir`;
    * return the manifest as a DataFrame (shard file name, rows, bytes),
    * one row per written data file. */
  def writeWithManifest(df: DataFrame, dir: String, idCol: String,
      shards: Int): DataFrame = {
    val spark = df.sparkSession
    df.repartition(shards, col(idCol))
      .write.mode("overwrite").parquet(dir)
    manifest(spark, dir)
  }

  /** Manifest of an existing parquet directory: per data file, its row
    * count (from the data — trust nothing) and byte size (from the
    * FileSystem listing). */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = spark.read.parquet(dir)
      .select(input_file_name().as("path"))
      .groupBy("path").agg(count(lit(1)).as("rows"))
      .select(element_at(split(col("path"), "/"), -1).as("file"), col("rows"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val sizes = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
      .toSeq.toDF("file", "bytes")
    rows.join(sizes, Seq("file"), "full_outer")
      .select(col("file"),
        coalesce(col("rows"), lit(0L)).as("rows"),
        coalesce(col("bytes"), lit(-1L)).as("bytes"))
      .orderBy("file")
  }

  /** Completeness check a consumer runs against a manifest: total rows
    * match, no shard is empty, no file appears the FS listing missed
    * (bytes = -1) or the data missed (rows = 0 on a non-empty export). */
  def verifyManifest(man: DataFrame, expectedRows: Long): Boolean = {
    val agg = man.agg(sum("rows").as("r"), min("rows").as("mn"),
      min("bytes").as("mb")).collect().head
    agg.getLong(0) == expectedRows && agg.getLong(1) > 0L && agg.getLong(2) > 0L
  }
}
