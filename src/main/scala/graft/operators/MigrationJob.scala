package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{Catalog, TableStore}

/** S15 — the full-copy migration job (reference migrate_data.py:15-360:
  * 340 lines of per-table cursor loops and INSERT batches). In Spark the
  * whole job is read → conform → overwrite per table, in the reference's
  * foreign-key order, with per-table counts as the verification step
  * (migrate_data.py:44-49).
  *
  * `readSource` abstracts the origin (a parquet dir, a JDBC reader, the
  * DSv2 source…): it returns None for tables absent at the source, which
  * are skipped exactly like the reference's missing-table guards. */
object MigrationJob {

  /** migrate_data.py:37-42 — FK-safe copy order. */
  val CopyOrder: Seq[String] = Seq("companies", "enrichment_data",
    "processing_log", "linkedhelper_connections", "planning_data")

  final case class TableCopied(table: String, rows: Long)

  def run(dest: TableStore, readSource: String => Option[DataFrame],
      tables: Seq[String] = CopyOrder): Seq[TableCopied] =
    tables.flatMap { t =>
      readSource(t).map { src =>
        val conformed = Catalog.conform(src, Catalog.byName(t))
        dest.overwrite(t, conformed)
        TableCopied(t, dest.read(t).count())
      }
    }

  /** Parquet-dir source adapter: `srcRoot/<table>` if present. */
  def parquetSource(spark: SparkSession, srcRoot: String)(table: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$srcRoot/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }
}
