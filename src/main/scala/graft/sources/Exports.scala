package graft.sources

import org.apache.spark.sql.DataFrame
import graft.operators.Flatten

/** S3 — the two-sheet styled export (reference utils.py:60-163: an Excel
  * workbook with a Companies sheet and a flattened Enrichment sheet).
  * Two writers share the sheet-building logic: a per-sheet CSV directory
  * (bulk-friendly, distributed write) and a REAL .xlsx workbook
  * (graft.sources.Xlsx — OOXML via the JDK zip writer, bold headers +
  * sized columns, no POI needed). */
object Exports {

  /** Write `sheets` as name → flattened CSV under `dir`/<name>. Nested
    * structs/arrays are flattened exactly like the reference's
    * flatten_dict (Flatten.flatten). */
  def exportSheets(dir: String, sheets: (String, DataFrame)*): Unit =
    sheets.foreach { case (name, df) =>
      Sources.writeCsv(Flatten.flatten(df).coalesce(1), s"$dir/$name")
    }

  /** The reference's Companies-sheet column order (utils.py:71-74) —
    * pinned so the workbook export is column-for-column comparable. */
  val CompaniesSheetColumns: Seq[String] = Seq(
    "company_name", "company_number", "company_status", "company_type",
    "jurisdiction", "date_of_creation", "address", "sic_codes", "created_at")

  /** The two-sheet companies workbook (utils.py:60-163): a Companies
    * sheet in the reference's exact column order, and an Enrichment sheet
    * of flattened payloads keyed by (company, provider). The reference
    * prefixes each flattened key with the provider VALUE (utils.py:121) —
    * a per-row column set, which pandas unions; the relational equivalent
    * is the `provider` column alongside the flattened fields, carrying
    * the same information with a stable schema. `enrichment_data` must be
    * a struct column (parse JSON strings with from_json upstream). */
  def companiesWorkbook(dir: String, companies: DataFrame,
      enrichment: Option[DataFrame] = None): Unit =
    exportSheets(dir, workbookSheets(companies, enrichment): _*)

  /** Same two sheets as ONE styled .xlsx file (utils.py writes
    * openpyxl; this writes the OOXML directly). */
  def companiesWorkbookXlsx(path: String, companies: DataFrame,
      enrichment: Option[DataFrame] = None): Unit =
    Xlsx.writeWorkbook(path, workbookSheets(companies, enrichment))

  private def workbookSheets(companies: DataFrame,
      enrichment: Option[DataFrame]): Seq[(String, DataFrame)] = {
    import org.apache.spark.sql.functions._
    val sheet1 = companies.select(CompaniesSheetColumns.map(col): _*)
    val sheets = enrichment.map { e =>
      val flat = Flatten.flatten(
        e.join(companies.select("company_name", "company_number"),
            Seq("company_number"))
          .filter(col("enrichment_data").isNotNull)
          .select(col("company_name"), col("company_number"), col("provider"),
            col("enrichment_data")))
      "Enrichment Data" -> flat
    }.toSeq
    ("Companies" -> sheet1) +: sheets
  }
}
