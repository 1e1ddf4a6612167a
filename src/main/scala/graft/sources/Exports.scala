package graft.sources

import org.apache.spark.sql.DataFrame
import graft.operators.Flatten

/** S3 — the two-sheet styled export (reference utils.py:60-163: an Excel
  * workbook with a Companies sheet and a flattened Enrichment sheet).
  * No POI in this environment, so the workbook becomes a directory of
  * per-sheet CSVs; the semantic content — column ordering, the recursive
  * flatten of nested enrichment payloads (utils.py:110-135) — is
  * identical, and a POI writer can be swapped in behind this signature. */
object Exports {

  /** Write `sheets` as name → flattened CSV under `dir`/<name>. Nested
    * structs/arrays are flattened exactly like the reference's
    * flatten_dict (Flatten.flatten). */
  def exportSheets(dir: String, sheets: (String, DataFrame)*): Unit =
    sheets.foreach { case (name, df) =>
      Sources.writeCsv(Flatten.flatten(df).coalesce(1), s"$dir/$name")
    }
}
