package graft.sources

import java.io.OutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** A real two-sheet styled .xlsx workbook writer with ZERO library
  * dependencies — an xlsx file is a zip of OOXML parts, and the JDK
  * ships the zip writer, so "no POI in the environment" does not have
  * to mean "no Excel export" (reference utils.py:60-163 styles headers
  * and sizes columns; both are reproduced here).
  *
  * Driver-side by design: workbook export is an end-of-query operation
  * on a bounded result (the reference exports search results, not
  * tables); `maxRows` guards against accidentally exporting a fact
  * table — raise it deliberately or export CSV (Exports.exportSheets)
  * for bulk.
  *
  * Layout choices, for readers of the XML:
  *  - strings are inline (`t="inlineStr"`), skipping the shared-strings
  *    table — simpler, streamable, and fine at export sizes;
  *  - style 1 = bold font, applied to every header cell;
  *  - column widths = max rendered cell length + 2, capped at 50 chars
  *    (the openpyxl auto-size idiom the reference uses);
  *  - numbers (and booleans) are typed cells, everything else renders
  *    as its Spark string form. */
object Xlsx {

  /** Write sheets (name → DataFrame) as one workbook at `path` (any
    * Hadoop-visible filesystem). Sheet names are truncated to Excel's
    * 31-char limit. */
  def writeWorkbook(path: String, sheets: Seq[(String, DataFrame)],
      maxRows: Int = 100000): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val named = sheets.zipWithIndex.map { case ((n, df), i) =>
      (sanitizeSheetName(n, i), df)
    }
    val conf = named.head._2.sparkSession.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try writeZip(out, named, maxRows) finally out.close()
  }

  private def writeZip(os: OutputStream,
      sheets: Seq[(String, DataFrame)], maxRows: Int): Unit = {
    val zip = new ZipOutputStream(os)
    def part(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes("UTF-8"))
      zip.closeEntry()
    }
    val n = sheets.size
    part("[Content_Types].xml", contentTypes(n))
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml", workbookXml(sheets.map(_._1)))
    part("xl/_rels/workbook.xml.rels", workbookRels(n))
    part("xl/styles.xml", stylesXml)
    sheets.zipWithIndex.foreach { case ((_, df), i) =>
      part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df, maxRows))
    }
    zip.finish()
  }

  private def sanitizeSheetName(n: String, i: Int): String = {
    val cleaned = n.replaceAll("[\\\\/?*\\[\\]:]", " ").trim
    val base = if (cleaned.isEmpty) s"Sheet${i + 1}" else cleaned
    base.take(31)
  }

  private def contentTypes(n: Int): String = {
    val sheets = (1 to n).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
      .mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
       |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
       |<Default Extension="xml" ContentType="application/xml"/>
       |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
       |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
       |$sheets
       |</Types>""".stripMargin
  }

  private def workbookXml(names: Seq[String]): String = {
    val sheets = names.zipWithIndex.map { case (nm, i) =>
      s"""<sheet name="${esc(nm)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
       |<sheets>$sheets</sheets>
       |</workbook>""".stripMargin
  }

  private def workbookRels(n: Int): String = {
    val rels = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
      .mkString
    val styles =
      s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>"""
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |$rels$styles
       |</Relationships>""".stripMargin
  }

  /** Font 0 = default, font 1 = bold; cellXf 1 references the bold
    * font — header cells carry s="1". */
  private val stylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font><font><b/><sz val="11"/><name val="Calibri"/></font></fonts>
      |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
      |<borders count="1"><border/></borders>
      |<cellStyleXfs count="1"><xf/></cellStyleXfs>
      |<cellXfs count="2"><xf xfId="0"/><xf fontId="1" xfId="0" applyFont="1"/></cellXfs>
      |</styleSheet>""".stripMargin

  private def sheetXml(df: DataFrame, maxRows: Int): String = {
    val schema = df.schema
    val rows = df.limit(maxRows).collect()
    val headers = schema.fieldNames.toSeq
    val rendered: Array[Seq[String]] =
      rows.map(r => schema.fields.indices.map(i => render(r, i)))
    val widths = headers.indices.map { c =>
      val w = (headers(c).length +: rendered.map(_(c).length).toSeq).max + 2
      math.min(w, 50)
    }
    val cols = widths.zipWithIndex.map { case (w, i) =>
      s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>"""
    }.mkString
    val headerRow = headers.zipWithIndex.map { case (h, c) =>
      s"""<c r="${ref(c, 1)}" s="1" t="inlineStr"><is><t>${esc(h)}</t></is></c>"""
    }.mkString
    val body = rows.zipWithIndex.map { case (row, rIdx) =>
      val cells = schema.fields.indices.map { c =>
        cell(row, c, schema.fields(c).dataType, rIdx + 2)
      }.mkString
      s"""<row r="${rIdx + 2}">$cells</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |<cols>$cols</cols>
       |<sheetData><row r="1">$headerRow</row>$body</sheetData>
       |</worksheet>""".stripMargin
  }

  private def render(row: Row, i: Int): String =
    if (row.isNullAt(i)) "" else String.valueOf(row.get(i))

  private def cell(row: Row, c: Int, dt: DataType, r: Int): String = {
    val rr = ref(c, r)
    if (row.isNullAt(c)) ""
    else dt match {
      case _: NumericType =>
        s"""<c r="$rr"><v>${row.get(c)}</v></c>"""
      case BooleanType =>
        s"""<c r="$rr" t="b"><v>${if (row.getBoolean(c)) 1 else 0}</v></c>"""
      case _ =>
        s"""<c r="$rr" t="inlineStr"><is><t>${esc(render(row, c))}</t></is></c>"""
    }
  }

  /** 0-based column + 1-based row → A1-style reference. */
  private[graft] def ref(col: Int, row: Int): String = {
    var c = col
    val sb = new StringBuilder
    while (c >= 0) {
      sb.insert(0, ('A' + c % 26).toChar)
      c = c / 26 - 1
    }
    sb.append(row).toString
  }

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
    case c => c.toString
  }
}
