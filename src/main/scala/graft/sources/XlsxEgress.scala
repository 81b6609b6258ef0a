package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}

/** Dependency-free staged-rows → XLSX egress (reference byte surface:
  * smartbots-etl/src/infrastructure/excel_handler.py:61-233 — the
  * append-only consolidated write). Writes a single-sheet workbook with
  * inline strings and native numbers using java.util.zip only; the
  * append path re-reads the existing sheet via [[XlsxIngress]] and
  * rewrites it with the new rows after the last populated row, which is
  * the reference's template-row semantics without cell styling (fonts /
  * column widths / images are presentation concerns the engine's
  * consolidated store does not round-trip).
  *
  * Scale posture: egress formatting is a driver-side artifact render of
  * an already-small result (a report / a consolidated view slice). The
  * 100 TB data path stays in parquet; this exists so a reference user's
  * Excel-facing workflow keeps working end-to-end.
  */
object XlsxEgress {

  /** Write rows (first seq = header row) as a fresh workbook. */
  def write(path: String, rows: Seq[Seq[Any]]): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      put(zos, "[Content_Types].xml", contentTypes)
      put(zos, "_rels/.rels", rootRels)
      put(zos, "xl/workbook.xml", workbook)
      put(zos, "xl/_rels/workbook.xml.rels", workbookRels)
      put(zos, "xl/worksheets/sheet1.xml", sheetXml(rows))
    } finally zos.close()
  }

  /** Append rows after the last populated row (excel_handler.py:199-214:
    * `max_row` probe then sequential appends). Creates the file with
    * `header` when absent.
    */
  def append(path: String, header: Seq[Any], rows: Seq[Seq[Any]]): Unit = {
    val existing: Seq[Seq[Any]] =
      if (new java.io.File(path).exists()) XlsxIngress.readRows(path)
      else Seq(header)
    write(path, existing ++ rows)
  }

  /** Render a small egress DataFrame (e.g. [[graft.pipeline.Egress]]'s
    * consolidated layout) to a workbook — collects, so callers bound the
    * row count first (egress views are file-sized by construction).
    */
  def writeDataFrame(path: String, df: DataFrame): Unit = {
    val header: Seq[Any] = df.columns.toSeq
    val data = df.collect().toSeq.map((r: Row) =>
      (0 until r.length).map(i => r.get(i)))
    write(path, header +: data)
  }

  // ------------------------------------------------------------------- xml

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private def colLetters(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cellXml(ref: String, v: Any): Option[String] = v match {
    case null => None
    case n: Byte => Some(s"""<c r="$ref"><v>$n</v></c>""")
    case n: Short => Some(s"""<c r="$ref"><v>$n</v></c>""")
    case n: Int => Some(s"""<c r="$ref"><v>$n</v></c>""")
    case n: Long => Some(s"""<c r="$ref"><v>$n</v></c>""")
    case n: Float => Some(s"""<c r="$ref"><v>$n</v></c>""")
    case n: Double => Some(s"""<c r="$ref"><v>$n</v></c>""")
    case n: java.math.BigDecimal => Some(s"""<c r="$ref"><v>${n.toPlainString}</v></c>""")
    case n: BigDecimal => Some(s"""<c r="$ref"><v>${n.bigDecimal.toPlainString}</v></c>""")
    case b: Boolean => Some(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
    case s: String if s.isEmpty => None
    case other => Some(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>""")
  }

  private def sheetXml(rows: Seq[Seq[Any]]): String = {
    val body = rows.zipWithIndex.flatMap { case (cells, r0) =>
      val r = r0 + 1
      val cs = cells.zipWithIndex.flatMap { case (v, c0) =>
        cellXml(s"${colLetters(c0 + 1)}$r", v)
      }
      if (cs.isEmpty) None
      else Some(s"""<row r="$r">${cs.mkString}</row>""")
    }
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>${body.mkString}</sheetData></worksheet>""".stripMargin
  }

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""".stripMargin

  private val rootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin

  private val workbook =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Hoja1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin

  private def put(zos: ZipOutputStream, name: String, content: String): Unit = {
    zos.putNextEntry(new ZipEntry(name))
    zos.write(content.getBytes(StandardCharsets.UTF_8))
    zos.closeEntry()
  }
}
