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

  /** Per-column presentation (excel_handler.py:16-36 COLUMN_FORMATS):
    * number format code + horizontal alignment, keyed by header text.
    */
  final case class ColumnFormat(numberFormat: Option[String] = None,
      alignment: Option[String] = None)

  /** The reference's consolidated-sheet formats: integral invoice
    * numbers, CLP currency totals, dd/mm/yyyy dates, centered headers.
    */
  val ConsolidatedFormats: Map[String, ColumnFormat] = Map(
    "N° Factura" -> ColumnFormat(Some("0"), Some("center")),
    "Empresa Transporte" -> ColumnFormat(None, Some("center")),
    "Nave" -> ColumnFormat(None, Some("center")),
    "Órdenes de Embarque" -> ColumnFormat(None, Some("left")),
    "Guías de Despacho" -> ColumnFormat(Some("0"), Some("right")),
    "Total Servicio ($)" ->
      ColumnFormat(Some("""_ "$"* #,##0_ ;_ "$"* \-#,##0_ ;_ "$"* "-"_ ;_ @_ """)),
    "Fecha Emisión" -> ColumnFormat(Some("dd/mm/yyyy"), Some("center")),
    "Fecha Recepción Digital" -> ColumnFormat(Some("dd/mm/yyyy"), Some("center")),
    "Aprobado por:" -> ColumnFormat(None, Some("center")),
    "Estado Operaciones" -> ColumnFormat(None, Some("center")),
    "Fecha Aprobación Operaciones" -> ColumnFormat(Some("dd/mm/yyyy"), Some("center")),
    "Observaciones" -> ColumnFormat(None, Some("left")))

  /** Write rows (first seq = header row) as a fresh workbook. When
    * `formats` is non-empty, per-column styles resolve by the header text
    * of each column and apply to every data cell in that column.
    */
  def write(path: String, rows: Seq[Seq[Any]],
      formats: Map[String, ColumnFormat] = Map.empty): Unit = {
    // style index per column: 0 = default; custom styles start at 1
    val header = rows.headOption.getOrElse(Seq.empty)
    val colFormats: Seq[ColumnFormat] = header.map {
      case h: String => formats.getOrElse(h, ColumnFormat())
      case _ => ColumnFormat()
    }
    val distinctStyles = colFormats.filter(f =>
      f.numberFormat.isDefined || f.alignment.isDefined).distinct
    val styleIdx: Map[ColumnFormat, Int] =
      distinctStyles.zipWithIndex.map { case (f, i) => f -> (i + 1) }.toMap
    val colStyle: Seq[Int] = colFormats.map(f => styleIdx.getOrElse(f, 0))

    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      put(zos, "[Content_Types].xml", contentTypes)
      put(zos, "_rels/.rels", rootRels)
      put(zos, "xl/workbook.xml", workbook)
      put(zos, "xl/_rels/workbook.xml.rels", workbookRels)
      put(zos, "xl/styles.xml", stylesXml(distinctStyles))
      put(zos, "xl/worksheets/sheet1.xml", sheetXml(rows, colStyle))
    } finally zos.close()
  }

  /** Append rows after the last populated row (excel_handler.py:199-214:
    * `max_row` probe then sequential appends). Creates the file with
    * `header` when absent; an EXISTING workbook is edited in place —
    * every other zip part (embedded images, drawings, styles, column
    * widths, extra sheets) passes through verbatim, and appended cells
    * copy the per-column style of the last existing data row, matching
    * the reference's template-preserving append (excel_handler.py:87-132
    * + image re-insertion :185-233).
    */
  def append(path: String, header: Seq[Any], rows: Seq[Seq[Any]],
      formats: Map[String, ColumnFormat] = Map.empty): Unit = {
    val f = new java.io.File(path)
    if (f.exists() && f.length() > 0) appendInPlace(path, rows)
    else write(path, header +: rows, formats)
  }

  private def appendInPlace(path: String, rows: Seq[Seq[Any]]): Unit = {
    import java.util.zip.ZipFile
    val zip = new ZipFile(path)
    val (entries, sheetName) =
      try {
        val es = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
        val it = zip.entries()
        while (it.hasMoreElements) {
          val e = it.nextElement()
          if (!e.isDirectory) es(e.getName) = zip.getInputStream(e).readAllBytes()
        }
        (es, XlsxIngress.sheetEntryName(zip, 0))
      } finally zip.close()
    require(entries.contains(sheetName), s"no worksheet part $sheetName in $path")

    val sheetXmlStr = new String(entries(sheetName), StandardCharsets.UTF_8)
    val (maxRow, lastStyles) = lastRowInfo(sheetXmlStr)
    require(maxRow + rows.size <= MaxEgressRows,
      s"append a $path superaría el límite Excel de $MaxEgressRows filas " +
        s"(actual $maxRow + ${rows.size} nuevas)")
    val newRows = rows.zipWithIndex.map { case (cells, i) =>
      val r = maxRow + 1 + i
      val cs = cells.zipWithIndex.flatMap { case (v, c0) =>
        val letters = colLetters(c0 + 1)
        cellXml(s"$letters$r", v, lastStyles.getOrElse(letters, 0))
      }
      s"""<row r="$r">${cs.mkString}</row>"""
    }.mkString
    val updated =
      if (sheetXmlStr.contains("</sheetData>"))
        sheetXmlStr.replace("</sheetData>", newRows + "</sheetData>")
      else
        sheetXmlStr.replaceFirst("<sheetData\\s*/>",
          java.util.regex.Matcher.quoteReplacement(s"<sheetData>$newRows</sheetData>"))
    // a sheet whose sheetData tag matches neither pattern (e.g. a
    // namespace-prefixed <x:sheetData>) must fail LOUD — silently writing
    // back the unchanged sheet would drop the appended rows
    require(updated != sheetXmlStr || rows.isEmpty,
      s"no se pudo insertar en $sheetName de $path: " +
        "sheetData no reconocido (¿prefijo de namespace?)")
    entries(sheetName) = updated.getBytes(StandardCharsets.UTF_8)

    // temp-and-swap, never truncate-in-place: FileOutputStream(path)
    // zeroes the workbook before the first byte lands, so a crash or
    // disk-full mid-write would destroy every existing row (plus the
    // images/styles this codec promises to preserve). Write a sibling
    // temp fully, then atomically move it over the original.
    val target = java.nio.file.Paths.get(path)
    val tmp = target.resolveSibling(target.getFileName.toString + ".__tmp")
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(tmp.toFile)))
    try entries.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name)); zos.write(bytes); zos.closeEntry()
    } finally zos.close()
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** (last populated row number, per-column-letter style index of that
    * row) — the append position probe and the reference's copy-style-
    * from-last-row behavior.
    */
  private def lastRowInfo(sheetXml: String): (Int, Map[String, Int]) = {
    val rowRe = """<row r="(\d+)"""".r
    val maxRow = rowRe.findAllMatchIn(sheetXml).map(_.group(1).toInt)
      .foldLeft(0)(math.max)
    // OOXML allows writers to omit the optional r= (the ingress side
    // handles those); appending numbered rows AFTER unnumbered ones
    // would collide at r=1..n and corrupt the workbook — fail loud.
    // Match actual <row> elements only (word boundary): a bare
    // contains("<row") would also hit <rowBreaks> and spuriously fail
    // a zero-data-row sheet that declares page breaks.
    require(maxRow > 0 || """<row[\s/>]""".r.findFirstIn(sheetXml).isEmpty,
      "hoja con filas sin atributo r=: no se puede anexar con seguridad")
    if (maxRow == 0) return (0, Map.empty)
    val lastRowBody = {
      val start = sheetXml.indexOf(s"""<row r="$maxRow"""")
      val end = sheetXml.indexOf("</row>", start)
      if (start < 0) "" else sheetXml.substring(start, if (end < 0) sheetXml.length else end)
    }
    // attribute order inside <c> is writer-dependent (`s=` may precede
    // `r=`): match whole cell tags, then pull each attribute independently
    val tagRe = """<c\b[^>]*""".r
    val refRe = """\br="([A-Z]+)\d+"""".r
    val styleRe = """\bs="(\d+)"""".r
    val styles = tagRe.findAllIn(lastRowBody).flatMap { tag =>
      for {
        r <- refRe.findFirstMatchIn(tag)
        s <- styleRe.findFirstMatchIn(tag)
      } yield r.group(1) -> s.group(1).toInt
    }.toMap
    (maxRow, styles)
  }

  /** Excel's own worksheet row limit — the natural bound for any
    * driver-side workbook render (a result that exceeds it cannot be a
    * valid .xlsx anyway).
    */
  val MaxEgressRows: Int = 1048576

  /** Collect at most `maxRows` rows for a workbook render, failing FAST
    * (with a clear message, via a `limit(maxRows + 1)` probe that never
    * pulls more than maxRows+1 rows to the driver) instead of OOMing on
    * an unbounded egress view.
    */
  private[graft] def boundedCollect(df: DataFrame, maxRows: Int,
      what: String): Seq[Row] = {
    val data = df.limit(maxRows + 1).collect().toSeq
    require(data.size <= maxRows,
      s"$what excede el límite de $maxRows filas para egreso Excel — " +
        "filtre o pagine la vista antes de renderizar")
    data
  }

  /** Render a small egress DataFrame (e.g. [[graft.pipeline.Egress]]'s
    * consolidated layout) to a workbook. The driver-side collect is
    * bounded by `maxRows` (default: Excel's 1,048,576-row sheet limit) —
    * an oversized view fails fast instead of OOMing the driver.
    * Columns matching [[ConsolidatedFormats]] headers get the reference's
    * number formats (currency totals, dd/mm/yyyy dates, integral invoice
    * numbers).
    */
  def writeDataFrame(path: String, df: DataFrame,
      formats: Map[String, ColumnFormat] = ConsolidatedFormats,
      maxRows: Int = MaxEgressRows): Unit = {
    val header: Seq[Any] = df.columns.toSeq
    val data = boundedCollect(df, maxRows, s"egreso a $path")
      .map((r: Row) => (0 until r.length).map(i => r.get(i)))
    write(path, header +: data, formats)
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

  private def cellXml(ref: String, v: Any, style: Int): Option[String] = {
    val s = if (style > 0) s""" s="$style"""" else ""
    v match {
      case null => None
      case n: Byte => Some(s"""<c r="$ref"$s><v>$n</v></c>""")
      case n: Short => Some(s"""<c r="$ref"$s><v>$n</v></c>""")
      case n: Int => Some(s"""<c r="$ref"$s><v>$n</v></c>""")
      case n: Long => Some(s"""<c r="$ref"$s><v>$n</v></c>""")
      case n: Float => Some(s"""<c r="$ref"$s><v>$n</v></c>""")
      case n: Double => Some(s"""<c r="$ref"$s><v>$n</v></c>""")
      case n: java.math.BigDecimal => Some(s"""<c r="$ref"$s><v>${n.toPlainString}</v></c>""")
      case n: BigDecimal => Some(s"""<c r="$ref"$s><v>${n.bigDecimal.toPlainString}</v></c>""")
      case b: Boolean => Some(s"""<c r="$ref"$s t="b"><v>${if (b) 1 else 0}</v></c>""")
      case str: String if str.isEmpty => None
      case other => Some(s"""<c r="$ref"$s t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>""")
    }
  }

  private def sheetXml(rows: Seq[Seq[Any]], colStyle: Seq[Int]): String = {
    val body = rows.zipWithIndex.flatMap { case (cells, r0) =>
      val r = r0 + 1
      val cs = cells.zipWithIndex.flatMap { case (v, c0) =>
        // styles apply to data rows only — the header row keeps style 0,
        // like the reference which styles appended cells, not the template
        val style = if (r0 == 0) 0 else colStyle.lift(c0).getOrElse(0)
        cellXml(s"${colLetters(c0 + 1)}$r", v, style)
      }
      if (cs.isEmpty) None
      else Some(s"""<row r="$r">${cs.mkString}</row>""")
    }
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>${body.mkString}</sheetData></worksheet>""".stripMargin
  }

  /** styles.xml: one cellXf per distinct column format (index i+1 — index
    * 0 stays the default style); custom number-format ids start at 164
    * per the OOXML spec.
    */
  private def stylesXml(styles: Seq[ColumnFormat]): String = {
    val numFmts = styles.zipWithIndex.collect {
      case (f, i) if f.numberFormat.isDefined =>
        (f, 164 + i)
    }.toMap
    val numFmtXml = numFmts.map { case (f, id) =>
      s"""<numFmt numFmtId="$id" formatCode="${esc(f.numberFormat.get)}"/>"""
    }.mkString
    val xfs = styles.map { f =>
      val fmtId = numFmts.get(f).getOrElse(0)
      val applyFmt = if (fmtId > 0) """ applyNumberFormat="1"""" else ""
      f.alignment match {
        case Some(h) =>
          s"""<xf numFmtId="$fmtId" xfId="0"$applyFmt applyAlignment="1"><alignment horizontal="$h"/></xf>"""
        case None => s"""<xf numFmtId="$fmtId" xfId="0"$applyFmt/>"""
      }
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><numFmts count="${numFmts.size}">$numFmtXml</numFmts><fonts count="1"><font/></fonts><fills count="2"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill></fills><borders count="1"><border/></borders><cellStyleXfs count="1"><xf/></cellStyleXfs><cellXfs count="${styles.size + 1}"><xf numFmtId="0" xfId="0"/>$xfs</cellXfs></styleSheet>""".stripMargin
  }

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/></Types>""".stripMargin

  private val rootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin

  private val workbook =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Hoja1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/></Relationships>""".stripMargin

  private def put(zos: ZipOutputStream, name: String, content: String): Unit = {
    zos.putNextEntry(new ZipEntry(name))
    zos.write(content.getBytes(StandardCharsets.UTF_8))
    zos.closeEntry()
  }
}
