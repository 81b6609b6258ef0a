package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** S9/A4 — HTML notification composition (reference gmail_notifier.py
  * rendering + dtos.py template vars): status-selected template, `{word}`
  * substitution with CSS braces preserved, 20-row error table with the
  * "y N más" tail, 5-error `error_detalle`.
  */
class ReportSpec extends AnyFunSuite {

  private def report(status: String, errors: Seq[String] = Nil,
      errorCount: Long = 0) = Report.ExecutionReport(
    runUuid = "run-123", status = status,
    files = Seq(Report.FileOutcome("f1.csv", "COMPLETED", 10, 10 - errorCount,
      errorCount, 7, 0, 0, BigDecimal(100), errors)),
    sourceTotal = BigDecimal(100), outputTotal = BigDecimal(100),
    validationErrors = errors)

  test("status maps to the reference's template + subject label") {
    assert(Report.templateFor("SUCCESS") == "ETL_Consolidacion_Exito.html")
    assert(Report.templateFor("PARTIAL") == "ETL_Consolidacion_Parcial.html")
    assert(Report.templateFor("NO_FILES") == "ETL_Consolidacion_Vacio.html")
    assert(Report.templateFor("ERROR") == "ETL_Consolidacion_Error.html")
    assert(Report.templateFor("weird") == "ETL_Consolidacion_Error.html")
    assert(Report.statusLabel("SUCCESS") == "EXITOSO")
    assert(Report.statusLabel("NO_FILES") == "SIN ARCHIVOS")
  }

  test("success render: placeholders substituted, CSS braces preserved") {
    val html = Report.renderHtml(report("SUCCESS"),
      consolidatedLink = "file:///c.parquet", timestamp = "2026-08-12 10:00:00 UTC")
    assert(html.contains("run-123"))
    assert(html.contains("2026-08-12 10:00:00 UTC"))
    assert(html.contains("file:///c.parquet"))
    assert(html.contains("exitosamente"))
    // the CSS block's braces must survive the {word} substitution
    assert(html.contains("font-family: Helvetica, Arial, sans-serif; }"))
    assert(!html.contains("{run_id}") && !html.contains("{timestamp}"))
  }

  test("partial render: error table rows capped at 20 with colspan tail") {
    val errs = (1 to 23).map(i => s"f1.csv fila $i: Formato de fecha no reconocido")
    val html = Report.renderHtml(report("PARTIAL", errs, errorCount = 23))
    assert(html.contains("<tr><td>f1.csv</td><td>1</td><td>Formato de fecha no reconocido</td></tr>"))
    assert(html.contains("<td>20</td>"))
    assert(!html.contains("<td>21</td>"))
    assert(html.contains("<tr><td colspan='3'>... y 3 más</td></tr>"))
  }

  test("bounded sample + true count: tail reflects the distributed count") {
    // pipeline materializes ≤ 21 sample rows but counted 1000 errors
    val sample = (1 to 20).map(i => s"f1.csv fila $i: bad") :+ "... y 980 más"
    val html = Report.errorRowsHtml(
      sample.filterNot(_.startsWith("... y ")), total = 1000)
    assert(html.contains("<tr><td colspan='3'>... y 980 más</td></tr>"))
  }

  test("error render: first 5 errors joined in error_detalle; html escaped") {
    val errs = (1 to 7).map(i => s"f$i.csv fila 1: <bad&>")
    val vars = Report.toTemplateVars(report("ERROR", errs, 7))
    assert(vars("error_detalle") == errs.take(5).mkString("; "))
    val html = Report.renderHtml(report("ERROR", errs, 7))
    assert(html.contains("errores"))
    // unknown placeholders stay literal (gmail_notifier.py fallback)
    assert(Report.renderTemplate("{desconocido} {run_id}",
      Map("run_id" -> "x")) == "{desconocido} x")
  }

  test("html-to-plain fallback: reference's tag/br/newline rules") {
    // test_gmail_notifier.py TestHtmlToPlain semantics
    assert(Report.htmlToPlain("<p>Hello <b>World</b></p>") == "Hello World")
    assert(Report.htmlToPlain("Line1<br/>Line2<br>Line3").contains("Line1\nLine2\nLine3"))
    assert(!Report.htmlToPlain("<p>A</p>\n\n\n\n<p>B</p>").contains("\n\n\n"))
    // a real rendered notification converts cleanly
    val plain = Report.htmlToPlain(Report.renderHtml(report("SUCCESS")))
    assert(plain.contains("run-123") && !plain.contains("<"))
  }

  test("empty render: NO_FILES template mentions no changes") {
    val html = Report.renderHtml(report("NO_FILES"))
    assert(html.contains("sin archivos nuevos"))
  }
}
