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

  test("envelope: full reference contract — headers, alternative bodies, attachments") {
    val dir = java.nio.file.Files.createTempDirectory("graft-env")
    val att = dir.resolve("consolidado.xlsx")
    java.nio.file.Files.write(att, Array[Byte](1, 2, 3, 4))
    val email = AppConfig.Email(
      sender = "etl@example.test",
      to = Seq("ops@example.test", "finanzas@example.test"),
      cc = Seq("jefatura@example.test"),
      bcc = Nil,
      templates = Map(
        "success" -> "ETL_Consolidacion_Exito.html",
        "partial" -> "ETL_Consolidacion_Parcial.html",
        "error" -> "ETL_Consolidacion_Error.html",
        "empty" -> "ETL_Consolidacion_Vacio.html"))
    val env = Report.envelope(email, report("SUCCESS"),
      consolidatedLink = "file:///c.parquet", timestamp = "2026-08-12",
      attachmentPaths = Seq(att, dir.resolve("no-existe.pdf")))

    // headers in the reference's shape: comma-joined To, Cc present,
    // Bcc ABSENT when empty (oauth_gmail_notifier.py:88-94)
    assert(env.headers.contains("From" -> "etl@example.test"))
    assert(env.headers.contains("To" -> "ops@example.test, finanzas@example.test"))
    assert(env.headers.contains("Cc" -> "jefatura@example.test"))
    assert(!env.headers.exists(_._1 == "Bcc"))
    assert(env.subject == "[Smartbots ETL] - EXITOSO")
    // both body parts; text is the html's plain fallback
    assert(env.htmlBody.contains("exitosamente") && env.htmlBody.contains("run-123"))
    assert(env.textBody.contains("run-123") && !env.textBody.contains("<"))
    // existing attachment read; missing path skipped silently
    assert(env.attachments.map(_.fileName) == Seq("consolidado.xlsx"))
    assert(env.attachments.head.bytes.toSeq == Seq[Byte](1, 2, 3, 4))
    // artifact render carries everything a transport connector needs
    val art = env.renderArtifact
    assert(art.contains("To: ops@example.test, finanzas@example.test"))
    assert(art.contains("--- text/plain ---") && art.contains("--- text/html ---"))
    assert(art.contains("attachment: consolidado.xlsx (4 bytes)"))
    assert(art.contains(java.util.Base64.getEncoder.encodeToString(
      Array[Byte](1, 2, 3, 4))))
  }

  test("envelope: template resolves via config map with the reference's error fallback") {
    val email = AppConfig.Email(sender = "etl@example.test", to = Seq("a@b.c"))
    // unconfigured templates section → the reference's literal fallback
    // (consolidate_invoices.py:651-653): Error template even for SUCCESS
    val env = Report.envelope(email, report("SUCCESS"))
    assert(env.htmlBody.contains("terminó con <span class=\"bad\">errores</span>"))
    assert(env.subject.endsWith("- EXITOSO")) // label still from status
    // configured map routes by status key
    val cfg = email.copy(templates = Map("empty" -> "ETL_Consolidacion_Vacio.html"))
    assert(Report.envelope(cfg, report("NO_FILES")).htmlBody
      .contains("sin archivos nuevos"))
  }

  test("Envio_* template family renders with CSS braces preserved") {
    val asuntos = Seq("OE-1001 Nave Austral", "OE-1002 Nave Pacífico")
      .map(a => s"<li>$a</li>").mkString("\n")
    val informe = Report.renderTemplate(Report.loadTemplate("Envio_Informe.html"),
      Map("asuntos_exitosos" -> asuntos))
    assert(informe.contains("<li>OE-1001 Nave Austral</li>"))
    assert(informe.contains("envío de correos a Recibidores"))
    assert(informe.contains("line-height: 1.55; }")) // CSS braces survive
    assert(!informe.contains("{asuntos_exitosos}"))

    val v0 = Report.renderTemplate(Report.loadTemplate("Envio_Informe_v0.html"),
      Map("Ordenes_Embarque" -> "<li>OE-7</li>"))
    assert(v0.contains("<li>OE-7</li>") && v0.contains("Agentes de Aduana"))
    assert(!v0.contains("{Ordenes_Embarque}"))

    val recibidor = Report.renderTemplate(Report.loadTemplate("Envio_Recibidor.html"),
      Map("cuerpo" -> "<p>Estimado recibidor, se adjunta la orden.</p>"))
    assert(recibidor.contains("se adjunta la orden"))
    assert(!recibidor.contains("{cuerpo}"))

    val vacio = Report.loadTemplate("Envio_Vacio.html")
    assert(vacio.contains("no se han identificado registros"))
    // static template: no {word} placeholders (CSS braces don't count)
    assert("\\{\\w+\\}".r.findFirstIn(vacio).isEmpty)
  }
}
