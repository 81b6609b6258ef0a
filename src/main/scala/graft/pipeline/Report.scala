package graft.pipeline

/** A4/A5/S9 — run-level report aggregation and notification rendering
  * (reference: smartbots-etl/src/application/dtos.py:21-88, template
  * rendering gmail_notifier.py:92-111). The "email" is driver-side
  * reporting after the Spark jobs complete; rendering keeps the reference's
  * quirks: only `{word}` placeholders substitute (CSS braces survive),
  * error lists truncate at 20 with "y N más".
  */
object Report {

  final case class FileOutcome(
      fileName: String, status: String, rowsTotal: Long, rowsValid: Long,
      rowsError: Long, inserted: Long, updated: Long, unchanged: Long,
      sourceTotal: BigDecimal, errorDetail: Seq[String])

  final case class ExecutionReport(
      runUuid: String, status: String, files: Seq[FileOutcome],
      sourceTotal: BigDecimal, outputTotal: BigDecimal,
      validationErrors: Seq[String]) {
    def totalFiles: Int = files.size
    def failedFiles: Int = files.count(f => f.status != "COMPLETED" && f.status != "SKIPPED")
    def totalRecords: Long = files.map(_.rowsTotal).sum
    def inserted: Long = files.map(_.inserted).sum
    def updated: Long = files.map(_.updated).sum
    def unchanged: Long = files.map(_.unchanged).sum
    def errors: Long = files.map(_.rowsError).sum
    def amountVariance: BigDecimal = (sourceTotal - outputTotal).abs
    def hasErrors: Boolean = failedFiles > 0 || status == "ERROR"
  }

  /** A5 — status roll-up (consolidate_invoices.py:92-100,140-145). */
  def rollUp(processable: Int, failed: Int): String =
    graft.operators.Reconcile.rollUp(processable.toLong, failed.toLong)

  /** Error list capped at `cap` entries plus a "y N más" tail
    * (dtos.py:74-88).
    */
  def cappedErrors(errors: Seq[String], cap: Int = 20): Seq[String] =
    if (errors.size <= cap) errors
    else errors.take(cap) :+ s"... y ${errors.size - cap} más"

  /** `{word}` template substitution that leaves non-identifier braces (CSS
    * blocks) intact (gmail_notifier.py:92-111: regex `\{(\w+)\}` with
    * lookup fallback to the literal).
    */
  def renderTemplate(template: String, vars: Map[String, String]): String =
    "\\{(\\w+)\\}".r.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1), m.matched)))

  /** Plain-text run summary (the notification body's data). */
  def summary(r: ExecutionReport): String = {
    val lines = Seq(
      s"Ejecución: ${r.runUuid}",
      s"Estado: ${r.status}",
      s"Archivos: ${r.totalFiles} (${r.failedFiles} con error)",
      s"Registros: ${r.totalRecords} — insertados ${r.inserted}, " +
        s"actualizados ${r.updated}, sin cambio ${r.unchanged}, errores ${r.errors}",
      s"Total origen: ${r.sourceTotal}",
      s"Total salida: ${r.outputTotal}",
      s"Varianza: ${r.amountVariance}") ++
      cappedErrors(r.validationErrors).map(e => s"  - $e")
    lines.mkString("\n")
  }
}
