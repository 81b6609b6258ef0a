package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.invoice_number_as_int

/** P8 — write-projection to the consolidated Spanish layout (reference:
  * smartbots-etl/src/application/use_cases/consolidate_invoices.py:589-623)
  * plus the per-column presentation metadata the Excel egress formatter
  * applies (COLUMN_FORMATS, excel_handler.py:17-36). Rendering an actual
  * XLSX (template rows, images, cell styles) is a driver-side formatter on
  * top of this projection — outside the engine's data path by design.
  */
object Egress {

  // (the reference's COLUMN_FORMATS presentation metadata lives with the
  // writer that applies it: XlsxEgress.ConsolidatedFormats — a second
  // copy here had already drifted from it and was referenced nowhere)

  /** Canonical fields → the 12 consolidated Spanish headers. `total_amount`
    * renders as double (the reference writes float), invoice number as
    * best-effort integer (F9), description → "Observaciones".
    */
  def consolidatedLayout(df: DataFrame): DataFrame = {
    def opt(name: String) =
      if (df.columns.contains(name)) col(name) else lit(null).cast("string")
    df.select(
      invoice_number_as_int(col("invoice_number")).as("N° Factura"),
      col("carrier_name").as("Empresa Transporte"),
      opt("ship_name").as("Nave"),
      col("reference_number").as("Órdenes de Embarque"),
      opt("dispatch_guides").as("Guías de Despacho"),
      col("total_amount").cast("double").as("Total Servicio ($)"),
      date_format(col("invoice_date"), "dd/MM/yyyy").as("Fecha Emisión"),
      opt("fecha_recepcion_digital").as("Fecha Recepción Digital"),
      opt("aprobado_por").as("Aprobado por:"),
      opt("estado_operaciones").as("Estado Operaciones"),
      opt("fecha_aprobacion_operaciones").as("Fecha Aprobación Operaciones"),
      opt("description").as("Observaciones"))
  }

  /** Full S7 byte surface: consolidated layout → a real `.xlsx` with the
    * reference's per-column formats, appended after the last populated
    * row when the file exists (excel_handler.py:61-132 semantics). The
    * egress view is file-sized by construction (a store slice or a run's
    * inserted rows); the 100 TB data path stays in parquet.
    */
  def writeConsolidatedXlsx(df: DataFrame, path: String,
      maxRows: Int = graft.sources.XlsxEgress.MaxEgressRows): Unit = {
    val layout = consolidatedLayout(df)
    val header: Seq[Any] = layout.columns.toSeq
    // bounded: an unbounded slice fails fast instead of OOMing the driver
    val rows = graft.sources.XlsxEgress
      .boundedCollect(layout, maxRows, s"egreso consolidado a $path")
      .map(r => (0 until r.length).map(i => r.get(i)))
    graft.sources.XlsxEgress.append(path, header, rows,
      graft.sources.XlsxEgress.ConsolidatedFormats)
  }
}
