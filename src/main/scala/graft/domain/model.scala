package graft.domain

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** Record status during the merge, mirroring the reference's `RecordStatus`
  * enum (reference: smartbots-etl/src/domain/entities.py:10-16). Represented
  * as a plain string column in DataFrames so it survives any sink.
  */
object RecordStatus {
  val New = "new"
  val Updated = "updated"
  val Unchanged = "unchanged"
  val Error = "error"
}

/** Audit actions written to the record log
  * (reference: smartbots-etl/src/infrastructure/sqlite_tracker.py:48-58).
  */
object RecordAction {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Unchanged = "UNCHANGED"
  val ValidationError = "VALIDATION_ERROR"
  val TransformError = "TRANSFORM_ERROR"
}

/** The central row entity — one transport-invoice line
  * (reference: smartbots-etl/src/domain/entities.py:19-52).
  *
  * Money fields are BigDecimal (DecimalType(18,2) on the wire) — the
  * reference's "never float" invariant (ARCHITECTURE.md:1773). Composite
  * primary key is (invoice_number, reference_number), both trimmed
  * (entities.py:73-76). Domain invariants (non-empty key fields, non-negative
  * total, |total - (net+tax)| <= 1) are NOT enforced in the constructor:
  * in a distributed engine errors are data, enforced by
  * [[graft.operators.Validate]] which routes failures to an error channel.
  */
final case class InvoiceRecord(
    invoice_number: String,
    reference_number: String,
    carrier_name: String,
    ship_name: String,
    dispatch_guides: String,
    invoice_date: Date,
    description: String,
    net_amount: java.math.BigDecimal,
    tax_amount: java.math.BigDecimal,
    total_amount: java.math.BigDecimal,
    currency: String,
    fecha_recepcion_digital: String,
    aprobado_por: String,
    estado_operaciones: String,
    fecha_aprobacion_operaciones: String,
    source_file: Option[String],
    processed_at: Option[Timestamp],
    status: String
)

object InvoiceRecord {
  /** Composite primary key columns (entities.py:73-76). */
  val pk: Seq[String] = Seq("invoice_number", "reference_number")

  /** Typed view of a canonical DataFrame — the engine's validated core is
    * `Dataset[InvoiceRecord]` (SURVEY §1.3); missing optional columns are
    * null-filled so any canonicalized frame lifts into the typed API.
    */
  def typed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[InvoiceRecord] = {
    import org.apache.spark.sql.functions.{col, lit}
    val present = df.columns.toSet
    val aligned = df.select(schema.fields.toSeq.map(f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)): _*)
    aligned.as(org.apache.spark.sql.Encoders.product[InvoiceRecord])
  }

  /** Business fields compared by change detection — `has_changes_vs`
    * ignores description and metadata (entities.py:101-111).
    */
  val changeFields: Seq[String] = Seq(
    "carrier_name", "ship_name", "dispatch_guides", "invoice_date",
    "net_amount", "tax_amount", "total_amount")

  val money: DecimalType = DecimalType(18, 2)

  /** Canonical wire schema of the validated core. */
  val schema: StructType = StructType(Seq(
    StructField("invoice_number", StringType, nullable = false),
    StructField("reference_number", StringType, nullable = false),
    StructField("carrier_name", StringType, nullable = false),
    StructField("ship_name", StringType),
    StructField("dispatch_guides", StringType),
    StructField("invoice_date", DateType),
    StructField("description", StringType),
    StructField("net_amount", money),
    StructField("tax_amount", money),
    StructField("total_amount", money),
    StructField("currency", StringType),
    StructField("fecha_recepcion_digital", StringType),
    StructField("aprobado_por", StringType),
    StructField("estado_operaciones", StringType),
    StructField("fecha_aprobacion_operaciones", StringType),
    StructField("source_file", StringType),
    StructField("processed_at", TimestampType),
    StructField("status", StringType)
  ))
}

/** Source-sheet configuration mirroring the reference's `ExcelConfig`
  * (reference: smartbots-etl/src/application/config.py:25-60). Header and
  * data rows are 1-indexed, as in the reference.
  */
final case class SheetConfig(
    sourceSheet: String = "Sheet1",
    consolidatedSheet: String = "Consolidado",
    headerRow: Int = 6,
    dataStartRow: Int = 7,
    skipSchemaValidation: Boolean = false,
    expectedColumns: Seq[String] = SheetConfig.expectedColumns,
    columnMapping: Seq[(String, String)] = SheetConfig.columnMapping,
    dateFormat: String = "dd-MM-yyyy"
)

object SheetConfig {
  /** Consolidated-sheet expected headers (config.py:32-45). */
  val expectedColumns: Seq[String] = Seq(
    "N° Factura", "Empresa Transporte", "Nave", "Órdenes de Embarque",
    "Guías de Despacho", "Total Servicio ($)", "Fecha Emisión",
    "Fecha Recepción Digital", "Aprobado por:", "Estado Operaciones",
    "Fecha Aprobación Operaciones")

  /** Spanish header → canonical field (config.py:46-60). Ordered, so the
    * canonical projection is deterministic.
    */
  val columnMapping: Seq[(String, String)] = Seq(
    "N° Factura" -> "invoice_number",
    "Empresa Transporte" -> "carrier_name",
    "Nave" -> "ship_name",
    "Órdenes de Embarque" -> "reference_number",
    "Guías de Despacho" -> "dispatch_guides",
    "Total Servicio ($)" -> "total_amount",
    "Fecha Emisión" -> "invoice_date",
    "Fecha Recepción Digital" -> "fecha_recepcion_digital",
    "Aprobado por:" -> "aprobado_por",
    "Estado Operaciones" -> "estado_operaciones",
    "Fecha Aprobación Operaciones" -> "fecha_aprobacion_operaciones")
}
