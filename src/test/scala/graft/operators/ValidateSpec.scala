package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P6 validation split with the reference's invariants and exact tolerance
  * boundary (smartbots-etl/src/domain/entities.py:54-71: variance 1 passes,
  * 2 fails; tests/unit/test_entities.py:74-89).
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def row(inv: String, ref: String, carrier: String, date: Option[String],
      net: Option[Double], tax: Option[Double], total: Option[Double], idx: Long) =
    (inv, ref, carrier, date.map(Date.valueOf).orNull,
      net.map(BigDecimal(_)).orNull, tax.map(BigDecimal(_)).orNull,
      total.map(BigDecimal(_)).orNull, idx)

  private def df(rows: (String, String, String, Date, BigDecimal, BigDecimal, BigDecimal, Long)*) =
    rows.toDF("invoice_number", "reference_number", "carrier_name",
        "invoice_date", "net_amount", "tax_amount", "total_amount", "row_index")
      .withColumn("net_amount", col("net_amount").cast("decimal(18,2)"))
      .withColumn("tax_amount", col("tax_amount").cast("decimal(18,2)"))
      .withColumn("total_amount", col("total_amount").cast("decimal(18,2)"))

  test("valid row passes; each invariant routes to the error channel in order") {
    val d = Some("2026-01-15")
    val data = df(
      row("1", "A", "ok-carrier", d, Some(100), Some(19), Some(119), 1),  // valid
      row("  ", "B", "c", d, Some(1), Some(0), Some(1), 2),               // blank invoice
      row("3", "", "c", d, Some(1), Some(0), Some(1), 3),                 // blank reference
      row("4", "D", " ", d, Some(1), Some(0), Some(1), 4),                // blank carrier
      row("5", "E", "c", None, Some(1), Some(0), Some(1), 5),             // null date
      row("6", "F", "c", d, None, Some(0), Some(1), 6),                   // null money
      row("7", "G", "c", d, Some(1), Some(0), Some(-1), 7),               // negative total
      row("8", "H", "c", d, Some(100), Some(0), Some(101), 8),            // variance 1 → OK
      row("9", "I", "c", d, Some(100), Some(0), Some(102), 9))            // variance 2 → fail

    val s = Validate.split(data)
    val validIdx = s.valid.select("row_index").as[Long].collect().sorted
    assert(validIdx.toSeq == Seq(1L, 8L))

    val errs = s.errors.collect()
      .map(r => r.getAs[Long]("row_index") -> r.getAs[String]("error")).toMap
    assert(errs(2L) == "invoice_number no puede estar vacío")
    assert(errs(3L) == "reference_number no puede estar vacío")
    assert(errs(4L) == "carrier_name no puede estar vacío")
    assert(errs(5L) == "Formato de fecha no reconocido")
    assert(errs(6L) == "Monto inválido")
    assert(errs(7L).startsWith("total_amount no puede ser negativo"))
    assert(errs(9L).contains("no coincide con net"))
  }

  test("J5 lenient existing drops invalid rows from the probe set only") {
    val d = Some("2026-01-15")
    val data = df(
      row("1", "A", "c", d, Some(1), Some(0), Some(1), 1),
      row(" ", "B", "c", d, Some(1), Some(0), Some(1), 2))
    assert(Merge.lenientExisting(data).count() == 1)
  }
}
