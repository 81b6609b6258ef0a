package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions._

/** P1–P5 projection/filter operators and the F-layer scalar functions that
  * feed them (reference citations in the operator Scaladoc).
  */
class CanonicalizeSpec extends SparkSpec {
  import spark.implicits._

  test("P1 column mapping: source headers map, canonical pass through, unmapped drop") {
    val df = Seq(("F1", "O1", "junk")).toDF("N° Factura", "reference_number", "extra")
    val out = Canonicalize.mapColumns(df, Seq(
      "N° Factura" -> "invoice_number",
      "Órdenes de Embarque" -> "reference_number"))
    assert(out.columns.toSeq == Seq("invoice_number", "reference_number"))
    assert(out.head() == org.apache.spark.sql.Row("F1", "O1"))
  }

  test("P5 take-while stops at first match per partition, keeps all when no stop") {
    val df = Seq(
      ("f1", 1, "a"), ("f1", 2, "STOP"), ("f1", 3, "b"), ("f1", 4, "STOP"),
      ("f2", 1, "x"), ("f2", 2, "y")
    ).toDF("file", "rn", "v")
    val out = Canonicalize.takeWhile(df, col("v") === "STOP", col("rn"), Seq(col("file")))
      .select("file", "rn").as[(String, Int)].collect().sorted
    assert(out.toSeq == Seq(("f1", 1), ("f2", 1), ("f2", 2)))
  }

  test("P4 summary-row filter drops NETO/IVA/TOTAL rows case-insensitively") {
    val df = Seq((1, "hello", "world"), (2, "Neto final", "x"), (3, "a", "subTOTAL"))
      .toDF("id", "c1", "c2")
    val kept = Canonicalize.dropSummaryRows(df, Seq("c1", "c2"))
      .select("id").as[Int].collect().toSeq
    assert(kept == Seq(1))
  }

  test("F4 multi-format dates incl. Excel serial; invalid → null") {
    val df = Seq("15-01-2026", "2026-01-15", "15/01/2026", "46037", "31-13-2026",
        "15-01-26", "2026-01-15 10:30:00", "2026-01-15T10:30:00", "1-2-2026")
      .toDF("raw").select(parse_multi_date(col("raw")).as("d"))
    val got = df.as[Option[java.sql.Date]].collect().toSeq
    val want = java.sql.Date.valueOf("2026-01-15")
    assert(got.take(3).forall(_.contains(want)))
    assert(got(3).contains(want)) // serial 46037 = 2026-01-15 (epoch 1899-12-30)
    assert(got(4).isEmpty) // shape matches dd-MM-yyyy, month 13 invalid → null
    assert(got(5).contains(want)) // dd-MM-yy
    assert(got(6).contains(want)) // yyyy-MM-dd HH:mm:ss
    assert(got(7).contains(want)) // yyyy-MM-dd'T'HH:mm:ss
    assert(got(8).isEmpty) // 1-digit day: no format shape matches → null
  }

  test("F6/F1/F2 cleaners") {
    val df = Seq(("Aprobado por:  Juan P ", " clp "))
      .toDF("ap", "cur")
      .select(strip_aprobado_prefix(col("ap")).as("a"), norm_currency(col("cur")).as("c"))
    assert(df.head() == org.apache.spark.sql.Row("Juan P", "CLP"))
  }

  test("F7 total override: positive explicit total wins, else null-safe component sum") {
    val df = Seq((0.0, Some(10.0), 5.0), (99.0, None, 5.0))
      .toDF("ts", "flete", "porteo")
      .select(row_total_override(col("ts").cast("decimal(18,2)"),
        Seq(col("flete").cast("decimal(18,2)"), col("porteo").cast("decimal(18,2)")))
        .as("total"))
    val got = df.collect().map(_.getDecimal(0).doubleValue()).toSeq
    assert(got == Seq(15.0, 99.0))
  }

  test("F9 invoice number best-effort integral rendering") {
    val df = Seq("123.0", "FAC-9", "42").toDF("raw")
      .select(invoice_number_as_int(col("raw")).as("v"))
    assert(df.as[String].collect().toSeq == Seq("123", "FAC-9", "42"))
  }
}
