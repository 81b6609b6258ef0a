package graft.sources

import graft.SparkSpec

/** Ingestion-layer semantics: Excel addressing, header-row discovery by
  * marker / known-header vote / fallback, format detection, schema
  * pre-flight (reference: official_format_extractor.py:111-121, :376-396;
  * excel_handler.py:168-183).
  */
class StagedWorkbookSpec extends SparkSpec {

  private def sheet(rows: Seq[String]*) =
    StagedWorkbook.fromRows(spark, rows.map(_.toSeq))

  test("Excel column letters map to 1-indexed positions") {
    assert(StagedWorkbook.colIndex("A") == 1)
    assert(StagedWorkbook.colIndex("C") == 3)
    assert(StagedWorkbook.colIndex("Z") == 26)
    assert(StagedWorkbook.colIndex("AA") == 27)
  }

  test("fixedCell reads by address; blank/absent → None") {
    val s = sheet(
      Seq("", "", ""),
      Seq("", "", " FAC-9 "),
      Seq("", "  ", ""))
    assert(StagedWorkbook.fixedCell(s, "C2").contains("FAC-9")) // trimmed
    assert(StagedWorkbook.fixedCell(s, "B3").isEmpty)           // blank
    assert(StagedWorkbook.fixedCell(s, "A9").isEmpty)           // beyond rows
  }

  test("header discovery: marker wins, else >=3 known headers, else default") {
    val withMarker = sheet(
      Seq("junk", ""),
      Seq("", "Órdenes de Embarque"))
    assert(StagedWorkbook.discoverHeaderRow(withMarker, "Órdenes de Embarque",
      Set.empty) == 2)

    val withKnown = sheet(
      Seq("x", "y", "z"),
      Seq("Unidad", "Conductor", "Contenedor"))
    assert(StagedWorkbook.discoverHeaderRow(withKnown, "NOPE",
      Set("Unidad", "Conductor", "Contenedor", "Plantas")) == 2)

    val nothing = sheet(Seq("a"), Seq("b"))
    assert(StagedWorkbook.discoverHeaderRow(nothing, "NOPE", Set("Q")) == 11)
  }

  test("format detect: mixed requires BOTH C8 and C6 populated") {
    def fc(c6: Option[String], c8: Option[String]) =
      StagedWorkbook.FixedCells(c6, None, c8, None, None, None)
    assert(StagedWorkbook.isMixedFormat(fc(Some("Carrier"), Some("FAC"))))
    assert(!StagedWorkbook.isMixedFormat(fc(Some("Carrier"), None)))
    assert(!StagedWorkbook.isMixedFormat(fc(None, Some("FAC"))))
  }

  test("table projection: headers from the header row, dupes keep first, row_index carried") {
    val s = sheet(
      Seq("A", "B", "", "A"),   // row 1: headers (dup A, blank col 3)
      Seq("1", "2", "x", "9"),
      Seq("3", "4", "y", "8"))
    val t = StagedWorkbook.table(s, 1)
    assert(t.columns.toSeq == Seq("row_index", "A", "B"))
    val rows = t.orderBy("row_index").collect()
    assert(rows.map(_.getAs[String]("A")).toSeq == Seq("1", "3"))
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 3))
  }

  test("schema pre-flight reports missing and extra columns") {
    val (ok1, m1, e1) = StagedWorkbook.validateSchema(
      Seq("row_index", "A", "B", "X"), Seq("A", "B", "C"))
    assert(!ok1 && m1 == Seq("C") && e1 == Seq("X"))
    val (ok2, m2, e2) = StagedWorkbook.validateSchema(
      Seq("row_index", "A", "B"), Seq("A", "B"))
    assert(ok2 && m2.isEmpty && e2.isEmpty)
  }

  test("fromCsvDir: per-file row numbering from a file-partitioned window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csvdir")
    def w(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), lines.mkString("\n"))
    w("a.csv", Seq("\"a1\"", "\"a2\"", "\"a3\""))
    w("b.csv", Seq("\"b1\"", "\"b2\""))
    val staged = StagedWorkbook.fromCsvDir(spark, dir.toString)
    val rows = staged.collect().map(r => (
      r.getAs[String]("source_file").split('/').last,
      r.getAs[Int]("_row_num"),
      r.getSeq[String](r.fieldIndex("cells")).head)).sortBy(x => (x._1, x._2))
    assert(rows.toSeq == Seq(
      ("a.csv", 1, "a1"), ("a.csv", 2, "a2"), ("a.csv", 3, "a3"),
      ("b.csv", 1, "b1"), ("b.csv", 2, "b2")))
    // the numbering window partitions by file, never a global single reducer
    val plan = staged.queryExecution.optimizedPlan.toString
    assert(plan.contains("source_file"))
  }
}
