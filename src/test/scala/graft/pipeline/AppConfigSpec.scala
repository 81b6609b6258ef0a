package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** YAML config loading (reference config.py:12-131) against the
  * configuration.yaml.template shape, and a pipeline run driven entirely
  * from the loaded config.
  */
class AppConfigSpec extends SparkSpec {

  private val templateShape =
    """# comment line
      |google:
      |  credentials_path: "./credentials/credentials.json"
      |  token_path: "./credentials/token.json"
      |
      |drive:
      |  source_path: "Bot RPA/Operaciones/Consolidacion facturas"  # inline comment
      |  in_process_folder: "En Proceso"
      |  backup_path: "Respaldo"
      |  consolidated_path: "Consolidado"
      |  consolidated_filename: "CONSOLIDADO DE FACTURAS.xlsx"
      |
      |excel:
      |  header_row: 6
      |  data_start_row: 7
      |  source_sheet: "DETALLE FACTURACIÓN CONTENEDORE"
      |  skip_schema_validation: true
      |  column_mapping:
      |    "N° Factura": "invoice_number"
      |    "Empresa Transporte": "carrier_name"
      |    "Total Servicio ($)": "total_amount"
      |  consolidated_sheet: "CONTROL FACTURAS"
      |  date_format: "%d-%m-%Y"
      |
      |email:
      |  sender: "bot@example.com"
      |  to: "a@example.com, b@example.com"
      |  cc: "c@example.com"
      |  bcc: ""
      |  subject_prefix: "Consolidacion Facturas"
      |  templates:
      |    success: "ETL_Consolidacion_Exito.html"
      |    error: "ETL_Consolidacion_Error.html"
      |
      |tracking:
      |  db_path: "data/etl_tracking.db"
      |
      |downloads:
      |  temp_path: "downloads"
      |
      |logging:
      |  level: "INFO"  # Change to DEBUG for development
      |  log_to_file: true
      |  log_dir: "logs"
      |""".stripMargin

  test("template shape loads with sections, mapping order, type inference") {
    val cfg = AppConfig.fromYamlText(templateShape)
    assert(cfg.google.credentialsPath == "./credentials/credentials.json")
    assert(cfg.drive.sourcePath == "Bot RPA/Operaciones/Consolidacion facturas")
    assert(cfg.drive.consolidatedFilename == "CONSOLIDADO DE FACTURAS.xlsx")
    assert(cfg.excel.headerRow == 6 && cfg.excel.dataStartRow == 7)
    assert(cfg.excel.skipSchemaValidation)
    assert(cfg.excel.columnMapping == Seq(
      "N° Factura" -> "invoice_number",
      "Empresa Transporte" -> "carrier_name",
      "Total Servicio ($)" -> "total_amount"))
    assert(cfg.excel.dateFormat == "dd-MM-yyyy") // %d-%m-%Y converted
    assert(cfg.email.to == Seq("a@example.com", "b@example.com"))
    assert(cfg.email.bcc.isEmpty)
    assert(cfg.email.templates("success") == "ETL_Consolidacion_Exito.html")
    assert(cfg.logging.logToFile)
  }

  test("missing required sections / file are errors (config.py:105-131)") {
    val e = intercept[IllegalArgumentException](
      AppConfig.fromYamlText("google:\n  credentials_path: x\n"))
    assert(e.getMessage.contains("drive") && e.getMessage.contains("email"))
    intercept[java.io.FileNotFoundException](AppConfig.load("/no/such/config.yaml"))
  }

  test("email recipients accept YAML sequences as well as comma strings") {
    val cfg = AppConfig.fromYamlText(
      """google:
        |  credentials_path: x
        |drive:
        |  source_path: landing
        |email:
        |  sender: s@example.com
        |  to:
        |    - a@example.com
        |    - b@example.com
        |  cc:
        |    - c@example.com
        |""".stripMargin)
    assert(cfg.email.to == Seq("a@example.com", "b@example.com"))
    assert(cfg.email.cc == Seq("c@example.com"))
  }

  test("missing leaf requirements raise like config.py builders") {
    intercept[IllegalArgumentException](AppConfig.fromYamlText(
      "google:\n  token_path: t\ndrive:\n  source_path: s\nemail:\n  sender: e\n"))
    intercept[IllegalArgumentException](AppConfig.fromYamlText(
      "google:\n  credentials_path: c\ndrive:\n  backup_path: b\nemail:\n  sender: e\n"))
    intercept[IllegalArgumentException](AppConfig.fromYamlText(
      "google:\n  credentials_path: c\ndrive:\n  source_path: s\nemail:\n  cc: x\n"))
  }

  test("defaults fill unspecified keys like the reference dataclasses") {
    val cfg = AppConfig.fromYamlText(
      """google:
        |  credentials_path: x
        |drive:
        |  source_path: landing
        |email:
        |  sender: s@example.com
        |""".stripMargin)
    assert(cfg.google.tokenPath == "./credentials/token.json")
    assert(cfg.drive.inProcessFolder == "En Proceso")
    assert(cfg.excel.headerRow == 6)
    assert(cfg.excel.columnMapping == AppConfig.DefaultColumnMapping)
    assert(cfg.tracking.dbPath == "data/etl_tracking.db")
    assert(cfg.email.subjectPrefix == "[Smartbots ETL]")
  }

  test("loaded config drives a pipeline run end-to-end") {
    val root = Files.createTempDirectory("graft-yaml").toString
    val yaml = s"$root/configuration.yaml"
    Files.writeString(Paths.get(yaml),
      """google:
        |  credentials_path: ./cred.json
        |drive:
        |  source_path: "landing"
        |  backup_path: "Respaldo"
        |  consolidated_path: "Consolidado"
        |  consolidated_filename: "consolidado.xlsx"
        |email:
        |  sender: bot@example.com
        |tracking:
        |  db_path: "audit/etl_tracking.db"
        |excel:
        |  date_format: "%d-%m-%Y"
        |""".stripMargin)
    val app = AppConfig.load(yaml)
    val pc = app.toPipelineConfig(root)
    assert(pc.consolidatedPath == s"$root/Consolidado/consolidado.parquet")
    assert(pc.dateFormat == "dd-MM-yyyy")

    Files.createDirectories(Paths.get(pc.landingDir))
    val headers = Seq("N° Factura", "N° Referencia", "Transportista",
      "Fecha Factura", "Descripción", "Monto Neto", "IVA", "Monto Total", "Moneda")
    val row = Seq("FAC-100", "REF-100", "Carrier Conf",
      "15-01-2026", "x", "100000", "19000", "119000", "CLP")
    val all = Seq.fill(10)(Seq.fill(headers.size)("")) ++ Seq(headers, row)
    Files.writeString(Paths.get(pc.landingDir, "f1.csv"),
      all.map(_.map(c => "\"" + c + "\"").mkString(",")).mkString("\n"))

    val report = ConsolidationPipeline.run(spark, pc)
    assert(report.status == "SUCCESS", report.toString)
    assert(report.inserted == 1)
    assert(spark.read.parquet(pc.consolidatedPath).count() == 1)
  }
}
