package graft.pipeline

import java.nio.file.{Files, Paths}

/** YAML-backed application configuration (reference: smartbots-etl/src/
  * application/config.py:12-131 and configs/configuration.yaml.template):
  * the `google / drive / excel / email / tracking / logging / downloads`
  * sections with the reference's defaults, required-section validation,
  * and the Excel column-mapping / expected-columns surface externalized.
  *
  * The YAML subset parser is dependency-free (no new jars): maps by
  * indentation, `key: value` scalars with single/double quotes, `- item`
  * sequences, comments, and type inference for ints/booleans — exactly
  * what the reference template uses.
  */
object AppConfig {

  final case class Google(
      credentialsPath: String,
      tokenPath: String = "./credentials/token.json")

  final case class DrivePaths(
      sourcePath: String,
      inProcessFolder: String = "En Proceso",
      backupPath: String = "Respaldo",
      consolidatedPath: String = "Consolidado",
      consolidatedFilename: String = "consolidado.xlsx")

  final case class Excel(
      sourceSheet: String = "Sheet1",
      consolidatedSheet: String = "Consolidado",
      headerRow: Int = 6,
      dataStartRow: Int = 7,
      skipSchemaValidation: Boolean = false,
      expectedColumns: Seq[String] = DefaultExpectedColumns,
      columnMapping: Seq[(String, String)] = DefaultColumnMapping,
      dateFormat: String = "dd-MM-yyyy")

  final case class Email(
      sender: String,
      to: Seq[String] = Nil,
      cc: Seq[String] = Nil,
      bcc: Seq[String] = Nil,
      subjectPrefix: String = "[Smartbots ETL]",
      templates: Map[String, String] = Map.empty)

  final case class Tracking(dbPath: String = "data/etl_tracking.db")
  final case class Logging(level: String = "INFO", logToFile: Boolean = true,
      logDir: String = "logs")
  final case class Downloads(tempPath: String = "data/downloads")

  final case class App(
      google: Google, drive: DrivePaths, excel: Excel, email: Email,
      tracking: Tracking, logging: Logging, downloads: Downloads) {

    /** Project the Drive/Excel surface onto the local pipeline config —
      * source folder = landing dir, consolidated folder + filename =
      * store path (parquet store keeps the configured basename), backup
      * root = lifecycle dir, tracking db dir = audit dir.
      */
    def toPipelineConfig(root: String,
        mergeMode: String = "insert-only"): ConsolidationPipeline.Config =
      ConsolidationPipeline.Config(
        landingDir = s"$root/${drive.sourcePath}",
        consolidatedPath = s"$root/${drive.consolidatedPath}/" +
          drive.consolidatedFilename.replaceAll("\\.xlsx$", ".parquet"),
        // getParent is null for a bare filename ("etl_tracking.db") —
        // interpolating it would create a directory literally named
        // "null"; a parentless db path means audit tables live at root
        auditDir = Option(Paths.get(tracking.dbPath).getParent)
          .map(p => s"$root/$p").getOrElse(root),
        lifecycleDir = s"$root/${drive.backupPath}",
        mergeMode = mergeMode,
        dateFormat = excel.dateFormat)
  }

  // SheetConfig owns the header contract — aliased, not re-declared, so
  // a header change has exactly one home
  val DefaultExpectedColumns: Seq[String] =
    graft.domain.SheetConfig.expectedColumns

  val DefaultColumnMapping: Seq[(String, String)] =
    graft.domain.SheetConfig.columnMapping

  /** Load + validate (config.py:105-131: required sections google, drive,
    * email; FileNotFoundError on a missing path).
    */
  def load(path: String): App = {
    val p = Paths.get(path).toAbsolutePath
    if (!Files.exists(p))
      throw new java.io.FileNotFoundException(
        s"Archivo de configuración no encontrado: $p")
    fromYamlText(Files.readString(p))
  }

  def fromYamlText(text: String): App = {
    val raw = Yaml.parse(text)
    val missing = Seq("google", "drive", "email").filterNot(raw.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Secciones requeridas faltantes en YAML: $missing")

    def section(name: String): Map[String, Any] = raw.get(name) match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => Map.empty
    }
    def str(m: Map[String, Any], k: String, dflt: => String): String =
      m.get(k).map(_.toString).getOrElse(dflt)
    def int(m: Map[String, Any], k: String, dflt: Int): Int =
      m.get(k).map(_.toString.toInt).getOrElse(dflt)
    def bool(m: Map[String, Any], k: String, dflt: Boolean): Boolean =
      m.get(k).map(_.toString.toBoolean).getOrElse(dflt)
    def strMap(m: Map[String, Any], k: String): Option[Seq[(String, String)]] =
      m.get(k).collect { case mm: Map[String @unchecked, Any @unchecked] =>
        mm.toSeq.map { case (a, b) => a -> b.toString } }
    def strSeq(m: Map[String, Any], k: String): Option[Seq[String]] =
      m.get(k).collect { case s: Seq[Any @unchecked] => s.map(_.toString) }
    // "a@x.com, b@y.com" (template form) OR a YAML sequence
    // (config.py test_email_lists_become_tuples) → Seq
    def recipients(m: Map[String, Any], k: String): Seq[String] =
      m.get(k).toSeq.flatMap {
        case s: Seq[Any @unchecked] => s.map(_.toString.trim)
        case one => one.toString.split(",").map(_.trim).toSeq
      }.filter(_.nonEmpty)

    val g = section("google"); val d = section("drive"); val e = section("excel")
    val em = section("email"); val tr = section("tracking")
    val lg = section("logging"); val dl = section("downloads")

    App(
      google = Google(
        credentialsPath = str(g, "credentials_path",
          throw new IllegalArgumentException("google.credentials_path requerido")),
        tokenPath = str(g, "token_path", "./credentials/token.json")),
      drive = DrivePaths(
        sourcePath = str(d, "source_path",
          throw new IllegalArgumentException("drive.source_path requerido")),
        inProcessFolder = str(d, "in_process_folder", "En Proceso"),
        backupPath = str(d, "backup_path", "Respaldo"),
        consolidatedPath = str(d, "consolidated_path", "Consolidado"),
        consolidatedFilename = str(d, "consolidated_filename", "consolidado.xlsx")),
      excel = Excel(
        sourceSheet = str(e, "source_sheet", "Sheet1"),
        consolidatedSheet = str(e, "consolidated_sheet", "Consolidado"),
        headerRow = int(e, "header_row", 6),
        dataStartRow = int(e, "data_start_row", 7),
        skipSchemaValidation = bool(e, "skip_schema_validation", false),
        expectedColumns = strSeq(e, "expected_columns")
          .getOrElse(DefaultExpectedColumns),
        columnMapping = strMap(e, "column_mapping").getOrElse(DefaultColumnMapping),
        dateFormat = pythonToJavaDateFormat(str(e, "date_format", "dd-MM-yyyy"))),
      email = Email(
        sender = str(em, "sender",
          throw new IllegalArgumentException("email.sender requerido")),
        to = recipients(em, "to"),
        cc = recipients(em, "cc"),
        bcc = recipients(em, "bcc"),
        subjectPrefix = str(em, "subject_prefix", "[Smartbots ETL]"),
        templates = strMap(em, "templates").map(_.toMap).getOrElse(Map.empty)),
      tracking = Tracking(str(tr, "db_path", "data/etl_tracking.db")),
      logging = Logging(str(lg, "level", "INFO"), bool(lg, "log_to_file", true),
        str(lg, "log_dir", "logs")),
      downloads = Downloads(str(dl, "temp_path", "data/downloads")))
  }

  /** `%d-%m-%Y` (python strptime, config.py date_format) → `dd-MM-yyyy`.
    * Already-Java patterns pass through unchanged (no '%').
    */
  def pythonToJavaDateFormat(fmt: String): String =
    if (!fmt.contains('%')) fmt
    else fmt.replace("%d", "dd").replace("%m", "MM")
      .replace("%Y", "yyyy").replace("%y", "yy")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")

  // ------------------------------------------------------------- YAML subset

  /** Indentation-structured YAML subset: nested maps, `- ` sequences,
    * quoted scalars, `#` comments, int/bool inference. Insertion order is
    * preserved (column mappings are ordered).
    */
  private[pipeline] object Yaml {

    def parse(text: String): Map[String, Any] = {
      val lines = text.linesIterator.zipWithIndex
        .map { case (l, i) => (stripComment(l), i) }
        .filter { case (l, _) => l.trim.nonEmpty }
        .toVector
      val (m, rest) = parseMap(lines, indentOf(lines.head._1))
      require(rest.isEmpty, s"YAML inesperado en línea ${rest.headOption.map(_._2 + 1)}")
      m
    }

    private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

    /** Strips a trailing comment, respecting quoted strings. */
    private def stripComment(l: String): String = {
      var inS = false; var inD = false
      val sb = new StringBuilder
      var i = 0
      var done = false
      while (i < l.length && !done) {
        val c = l(i)
        c match {
          case '\'' if !inD => inS = !inS; sb += c
          case '"' if !inS => inD = !inD; sb += c
          case '#' if !inS && !inD &&
            (i == 0 || l(i - 1) == ' ' || l(i - 1) == '\t') => done = true
          case _ => sb += c
        }
        i += 1
      }
      sb.toString
    }

    private def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
      else t
    }

    private def scalar(s: String): Any = {
      val t = s.trim
      if (t.head == '"' || t.head == '\'') unquote(t)
      else t match {
        case "true" | "True" => true
        case "false" | "False" => false
        case "null" | "~" => null
        case _ => t.toIntOption.getOrElse(t)
      }
    }

    /** Splits `key: value` at the first ':' outside quotes. */
    private def keyValue(l: String): (String, String) = {
      val t = l.trim
      var inS = false; var inD = false
      var i = 0
      while (i < t.length) {
        t(i) match {
          case '\'' if !inD => inS = !inS
          case '"' if !inS => inD = !inD
          case ':' if !inS && !inD &&
            (i + 1 == t.length || t(i + 1) == ' ') =>
            return (unquote(t.substring(0, i)), t.substring(i + 1).trim)
          case _ =>
        }
        i += 1
      }
      (unquote(t), "")
    }

    private type Lines = Vector[(String, Int)]

    private def parseMap(lines: Lines, indent: Int): (Map[String, Any], Lines) = {
      var rest = lines
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      while (rest.nonEmpty && indentOf(rest.head._1) == indent &&
          !rest.head._1.trim.startsWith("- ")) {
        val (line, _) = rest.head
        val (k, v) = keyValue(line)
        rest = rest.tail
        if (v.nonEmpty) out(k) = scalar(v)
        else rest.headOption match {
          case Some((next, _)) if indentOf(next) > indent =>
            if (next.trim.startsWith("- ")) {
              val (seq, r2) = parseSeq(rest, indentOf(next))
              out(k) = seq; rest = r2
            } else {
              val (m, r2) = parseMap(rest, indentOf(next))
              out(k) = m; rest = r2
            }
          case _ => out(k) = null // empty section
        }
      }
      // VectorMap: an immutable Map that PRESERVES insertion order — the
      // column mapping's order is the egress column order
      (scala.collection.immutable.VectorMap.from(out), rest)
    }

    private def parseSeq(lines: Lines, indent: Int): (Seq[Any], Lines) = {
      var rest = lines
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      while (rest.nonEmpty && indentOf(rest.head._1) == indent &&
          rest.head._1.trim.startsWith("- ")) {
        out += scalar(rest.head._1.trim.drop(2))
        rest = rest.tail
      }
      (out.toSeq, rest)
    }
  }
}
