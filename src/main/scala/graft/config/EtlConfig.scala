package graft.config

import graft.ConfigError

/** Write disposition for the warehouse sink.
  *
  * Reference: `BQ_WRITE_DISPOSITION in {append, truncate}` validated at
  * src/etl/config.py:47-54; mapped to BigQuery WRITE_APPEND/WRITE_TRUNCATE at
  * src/etl/load.py:86-88. Here it maps to SaveMode.Append / SaveMode.Overwrite.
  */
sealed trait WriteDisposition { def name: String }
object WriteDisposition {
  case object Append extends WriteDisposition { val name = "append" }
  case object Truncate extends WriteDisposition { val name = "truncate" }
  def parse(s: String): WriteDisposition = s.trim.toLowerCase match {
    case "append"   => Append
    case "truncate" => Truncate
    case other =>
      throw ConfigError(
        s"Invalid write disposition '$other'. Must be 'append' or 'truncate'.")
  }
}

/** Immutable pipeline configuration.
  *
  * Reference: frozen dataclass `Config` (src/etl/config.py:15-31) with required
  * keys PROJECT_ID/GCS_BUCKET/BQ_DATASET/BQ_TABLE (config.py:41-46), optional
  * disposition (config.py:47-54), and derived URIs `input_gcs_uri` /
  * `bq_table_id` (config.py:24-31). GCS/BigQuery become abstract Hadoop-FS
  * URIs + a warehouse table here (no cloud connectors in this environment;
  * the semantic contract — zones, disposition, row count — is preserved).
  */
final case class EtlConfig(
    projectId: String,
    bucketUri: String, // any Hadoop-FS URI: file:///... locally, gs://... with a connector
    dataset: String,
    table: String,
    writeDisposition: WriteDisposition = WriteDisposition.Append,
    sourceBlob: String = "raw_data/traffic_spreadsheet.xls"
) {
  /** reference: config.py:24-27 `input_gcs_uri` */
  def inputUri: String = s"$bucketUri/$sourceBlob"
  /** reference: config.py:29-31 `bq_table_id` */
  def tableId: String = s"$projectId.$dataset.$table"
  def backupsPrefix: String = s"$bucketUri/backups"
  def processedPrefix: String = s"$bucketUri/processed"
}

object EtlConfig {
  private val Required =
    Seq("PROJECT_ID", "GCS_BUCKET", "BQ_DATASET", "BQ_TABLE")

  /** Load + validate from a key-value map (env vars or properties).
    * Reference: load_config() src/etl/config.py:34-62 — collects ALL missing
    * keys into one error message rather than failing on the first.
    */
  def fromMap(env: Map[String, String]): EtlConfig = {
    val missing = Required.filter(k => env.get(k).forall(_.trim.isEmpty))
    if (missing.nonEmpty)
      throw ConfigError(
        s"Missing required configuration: ${missing.mkString(", ")}. " +
          "Set them in the environment or a properties file.")
    EtlConfig(
      projectId = env("PROJECT_ID").trim,
      bucketUri = env("GCS_BUCKET").trim.stripSuffix("/"),
      dataset = env("BQ_DATASET").trim,
      table = env("BQ_TABLE").trim,
      writeDisposition = WriteDisposition.parse(
        env.getOrElse("BQ_WRITE_DISPOSITION", "append")),
      sourceBlob = env.getOrElse("SOURCE_BLOB",
        "raw_data/traffic_spreadsheet.xls").trim
    )
  }

  /** Reference parity with `load_config()` (config.py:34-38): dotenv is
    * loaded first — from `envPath` if given, else a `.env` in the working
    * directory if one exists — and then process env vars take precedence
    * (python-dotenv's no-override default: an already-set env var is never
    * replaced by a file value).
    */
  def fromEnv(envPath: Option[String] = None): EtlConfig = {
    val path = envPath.orElse(
      Some(".env").filter(p => java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(p))))
    path match {
      case Some(p) => fromEnvFile(p)
      case None    => fromMap(sys.env)
    }
  }

  /** Load from a dotenv/properties file merged UNDER the given env map
    * (env wins — see fromEnv). Accepts `KEY=VALUE` lines, blank lines,
    * `#` comments, an optional `export ` prefix, and single or double
    * quotes around the value.
    */
  def fromEnvFile(path: String, env: Map[String, String] = sys.env): EtlConfig =
    fromMap(parseEnvFile(path) ++ env)

  private[config] def parseEnvFile(path: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isRegularFile(p))
      throw ConfigError(s"Env file not found: $path")
    val lines = java.nio.file.Files.readAllLines(p)
    import scala.jdk.CollectionConverters._
    lines.asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { line =>
        val body = if (line.startsWith("export ")) line.stripPrefix("export ").trim else line
        body.indexOf('=') match {
          case -1 => None // not KEY=VALUE; dotenv ignores such lines
          case i =>
            val key = body.substring(0, i).trim
            val raw = body.substring(i + 1).trim
            val value =
              if (raw.length >= 2 &&
                ((raw.head == '"' && raw.last == '"') ||
                  (raw.head == '\'' && raw.last == '\'')))
                raw.substring(1, raw.length - 1)
              else
                // python-dotenv parity: an unquoted value ends at a
                // whitespace-preceded '#' (inline comment); quoted values
                // keep '#' literally
                raw.replaceFirst("\\s+#.*$", "").trim
            if (key.isEmpty) None else Some(key -> value)
        }
      }
      .toMap
  }
}
