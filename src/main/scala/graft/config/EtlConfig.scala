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

  def fromEnv(): EtlConfig = fromMap(sys.env)
}
