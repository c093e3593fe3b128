package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting), shuffle
  * partitions sized to the local core count rather than the 200 default —
  * on a real cluster this is set per-job to ~2-3x total cores. UTC session
  * timezone matches the reference's UTC-everywhere convention
  * (src/etl/transform.py:34, src/etl/__main__.py:28).
  */
object GraftSession {
  def builder(appName: String = "graft",
              master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def create(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
