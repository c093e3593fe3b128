package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.TrafficTransform

/** The reference ETL pipeline as an INCREMENTAL stream: CSV exports
  * landing in a raw directory are parsed with the same day-first
  * contract (T2), enriched with the run timestamp (T4), projected (T8),
  * and appended to the parquet warehouse — each file exactly once,
  * tracked by the checkpoint, no reprocessing on restart.
  *
  * This is the scale-out of the reference's one-file-per-run loop
  * (__main__.py:25-74): instead of a cron invoking the batch pipeline
  * per export, the stream absorbs whatever landed since the last run
  * (`Trigger.AvailableNow` = incremental batch) or runs continuously
  * with a processing-time trigger. State is only file-listing metadata —
  * no aggregation state to size.
  */
object TrafficStream {

  /** Raw CSV contract of the reference's processed artifact: a header
    * with time/traffic, day-first time strings.
    */
  val RawSchema: StructType = StructType(Seq(
    StructField("time", StringType, nullable = true),
    StructField("traffic", DoubleType, nullable = true)))

  def start(spark: SparkSession, rawDir: String, warehouseDir: String,
            checkpointDir: String, runTs: Timestamp): StreamingQuery = {
    val raw = spark.readStream
      .schema(RawSchema)
      .option("header", "true")
      .csv(rawDir)
    val transformed = TrafficTransform.project(
      TrafficTransform.addCreatedAt(
        TrafficTransform.parseTimeColumn(
          TrafficTransform.normalizeColumnNames(raw)), runTs),
      Seq("time", "traffic", "created_at"))
      // batch strictness (assertParsedFully) is an action, so streaming
      // validation is a filter: malformed rows are dropped, not fatal —
      // count them via the query's numOutputRows metric if auditing
      .filter(org.apache.spark.sql.functions.col("time").isNotNull &&
        org.apache.spark.sql.functions.col("traffic").isNotNull)
    transformed.writeStream
      .format("parquet")
      .option("path", warehouseDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
