package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range (interval) join: match fact rows to dimension intervals
  * `lo <= value < hi`.
  *
  * Spark has no native range-join operator (Databricks' range-join hint is
  * proprietary), and the naive formulation — a non-equi join — planners
  * execute as BroadcastNestedLoopJoin: every fact row is tested against
  * every interval. Fine for a handful of bands, catastrophic when the
  * interval table grows.
  *
  * The scale path implemented here is the standard bucket-expansion
  * rewrite: pick a bucket width, explode each interval into the buckets it
  * overlaps (sequence/explode — interval tables are small relative to
  * facts), tag each fact row with its single bucket, then EQUI-join on the
  * bucket key and re-check the exact predicate. The fact table is never
  * exploded and never nested-loop scanned; the join is a plain hash join
  * Catalyst can broadcast or shuffle like any other.
  */
object RangeJoin {

  /** Generic bucket-expansion range join.
    *
    * @param fact     fact table
    * @param valueCol fact column to locate in an interval
    * @param bands    interval table with `lo`/`hi` (half-open [lo, hi))
    * @param bucketWidth bucket size; choose ~median interval width so each
    *   interval explodes to O(1) buckets
    */
  def bandJoin(fact: DataFrame, valueCol: Column, bands: DataFrame,
               bucketWidth: Double): DataFrame = {
    // requires lo < hi per band (Spark's sequence() would silently count
    // DOWN for an empty band and fabricate buckets)
    val expanded = bands.withColumn("bucket",
      explode(sequence(
        floor(col("lo") / bucketWidth).cast("long"),
        // last bucket the half-open interval reaches: ceil(hi/w) - 1, so a
        // band ending exactly on a bucket edge does not claim that bucket
        (ceil(col("hi") / bucketWidth).cast("long") - 1))))
    fact
      .withColumn("bucket", floor(valueCol / bucketWidth).cast("long"))
      .join(broadcast(expanded), Seq("bucket"))
      .filter(valueCol >= col("lo") && valueCol < col("hi"))
      .drop("bucket")
  }

  /** Fixed value bands for the events fixture (value in [0.01, ~500)).
    * Literal boundaries so the DuckDB oracle can embed the identical table.
    */
  val EventBands: Seq[(String, Double, Double)] = Seq(
    ("p00_low", 0.0, 10.0),
    ("p10_mid", 10.0, 50.0),
    ("p50_high", 50.0, 100.0),
    ("p90_peak", 100.0, 1000.0))

  /** Events classified into value bands via the bucket-expansion range
    * join, aggregated per band x event_type. Output is pure ints/strings
    * (band totals), so the oracle comparison is engine-proof.
    */
  def eventValueBands(s: SparkSession, dir: String): DataFrame = {
    val bands = s.createDataFrame(EventBands).toDF("band", "lo", "hi")
    bandJoin(Tables.events(s, dir).select(col("event_type"), col("value")),
        col("value"), bands, bucketWidth = 10.0)
      .groupBy(col("band"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("band"), col("event_type"))
  }
}
