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

  /** Interval-OVERLAP join (interval x interval, not point x interval):
    * overlapping event time-windows per user. The naive non-equi
    * formulation is a nested-loop; the scale path expands BOTH sides into
    * the fixed-width buckets they touch and equi-joins on (key, bucket) —
    * each 600s interval spans at most 2 buckets of width 600, so the
    * expansion is O(1) per row — then dedups pairs that met in more than
    * one bucket and re-checks the exact overlap predicate. Shuffle volume
    * is (rows x buckets-per-row), never pairs.
    *
    * Epoch seconds use the same explicit sign-split floor division as
    * rollingHourValue (Spark `div` truncates, DuckDB `//` floors).
    */
  def intervalOverlaps(s: SparkSession, dir: String,
                       windowSec: Long = 600): DataFrame = {
    val tsSec = """CAST(CASE WHEN unix_micros(ts) >= 0
                      THEN unix_micros(ts) div 1000000
                      ELSE -((-unix_micros(ts) + 999999) div 1000000)
                  END AS BIGINT)"""
    val iv = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr(tsSec).as("lo"),
        expr(s"$tsSec + $windowSec").as("hi"))
      .withColumn("bucket",
        explode(expr(s"sequence(lo div $windowSec, (hi - 1) div $windowSec)")))
    val pairs = iv.as("a").join(iv.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.event_id") < col("b.event_id"))
      .filter(col("a.lo") < col("b.hi") && col("b.lo") < col("a.hi"))
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("ev_a"), col("b.event_id").as("ev_b"),
        (least(col("a.hi"), col("b.hi")) - greatest(col("a.lo"), col("b.lo")))
          .as("overlap_sec"))
      .distinct() // a pair meeting in 2 buckets counts once
    pairs.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("overlap_sec")).as("overlap_sec_total"))
      .orderBy(col("user_id"))
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
