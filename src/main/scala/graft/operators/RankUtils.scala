package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global order statistics — the shared build behind
  * revenueLorenz, selectionGain, and ppsSample (and any future consumer
  * of "rank the corpus without sorting it through one task").
  *
  * A bare `row_number()/sum() OVER (ORDER BY ...)` serializes the table
  * through ONE window task (WindowExec warns exactly this); these helpers
  * instead range-partition on the sort key (sampled boundaries, fully
  * parallel), compute per-PARTITION ranks/running sums, and add broadcast
  * per-partition prefix offsets: global = local + offset. Sampled
  * boundaries move WHERE partitions split, never the total key order, so
  * the results are deterministic and engine-exact — each caller's oracle
  * states the naive global window and proves the build result-invisible.
  *
  * Both helpers eagerly localCheckpoint the range-partitioned frame: the
  * offsets and the per-partition pass MUST read one frozen partitioning
  * (re-sampled boundaries between the two reads could disagree), and
  * every caller consumes the ranked frame at least twice anyway.
  */
object RankUtils {

  /** Input columns plus `rank` (1-based, dense over rows, ordered by
    * `sortCols` — include a unique tiebreaker for determinism).
    */
  def globalRank(df: DataFrame, nPart: Int, sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(nPart, sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = parted.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("offset"))
    parted
      .withColumn("lrk", row_number().over(
        Window.partitionBy(col("pid")).orderBy(sortCols: _*)).cast("long"))
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("rank", col("lrk") + col("offset"))
      .drop("pid", "lrk")
  }

  /** Input columns plus `cum_hi` — the inclusive running sum of
    * `weightCol` along the `sortCols` order (the cumulative line of a
    * PPS draw; `cum_hi - weight` recovers the exclusive lower endpoint).
    */
  def prefixSum(df: DataFrame, weightCol: String, nPart: Int,
                sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(nPart, sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = parted.groupBy(col("pid")).agg(sum(col(weightCol)).as("pw"))
      .withColumn("offset",
        coalesce(sum(col("pw")).over(
          Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("offset"))
    parted
      .withColumn("lcum", sum(col(weightCol)).over(
        Window.partitionBy(col("pid")).orderBy(sortCols: _*)))
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("cum_hi", col("lcum") + col("offset"))
      .drop("pid", "lcum")
  }
}
