package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Semantics: for each left row, attach the single right row with the
  * greatest `rightTime <= leftTime` within the same key (the "most recent
  * fact as of this instant" lookup common in feature stores / market data).
  *
  * Implementation is the scalable union-scan pattern, NOT a range join:
  * union both sides tagged, then one window pass per key ordered by
  * (time, side) carrying the last-seen right payload forward
  * (`last(_, ignoreNulls = true)`). Cost = one shuffle on the key + one
  * sort within partitions — O(n log n) total, versus the O(n·m)-per-key
  * blowup of the naive `l.time >= r.time` theta-join. At equal timestamps
  * the right row sorts first, so equality matches (asof >=) are included.
  *
  * This composes existing operators (union/window) per the extension
  * preference order — no custom Catalyst plan needed; the shuffle and sort
  * are exactly what a bespoke SparkPlan would do anyway.
  */
object AsofJoin {

  /** @param left          left (probe) side
    * @param right         right (build/fact) side; must carry `keyCol` and `timeCol`
    * @param keyCol        equi-join key column name (same name both sides)
    * @param leftTime      event-time column on the left
    * @param rightTime     event-time column on the right
    * @param payload       right-side columns to attach
    * @param rightTiebreak payload field names that order right rows sharing
    *                      (key, time) — the LAST one wins the match. Folding
    *                      the tiebreak into the carry window's sort replaces
    *                      what would otherwise be a whole extra shuffle+sort
    *                      of the right side (dedup via row_number) with two
    *                      sort keys on the pass the join already pays for.
    */
  def apply(left: DataFrame, right: DataFrame, keyCol: String,
            leftTime: String, rightTime: String,
            payload: Seq[String], rightTiebreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns
    // Payload travels as ONE struct so the carry-forward is atomic: a right
    // row with a legitimately-NULL payload FIELD still contributes a
    // non-null struct, and can never be "torn" against fields carried from
    // an older right row (which per-column last(ignoreNulls) would do).
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    // side marker: right rows (0) sort before left rows (1) at equal times
    val taggedRight = right.select(
      (col(keyCol).as("__key") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        struct(payload.map(col): _*).as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(keyCol).as("__key") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(payloadStructType).as("__p") +:
        leftCols.map(col)): _*)
    // right rows sharing (key, t) sort by the tiebreak; left rows carry a
    // null struct there, so the extra keys cannot reorder them relative
    // to right rows (side already separates the sides at equal times)
    val w = Window.partitionBy(col("__key"))
      .orderBy((col("__t") +: col("__side") +:
        rightTiebreak.map(f => col(s"__p.$f"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(c => col(s"__p.$c").as(c))): _*)
  }

  /** Query wrapper: each event joined to the user's most recent order as of
    * the event time. Same-instant orders resolve to the max orderkey via
    * the carry window's tiebreak — the match is unique and deterministic
    * (comparable to DuckDB's ASOF JOIN over the deduplicated right side)
    * without a separate dedup shuffle over orders.
    */
  def eventsAsofOrders(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir).select("event_id", "user_id", "ts")
    val orders = Tables.orders(s, dir)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .withColumnRenamed("o_custkey", "user_id")
    apply(events, orders, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), rightTiebreak = Seq("o_orderkey"))
      .filter(col("o_orderkey").isNotNull)
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("event_id"))
  }
}
