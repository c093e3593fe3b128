package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pivot / unpivot (reshape) operators. The reference delegates all
  * analytics to its warehouse (SURVEY §2.5); pivoting is the classic
  * report-shaping step a warehouse user runs on the loaded table.
  *
  * Scale notes:
  *  - `pivot(col, values)` with EXPLICIT values — the values-less overload
  *    runs an extra distinct job over the fact table to discover columns,
  *    which is a full scan you don't want at 100 TB (and makes the output
  *    schema data-dependent, which breaks downstream contracts anyway).
  *    With pinned values the pivot is a single map-side conditional
  *    aggregation: one shuffle on the groupBy key, no extra pass.
  *  - `unpivot` (melt) is a zero-shuffle narrow transform — each wide row
  *    explodes to K narrow rows locally.
  */
object Reshape {

  /** Orders count pivoted to one column per order status (F/O/P), one row
    * per priority. Fixed status domain per the TPC-H spec.
    */
  def orderStatusPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderpriority", "o_orderstatus")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .select(col("o_orderpriority"), col("F").as("n_f"),
        col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** The inverse reshape: melt the pivoted counts back to long form
    * (priority, status, n) with Dataset.unpivot.
    */
  def orderStatusUnpivot(s: SparkSession, dir: String): DataFrame =
    orderStatusPivot(s, dir)
      .unpivot(
        ids = Array(col("o_orderpriority")),
        values = Array(col("n_f"), col("n_o"), col("n_p")),
        variableColumnName = "status",
        valueColumnName = "n")
      // unpivot carries the source column NAMES; map back to status codes
      .withColumn("status", expr(
        "CASE status WHEN 'n_f' THEN 'F' WHEN 'n_o' THEN 'O' ELSE 'P' END"))
      .orderBy(col("o_orderpriority"), col("status"))
}
