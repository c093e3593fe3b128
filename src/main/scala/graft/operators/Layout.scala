package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Z-order (Morton-curve) data layout: the multi-dimensional clustering
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY` — interleave the bits
  * of several normalized key columns into one sort key so that sorting by
  * it co-locates rows that are close in EVERY dimension at once. Files
  * written in that order get tight per-file min/max ranges on all the
  * z-ordered columns simultaneously, which is what makes multi-column
  * predicate data-skipping work at 100 TB (a single-column sort gives
  * tight ranges on one column and full-span ranges on the rest).
  *
  * The reference has no layout story (it overwrite-loads one small CSV —
  * `/root/reference/src/etl/load.py`); this is a builder-brief scale
  * extension.
  */
object Layout {

  /** Bits kept per dimension when normalizing a key into [0, 2^bits). */
  val BitsPerDim = 16

  /** `(expr DIV 2^i) % 2`, the i-th bit — pure integer arithmetic that
    * every engine evaluates identically (no shift builtins needed).
    */
  private def bit(e: String, i: Int): String = s"(($e DIV ${1L << i}) % 2)"

  /** Morton interleave of two `BitsPerDim`-bit non-negative ints: x gets
    * the even bit positions, y the odd ones.
    */
  private def mortonExpr(x: String, y: String): String =
    (0 until BitsPerDim).map { i =>
      s"${bit(x, i)} * ${1L << (2 * i)} + ${bit(y, i)} * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Z-order layout audit over lineitem keyed on (l_partkey, l_suppkey):
    * normalize each key to 16 bits against its global min/max, interleave
    * into a 32-bit z-value, and report per z-cell (the top 4 z bits — a
    * 4x4 grid over the two dimensions) the row count and the min/max
    * span of BOTH keys, as half-up 4-decimal fractions of the global
    * span. Tight spans on both columns in every cell is precisely the
    * property the file-level skipping index exploits; the same z column
    * is what a layout writer would `repartitionByRange` + sort by.
    *
    * 100 TB shape: the min/max scalars are a broadcast cross join; the
    * z-value is a pure per-row expression (one whole-stage-codegen'd
    * projection, no shuffle); the cell report is one hash aggregate.
    * Deliberately NO global row_number — assigning fixed-size files
    * would need a global rank (single-task window); the scale path is
    * `repartitionByRange(col("z"))` whose sampled range boundaries give
    * near-equal files without any global ordering bottleneck.
    */
  def zorderCells(s: SparkSession, dir: String): DataFrame = {
    withZorderKey(Tables.lineitem(s, dir))
      .withColumn("z_cell", expr(s"z DIV ${1L << (2 * BitsPerDim - 4)}"))
      .groupBy(col("z_cell"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
        first(col("mnp")).as("mnp"), first(col("mxp")).as("mxp"),
        first(col("mns")).as("mns"), first(col("mxs")).as("mxs"))
      // half-up 4-decimal per-cell span as a fraction of the global span
      .withColumn("part_span_1e4", expr(
        "(20000 * (max_part - min_part) + greatest(mxp - mnp, 1)) DIV (2 * greatest(mxp - mnp, 1))"))
      .withColumn("supp_span_1e4", expr(
        "(20000 * (max_supp - min_supp) + greatest(mxs - mns, 1)) DIV (2 * greatest(mxs - mns, 1))"))
      .select(col("z_cell"), col("n_rows"),
        col("min_part"), col("max_part"), col("min_supp"), col("max_supp"),
        col("part_span_1e4"), col("supp_span_1e4"))
      .orderBy(col("z_cell"))
  }

  /** lineitem + global bounds (mnp/mxp/mns/mxs) + normalized keys + the
    * Morton `z` column — the shared core of the audit query and the
    * layout writer.
    */
  def withZorderKey(li: DataFrame): DataFrame = {
    val bounds = li.agg(
      min(col("l_partkey")).as("mnp"), max(col("l_partkey")).as("mxp"),
      min(col("l_suppkey")).as("mns"), max(col("l_suppkey")).as("mxs"))
    val maxNorm = (1L << BitsPerDim) - 1 // 65535
    li.crossJoin(broadcast(bounds))
      .withColumn("xn", expr(
        s"((CAST(l_partkey AS BIGINT) - mnp) * $maxNorm) DIV greatest(mxp - mnp, 1)"))
      .withColumn("yn", expr(
        s"((CAST(l_suppkey AS BIGINT) - mns) * $maxNorm) DIV greatest(mxs - mns, 1)"))
      .withColumn("z", expr(mortonExpr("xn", "yn")))
  }

  /** The layout WRITER the audit's scaladoc promises: rewrite lineitem
    * as parquet clustered by the z key — `repartitionByRange(z)` gives
    * near-equal files from sampled range boundaries (the distributed
    * path; NO global rank anywhere), and the in-partition sort makes
    * each file a contiguous z-range, so its parquet min/max stats are
    * tight on BOTH l_partkey and l_suppkey at once. That is exactly the
    * file-skipping property `OPTIMIZE ZORDER BY` buys; LayoutSpec
    * measures it on the files this writes. Returns the output dir.
    */
  def zorderWrite(s: SparkSession, dir: String, outDir: String,
                  numFiles: Int = 16): String = {
    withZorderKey(Tables.lineitem(s, dir))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"), col("z"))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(outDir)
    outDir
  }
}
