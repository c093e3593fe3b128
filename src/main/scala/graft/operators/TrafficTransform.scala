package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.TransformError

/** The reference's transform dataflow (T1-T8, src/etl/transform.py:55-63),
  * re-expressed as *one lazy Catalyst plan* instead of five eager pandas
  * passes. Each combinator is `DataFrame => DataFrame`; Catalyst's
  * CollapseProject/ColumnPruning fuse the chain into a single
  * whole-stage-codegen'd projection over the scan.
  *
  * Validation combinators that must inspect data (null checks) run as ONE
  * single-pass aggregate — never a per-column `count()` loop — so the cost
  * at 100 TB is one scan, not k scans.
  */
object TrafficTransform {

  /** T1 — lowercase all column names (reference: transform.py:57). */
  def normalizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** T2 — strict day-first timestamp parse (reference: transform.py:16-28).
    * The reference parses with `dayfirst=True` (docstring says dd/mm/YY) and
    * raises if ANY value fails to parse (transform.py:24-25). Spark's
    * `to_timestamp` returns null on failure, so strictness is enforced by
    * a null-delta assertion in [[requireNoNewNulls]] at action time; here we
    * only build the plan. Already-timestamp input passes through unchanged
    * (the XLS path materializes TimestampType, SURVEY §1.4).
    */
  def parseTimeColumn(df: DataFrame, column: String = "time"): DataFrame =
    df.schema(column).dataType match {
      case TimestampType => df
      case StringType =>
        // day-first patterns, most-specific first. try_to_timestamp (null on
        // mismatch, even under ANSI mode) + coalesce; strictness is restored
        // by assertParsedFully's null check, matching the reference's
        // fail-on-any-unparsed contract.
        val patterns = Seq(
          "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm", "dd/MM/yyyy",
          "dd/MM/yy HH:mm:ss", "dd/MM/yy HH:mm", "dd/MM/yy",
          "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm", "yyyy-MM-dd")
        val parsed = coalesce(patterns.map(p =>
          try_to_timestamp(col(column), lit(p))): _*)
        df.withColumn(column, parsed)
      case DoubleType | FloatType | LongType | IntegerType =>
        throw TransformError(
          s"Column '$column' is numeric; expected timestamp or string")
      case other =>
        throw TransformError(s"Cannot parse '$column' of type $other as time")
    }

  /** T2 strictness — fail if parsing introduced nulls (or input had NaT).
    * Reference behavior: TransformationError on any unparseable value
    * (transform.py:21-25). One aggregate pass.
    */
  def assertParsedFully(df: DataFrame, column: String = "time"): DataFrame = {
    val bad = df.filter(col(column).isNull).limit(1).count()
    if (bad > 0)
      throw TransformError(
        s"Failed to parse '$column' values as datetime (found nulls after parse)")
    df
  }

  /** T4 — run-constant ingestion timestamp (reference: transform.py:31-35).
    * The reference freezes ONE wall-clock value per run (transform.py:34);
    * `current_timestamp()` would be query-constant but not run-constant
    * across separately executed statements, so the caller captures the
    * instant once (driver) and we inject it as a literal.
    */
  def addCreatedAt(df: DataFrame, runTs: Timestamp): DataFrame =
    df.withColumn("created_at", lit(runTs))

  /** T5 — required-columns contract (reference: transform.py:40-43, and the
    * extract-side variant extract.py:69-74). Pure metadata check: no job.
    */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val have = df.columns.map(_.toLowerCase).toSet
    val missing = required.filterNot(c => have(c.toLowerCase))
    if (missing.nonEmpty)
      throw TransformError(
        s"Missing required columns: ${missing.mkString(", ")}. " +
          s"Found: ${df.columns.mkString(", ")}")
    df
  }

  /** T6 — no-null contract on the given columns (reference:
    * transform.py:45-47). Single-pass aggregate over ALL columns at once
    * (one scan regardless of column count), erroring with the first
    * offending column name like the reference.
    */
  def requireNoNulls(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.map(c =>
      count(when(col(c).isNull, lit(1))).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    columns.zipWithIndex.foreach { case (c, i) =>
      if (row.getLong(i) > 0)
        throw TransformError(s"Column '$c' contains ${row.getLong(i)} null values")
    }
    df
  }

  /** T7 — numeric-dtype contract (reference: transform.py:49-50).
    * Metadata-only, like pandas' is_numeric_dtype.
    */
  def requireNumeric(df: DataFrame, column: String): DataFrame = {
    df.schema(column).dataType match {
      case _: NumericType => df
      case other =>
        throw TransformError(s"Column '$column' must be numeric, got $other")
    }
  }

  /** T8 — final projection, exact column order (reference: transform.py:61). */
  def project(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.map(col): _*)

  /** The full transform (reference: transform() transform.py:55-63):
    * lower → parse(strict) → created_at → validate → project.
    * Everything except the two data-touching assertions is plan-building.
    */
  def apply(df: DataFrame, runTs: Timestamp, strict: Boolean = true): DataFrame = {
    val named = normalizeColumnNames(df)
    requireColumns(named, Seq("time", "traffic"))
    val parsed = parseTimeColumn(named)
    val checked = if (strict) assertParsedFully(parsed) else parsed
    val enriched = addCreatedAt(checked, runTs)
    requireColumns(enriched, Seq("time", "traffic", "created_at"))
    if (strict) requireNoNulls(enriched, Seq("time", "traffic"))
    requireNumeric(enriched, "traffic")
    project(enriched, Seq("time", "traffic", "created_at"))
  }
}
