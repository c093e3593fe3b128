package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-contract checks at warehouse scale — the generalization of the
  * reference's fixed inline validations (required columns, no-null,
  * numeric dtype; transform.py:40-50) into reusable, distributed
  * expectation operators. Each check is ONE aggregate or join pass that
  * returns violation evidence (not a boolean), so callers can gate a
  * load, quarantine rows, or alert with specifics.
  */
object Quality {

  /** Duplicate-key evidence: key tuples appearing more than once.
    * One hash aggregate; at scale this is the uniqueness audit run
    * before declaring a column a merge/upsert key.
    */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Referential-integrity evidence: child rows whose key has no parent
    * (orphans), via left-anti join — the only shuffle is the join itself,
    * and a broadcast parent makes it map-side.
    */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey)),
      child(childKey) === col(parentKey), "left_anti")

  /** Null-rate profile: per column, row count / null count / distinct
    * count in ONE pass (count-if aggregates, exact distinct) — the
    * completeness report a contract asserts thresholds against.
    */
  def completeness(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__rows"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"('$c', ${c}__rows, ${c}__nulls, ${c}__distinct)").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, ${cols.map(c =>
        s"'$c', ${c}__rows, ${c}__nulls, ${c}__distinct").mkString(", ")}) " +
        "AS (column_name, n_rows, n_nulls, n_distinct)")
  }

  /** Contract audit of the fixture warehouse, as a driver-checkable
    * query: per check, the violation count (all zeros on healthy data —
    * the assertion is the QUERY, so the oracle proves both engines agree
    * on what "violation" means).
    */
  def contractAudit(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val checks = Seq(
      ("orders_pk_unique",
        duplicateKeys(orders, Seq("o_orderkey")).count()),
      ("orders_customer_fk",
        orphans(orders, "o_custkey", customer, "c_custkey").count()),
      ("lineitem_orders_fk",
        orphans(lineitem, "l_orderkey", orders.select("o_orderkey"), "o_orderkey").count()),
      ("orders_orderkey_nulls",
        orders.filter(col("o_orderkey").isNull).count()),
      ("orders_totalprice_nonpositive",
        orders.filter(col("o_totalprice") <= 0).count()))
    import s.implicits._
    checks.toDF("check_name", "n_violations").orderBy(col("check_name"))
  }
}
