package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketed (co-located) fact-fact joins: the storage-layout lever that
  * removes the per-query shuffle entirely.
  *
  * A plain orders x lineitem join shuffles BOTH sides on the join key every
  * time it runs — at 100 TB that exchange dominates the query. Bucketing
  * both tables by the key at WRITE time (`bucketBy(n, key).sortBy(key)`)
  * pre-partitions the data once; every subsequent join (and any groupBy on
  * the same key) reads co-located buckets and the plan contains NO
  * Exchange before the join — verified by BucketingSpec against the
  * executed plan. This is the "pay the shuffle once at load, never at
  * query" pattern the warehouse load path (Sinks.loadWarehouse) would use
  * for production fact tables.
  */
object Bucketing {

  /** Bucket count: local fixture sizing. On a cluster, pick so each bucket
    * is a few hundred MB at full scale (e.g. 4096 buckets for a 1 TB
    * fact), and keep it IDENTICAL across co-joined tables — equal bucket
    * counts are what let the planner align partitions one-to-one.
    */
  val NumBuckets = 16

  private def suffix(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** One-time bucketed layout of orders + lineitem for `dir` (table names
    * carry a dir fingerprint so different scale factors never collide in a
    * shared session catalog).
    */
  def ensureBucketedTables(s: SparkSession, dir: String): (String, String) = {
    val (ot, lt) = (s"orders_b_${suffix(dir)}", s"lineitem_b_${suffix(dir)}")
    // each table created independently: a partial prior run (orders
    // written, lineitem failed) must self-heal, not wedge the session
    def ensure(table: String, write: String => Unit): Unit =
      if (!s.catalog.tableExists(table)) {
        // the in-memory catalog forgets tables between JVMs but their
        // warehouse directories persist — clear any stale location so
        // the CTAS doesn't trip LOCATION_ALREADY_EXISTS
        val p = new org.apache.hadoop.fs.Path(
          s.sessionState.conf.warehousePath.stripSuffix("/") + "/" + table)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        write(table)
      }
    ensure(ot, t => Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").format("parquet")
      .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey").saveAsTable(t))
    ensure(lt, t => Tables.lineitem(s, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").format("parquet")
      .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey").saveAsTable(t))
    (ot, lt)
  }

  /** The join+agg over the bucketed layout, WITHOUT a final sort — the
    * steady-state plan a dashboard query would run. Join on the bucket key
    * and aggregation on that same key both reuse the bucket partitioning:
    * zero Exchange in the whole plan.
    */
  def revenueJoinPlan(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensureBucketedTables(s, dir)
    // per-row 4-decimal fixed-point BEFORE the sum: the int sum is exact
    // in any accumulation order, so the bucketed plan, the shuffled plain
    // plan, and the oracle all agree bit-for-bit (round(sum(double)) would
    // depend on fetch order — the repo-wide fixed-point discipline)
    s.table(ot)
      .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_custkey"))
      .agg(sum(expr(
        """CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)
           * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"""))
        .as("revenue_1e4"))
  }

  /** Oracle-comparable form (deterministic total order). */
  def bucketedOrderRevenue(s: SparkSession, dir: String): DataFrame =
    revenueJoinPlan(s, dir).orderBy(col("o_orderkey"))
}
