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
    if (!s.catalog.tableExists(ot)) {
      // the in-memory catalog forgets tables between JVMs but their
      // warehouse directories persist — clear any stale location so the
      // CTAS below doesn't trip LOCATION_ALREADY_EXISTS
      val conf = s.sparkContext.hadoopConfiguration
      Seq(ot, lt).foreach { t =>
        val p = new org.apache.hadoop.fs.Path(
          s.sessionState.conf.warehousePath.stripSuffix("/") + "/" + t)
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.delete(p, true)
      }
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").format("parquet")
        .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
      Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite").format("parquet")
        .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
    }
    (ot, lt)
  }

  /** The join+agg over the bucketed layout, WITHOUT a final sort — the
    * steady-state plan a dashboard query would run. Join on the bucket key
    * and aggregation on that same key both reuse the bucket partitioning:
    * zero Exchange in the whole plan.
    */
  def revenueJoinPlan(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensureBucketedTables(s, dir)
    s.table(ot)
      .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_custkey"))
      .agg(graft.operators.Analytics.r4(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
  }

  /** Oracle-comparable form (deterministic total order). */
  def bucketedOrderRevenue(s: SparkSession, dir: String): DataFrame =
    revenueJoinPlan(s, dir).orderBy(col("o_orderkey"))
}
