package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** The point of bucketing is the PLAN, not the values (values are covered
  * by the q_join_bucketed_revenue oracle): co-bucketed join + same-key
  * aggregation must execute with zero shuffle exchanges.
  */
class BucketingSpec extends SparkTestBase {

  test("co-bucketed join + agg plan contains no exchange at all") {
    // force the sort-merge path — at fixture sizes the planner would
    // otherwise broadcast, which hides whether bucketing removes the
    // shuffle (ShuffleExchangeExec renders as plain "Exchange", so the
    // assertion matches the node name Spark actually prints)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketing.revenueJoinPlan(spark, Sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"expected exchange-free bucketed plan, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("bucketed revenue equals the plain-join revenue") {
    val bucketed = Bucketing.bucketedOrderRevenue(spark, Sf)
    val plain = sources.Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey")
      .join(sources.Tables.lineitem(spark, Sf)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_custkey"))
      .agg(sum(expr(
        """CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)
           * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"""))
        .as("revenue_1e4"))
      .orderBy(col("o_orderkey"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }
}
