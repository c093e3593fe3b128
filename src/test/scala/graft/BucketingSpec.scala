package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** The point of bucketing is the PLAN, not the values (values are covered
  * by the q_join_bucketed_revenue oracle): co-bucketed join + same-key
  * aggregation must execute with zero shuffle exchanges.
  */
class BucketingSpec extends SparkTestBase {

  test("co-bucketed join + agg plan contains no shuffle exchange") {
    val df = Bucketing.revenueJoinPlan(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"),
      s"expected shuffle-free bucketed plan, got:\n$plan")
  }

  test("bucketed revenue equals the plain-join revenue") {
    val bucketed = Bucketing.bucketedOrderRevenue(spark, Sf)
    val plain = sources.Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey")
      .join(sources.Tables.lineitem(spark, Sf)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_custkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("o_orderkey"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }
}
