package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate surface (HLL count-distinct, quantile sketches):
  * sketch layouts differ between engines, so these are checked against the
  * exact answers rather than a DuckDB oracle.
  */
class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct within 5% of exact") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val ord = spark.read.parquet(s"$Sf/orders.parquet")
    val row = ord.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
      min("o_totalprice"), max("o_totalprice")).head()
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    val span = row.getDouble(3) - row.getDouble(2)
    assert(math.abs(approx - exact) <= span * 0.02,
      s"approx=$approx exact=$exact span=$span")
  }
}
