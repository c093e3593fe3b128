package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewUtils

class SkewUtilsSpec extends SparkTestBase {

  test("saltedJoin result equals plain join (inner)") {
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$Sf/customer.parquet")
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "o_custkey", "c_name")
    val salted = SkewUtils.saltedJoin(orders, customer, "o_custkey", salts = 4)
      .select("o_orderkey", "o_custkey", "c_name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    import spark.implicits._
    // one hot key with 1000 rows + small right side
    val left = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val right = Seq((42L, "hot")).toDF("k", "name")
    val out = SkewUtils.saltedJoin(left, right, "k", salts = 8)
    assert(out.count() == 1000)
    // salts actually distribute: hash-of-row salt should hit several buckets
    val distinctSalts = left
      .withColumn("s", pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .select("s").distinct().count()
    assert(distinctSalts >= 4)
  }
}
