package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe: isolate fixed overheads (JVM/codegen/scheduling) from real
  * query cost in this environment.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    def timed[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    timed("range_sum")(spark.range(1000000).selectExpr("sum(id)").head())
    timed("range_sum_warm")(spark.range(1000000).selectExpr("sum(id)").head())
    timed("scan_customer")(spark.read.parquet(s"$dir/customer.parquet").count())
    timed("scan_customer_warm")(spark.read.parquet(s"$dir/customer.parquet").count())
    timed("group_agg")(spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity")).collect().length)
    timed("group_agg_warm")(spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity")).collect().length)
    timed("md5_docs")(spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("md5(text) AS h").groupBy("h").count().count())
    timed("regexp_hof")(spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS n")
      .agg(sum("n")).head())
    timed("parquet_write")(spark.read.parquet(s"$dir/customer.parquet")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_out"))
    timed("parquet_write_warm")(spark.read.parquet(s"$dir/customer.parquet")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_out"))
    spark.stop()
  }
}
