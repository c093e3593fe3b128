package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: executed plan of the prefix-filter verify stage. */
object PrefixExplainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.Dedup.prefixFilterJaccard(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println("==== executed plan after AQE ====")
    println(df.queryExecution.executedPlan.toString.take(12000))
  }
}
