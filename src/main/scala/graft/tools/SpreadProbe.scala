package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): cost of the spreadForCompute round-robin exchange vs
  * alternatives — plain narrow scan, and widening the SCAN itself with a
  * smaller spark.sql.files.maxPartitionBytes (no shuffle, no
  * sortBeforeRepartition of text rows). Two representative downstreams:
  * the gram explode (compute-bound per row) and the basket collect_set
  * aggregate (shuffle-first, where the spread exchange is redundant).
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.shuffleTuning(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.sources.Tables

    def time(tag: String)(f: => Unit): Unit =
      for (t <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] $tag trial $t: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    def gramsOf(df: org.apache.spark.sql.DataFrame): Unit =
      Dedup.gramRows(df, 16).write.format("noop").mode("overwrite").save()
    def basketsOf(df: org.apache.spark.sql.DataFrame): Unit = df
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("its"))
      .write.format("noop").mode("overwrite").save()

    time("grams: spread (RR exchange)") {
      gramsOf(Tables.spread(spark, dir, "documents"))
    }
    time("grams: plain scan") {
      gramsOf(Tables.load(spark, dir, "documents"))
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    time("grams: plain scan, 1m splits") {
      gramsOf(Tables.load(spark, dir, "documents"))
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728b")

    time("baskets: spread (RR exchange)") {
      basketsOf(Tables.spread(spark, dir, "lineitem"))
    }
    time("baskets: plain scan") {
      basketsOf(Tables.load(spark, dir, "lineitem"))
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    time("baskets: plain scan, 1m splits") {
      basketsOf(Tables.load(spark, dir, "lineitem"))
    }
    println("[probe] doc file bytes: " + new java.io.File(s"$dir/documents.parquet").length
      + ", lineitem: " + new java.io.File(s"$dir/lineitem.parquet").length)
    spark.stop()
  }
}
