package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage timing for triangleCount at a given SF — incidence,
  * edge materialization, orientation, wedge+closing join.
  */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val incidence = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    val ok = incidence.groupBy(col("basket"))
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") <= 40)
      .select("basket")
    val kept = incidence.join(ok, Seq("basket"))
    val edges = timed("edges_build") {
      kept.as("a").join(kept.as("b"),
          col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
        .select(col("a.item").as("u"), col("b.item").as("v"))
        .distinct()
        .localCheckpoint(true)
    }
    println("[probe] edges: " + timed("edges_count")(edges.count()))
    val deg = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = timed("orient_build") {
      edges
        .join(deg.toDF("u", "deg_u"), Seq("u"))
        .join(deg.toDF("v", "deg_v"), Seq("v"))
        .select(
          when(col("deg_u") < col("deg_v") ||
               (col("deg_u") === col("deg_v") && col("u") < col("v")),
            col("u")).otherwise(col("v")).as("src"),
          when(col("deg_u") < col("deg_v") ||
               (col("deg_u") === col("deg_v") && col("u") < col("v")),
            col("v")).otherwise(col("u")).as("dst"))
        .localCheckpoint(true)
    }
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("a"),
        col("e1.dst").as("b"), col("e2.dst").as("c"))
    println("[probe] wedge count: " + timed("wedge_count")(wedges.count()))
    val tri = wedges.join(edges,
        edges("u") === least(col("b"), col("c")) &&
        edges("v") === greatest(col("b"), col("c")))
      .select(col("a"), col("b"), col("c"))
    println("[probe] tri count: " + timed("tri_count")(tri.count()))
    spark.stop()
  }
}
