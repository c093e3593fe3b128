package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage timing AND shape COUNTS for the production
  * triangleCount pipeline (degree-ordered orientation + in-task
  * array_intersect — the edge-iterator spelling the operator actually
  * runs, not the retired wedge join). The counts verify the
  * "edges × sqrt(deg)" bound claim the SCALE row makes:
  *
  *  - `sum_intersect_mass` = Σ_edges(outdeg(u) + outdeg(v)) over the
  *    edges that actually reach the intersect (inner joins) — the real
  *    per-decade work of the closing stage;
  *  - `max/p99 outdeg` — whether degree orientation keeps the per-row
  *    array bound flat as the graph decades up (the high-degree-split
  *    lever fires only if these grow super-√);
  *  - `triangle rows` — output mass (3 rows per triangle pre-agg).
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
    val edges = timed("edges_build") {
      graft.operators.Mining.basketEdges(spark, dir, maxItems = 40)
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
    val odeg = oriented.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true)
    val st = odeg.agg(max(col("od")), expr("percentile(od, 0.99)"),
      sum(col("od")), sum(expr("od * od"))).head()
    println(s"[probe] outdeg max=${st.getLong(0)} p99=${st.getDouble(1)}" +
      s" sum=${st.getLong(2)} sum_sq=${st.getLong(3)}")
    // per-edge intersect input mass over the edges that reach the
    // intersect (both endpoints have an out-list — the operator's inner
    // joins): the closing stage's true work measure
    val mass = oriented
      .join(odeg.toDF("src", "odu"), Seq("src"))
      .join(odeg.toDF("dst", "odv"), Seq("dst"))
      .agg(count(lit(1)), sum(expr("odu + odv"))).head()
    println(s"[probe] intersect edges=${mass.getLong(0)}" +
      s" sum_intersect_mass=${mass.getLong(1)}")
    val nbrs = timed("nbrs_build") {
      oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbr"))
        .localCheckpoint(true)
    }
    val triRows = timed("intersect_join") {
      oriented
        .join(nbrs.toDF("src", "nu"), Seq("src"))
        .join(nbrs.toDF("dst", "nv"), Seq("dst"))
        .select(explode(array_intersect(col("nu"), col("nv"))).as("c"))
        .count()
    }
    println("[probe] triangle rows (1 per triangle): " + triRows)
    spark.stop()
  }
}
