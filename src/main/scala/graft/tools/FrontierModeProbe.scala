package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: warm A/B of [[graft.operators.Mining.RankJoinMode]] across
  * the three frontier loops the mode was generalized to in r15
  * (shortestPaths, bfsLevels, closenessCentrality) — the
  * PagerankModeProbe measurement extended to the rest of the iterative
  * graph family. As there, broadcast is expected to win wherever the
  * node-sized frames broadcast comfortably (it also skips the per-round
  * frontier exchange); the number to read is the co-partitioned
  * insurance premium at catalog scale, and where (if anywhere on this
  * box) the modes cross.
  */
object FrontierModeProbe {
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
    import graft.operators.Mining
    val ops: Seq[(String, Mining.RankJoinMode => Unit)] = Seq(
      "shortest_paths" -> (m => Mining.shortestPaths(spark, dir, 8, 4, 25,
        mode = m).write.format("noop").mode("overwrite").save()),
      "bfs_levels" -> (m => Mining.bfsLevels(spark, dir, maxItems = 8,
        maxHops = 4, mode = m).write.format("noop").mode("overwrite").save()),
      "closeness" -> (m => Mining.closenessCentrality(spark, dir,
        maxItems = 8, nSources = 8, maxHops = 4, mode = m)
        .write.format("noop").mode("overwrite").save()))
    for ((name, run) <- ops;
         mode <- Seq(Mining.BroadcastRanks, Mining.CoPartitionedRanks);
         trial <- 1 to 3) {
      val t0 = System.nanoTime()
      run(mode)
      println(f"[probe] $name mode=$mode trial $trial: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
