package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: warm A/B of the two [[graft.operators.Mining.RankJoinMode]]
  * strategies at a given SF — the measurement behind the crossover
  * guidance on the mode trait. Expect broadcast to win wherever the rank
  * table broadcasts comfortably (it also skips the per-round rank
  * exchange); the co-partitioned mode's value is the regime this box
  * cannot host (rank tables past executor memory), so the number to
  * read here is "how much does the insurance cost at catalog scale",
  * not "which is faster".
  */
object PagerankModeProbe {
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
    for (mode <- Seq(Mining.BroadcastRanks, Mining.CoPartitionedRanks);
         trial <- 1 to 3) {
      val t0 = System.nanoTime()
      Mining.pagerankCopurchase(spark, dir, maxItems = 8, iters = 10,
        mode = mode)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] pagerank mode=$mode trial $trial: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
