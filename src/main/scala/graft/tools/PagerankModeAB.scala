package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r16): FULL-QUERY A/B of pagerankCopurchase's two
  * RankJoinModes under the bench regime — noop sink, unpersist between
  * trials, tuned shuffle config — because the loop-only probe
  * (PagerankStageProbe) showed copart winning the LOOP (1.56s vs 2.41s)
  * while the whole-query bench showed the opposite; the build is where
  * they must differ. usage: PagerankModeAB [sfDir]
  */
object PagerankModeAB {
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
    import graft.operators.Mining
    def run(tag: String, mode: Mining.RankJoinMode): Unit =
      for (t <- 1 to 3) {
        val t0 = System.nanoTime()
        Mining.pagerankCopurchase(spark, dir, 8, 10, mode)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] $tag trial $t: ${(System.nanoTime() - t0) / 1e9}%.3fs")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    // interleave so a host stall cannot eat one arm
    run("copart", Mining.CoPartitionedRanks)
    run("bcast ", Mining.BroadcastRanks)
    run("copart", Mining.CoPartitionedRanks)
    run("bcast ", Mining.BroadcastRanks)
    spark.stop()
  }
}
