package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r16): A/B of AQE's coalescePartitions.minPartitionSize.
  * parallelismFirst coalescing (default) targets all cores but is
  * FLOORED by minPartitionSize (1MB default) — byte-small intermediate
  * frames (candidate pairs, node tables) collapse to 1-5 read tasks and
  * CPU-bound downstream work serializes (the repeated §2.5 signature
  * this round's per-site width pins each fixed by hand). A smaller
  * floor lets AQE itself keep the width. usage:
  *   MinPartProbe <sfDir> <minPartitionSize|default> <query...>
  */
object MinPartProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mps = if (args.length > 1) args(1) else "default"
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q_dedup_prefix_filter", "q_bitext_margin_index",
        "q_semantic_dedup", "q_hybrid_search")
    val b0 = graft.GraftSession.shuffleTuning(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false"))
    val b = if (mps == "default") b0
      else b0.config("spark.sql.adaptive.coalescePartitions.minPartitionSize", mps)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; trial <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] mps=$mps $name trial $trial: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
