package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: steady-state timing of named registry queries — N warm
  * repeats in one JVM, noop-sink materialization (the bench's measure).
  * usage: OpTimeProbe <sfDir> <query> [query...]
  */
object OpTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_dedup_prefix_filter")
    val spark = graft.GraftSession.shuffleTuning(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; trial <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $name trial $trial: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      // match the bench regime: drop checkpoint/persist debt between trials
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
