package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): platform floor for a 2.1M-row / 20k-group shuffle
  * aggregate on this box — synthetic range input, no cache, no join.
  */
object AggFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit =
      for (t <- 1 to 4) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] $tag trial $t: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    val df = spark.range(0, 2100000, 1, 32)
      .select((col("id") % 20000).as("dst"), (col("id") % 7 + 1).as("w"))
      .localCheckpoint(true)
    time("synthetic 2.1M/20k-group sum") {
      df.groupBy("dst").agg(sum("w")).write.format("noop").mode("overwrite").save()
    }
    time("synthetic scan only") {
      df.write.format("noop").mode("overwrite").save()
    }
    val df8 = spark.range(0, 2100000, 1, 8)
      .select((col("id") % 20000).as("dst"), (col("id") % 7 + 1).as("w"))
      .localCheckpoint(true)
    time("same but 8 input partitions") {
      df8.groupBy("dst").agg(sum("w")).write.format("noop").mode("overwrite").save()
    }
    val dfFew = spark.range(0, 2100000, 1, 32)
      .select((col("id") % 64).as("dst"), (col("id") % 7 + 1).as("w"))
      .localCheckpoint(true)
    time("32 partitions, 64 groups") {
      dfFew.groupBy("dst").agg(sum("w")).write.format("noop").mode("overwrite").save()
    }
    time("32 partitions, pure repartition (no agg)") {
      df.repartition(32, col("dst")).write.format("noop").mode("overwrite").save()
    }
    if (args.contains("--spin")) {
      println("[probe] spinning 32-task agg for profiling; kill when done")
      for (_ <- 1 to 300)
        df.groupBy("dst").agg(sum("w")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

/** Same synthetic agg under different page-size / shuffle configs — run
  * as separate JVMs since pageSize is read at startup.
  */
object AggFloorProbe2 {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("base")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val b2 = variant match {
      case "nobypass" => b.config("spark.shuffle.sort.bypassMergeThreshold", "0")
      case "shm"      => b.config("spark.local.dir", "/dev/shm/graft-probe")
      case "both"     => b.config("spark.shuffle.sort.bypassMergeThreshold", "0")
                          .config("spark.local.dir", "/dev/shm/graft-probe")
      case "nocomp"   => b.config("spark.shuffle.sort.bypassMergeThreshold", "0")
                          .config("spark.local.dir", "/dev/shm/graft-probe")
                          .config("spark.shuffle.compress", "false")
      case "nosum"    => b.config("spark.shuffle.sort.bypassMergeThreshold", "0")
                          .config("spark.local.dir", "/dev/shm/graft-probe")
                          .config("spark.shuffle.checksum.enabled", "false")
      case "all4"     => b.config("spark.shuffle.sort.bypassMergeThreshold", "0")
                          .config("spark.local.dir", "/dev/shm/graft-probe")
                          .config("spark.shuffle.compress", "false")
                          .config("spark.shuffle.checksum.enabled", "false")
      case _          => b
    }
    val spark = b2.getOrCreate()
    val tag = variant
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit =
      for (t <- 1 to 4) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] $tag trial $t: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    val df = spark.range(0, 2100000, 1, 32)
      .select((col("id") % 20000).as("dst"), (col("id") % 7 + 1).as("w"))
      .localCheckpoint(true)
    time(s"variant=$tag 32-task 20k-group sum") {
      df.groupBy("dst").agg(sum("w")).write.format("noop").mode("overwrite").save()
    }
    time(s"variant=$tag 32-task pure repartition") {
      df.repartition(32, col("dst")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
