package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): pagerank cost breakdown under the tuned shuffle
  * config — build vs loop, and the candidate loop shapes:
  *   A shipping: broadcast rounds + localCheckpoint every 2
  *   B broadcast rounds, unrolled, no checkpoints, ONE action
  *   C co-partitioned SHJ rounds, unrolled, ONE action (edges carry wsum)
  *   D co-partitioned SHJ rounds, unrolled, wsum re-attached to the RANK
  *     side per round from one reused broadcast (edges stay 3 columns —
  *     no withW build pass at all)
  */
object PagerankStageProbe {
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

    def time(tag: String, n: Int = 3)(f: => Unit): Unit =
      for (t <- 1 to n) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] $tag trial $t: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }

    time("BUILD copurchaseEdges (ckpt materialize)", 2) {
      Mining.copurchaseEdges(spark, dir, 8)
        .write.format("noop").mode("overwrite").save()
    }
    val raw = Mining.copurchaseEdges(spark, dir, 8)
    time("BUILD rest: wsum join + persist + counts", 1) {
      val withW = raw.join(
        broadcast(raw.groupBy(col("src")).agg(sum(col("w")).as("wsum"))),
        Seq("src"))
      val e = withW.persist()
      val nodes = e.select(col("src").as("node")).distinct().persist()
      nodes.count()
      ()
    }
    val withW = raw.join(
      broadcast(raw.groupBy(col("src")).agg(sum(col("w")).as("wsum"))),
      Seq("src"))
    val edges = withW.persist()
    edges.count()
    val nodes = edges.select(col("src").as("node")).distinct().persist()
    val n = nodes.count()
    val base = 150000000L / n
    val ranks0 = nodes.withColumn("pr", lit(1000000000L / n))
      .localCheckpoint(true)

    time("A shipping loop (bcast + ckpt/2)") {
      var r = ranks0
      (1 to 10).foreach { i =>
        r = Mining.rankRound(edges, r, base, Mining.BroadcastRanks)
        if (i % 2 == 0 || i == 10) r = r.localCheckpoint(true)
      }
      r.write.format("noop").mode("overwrite").save()
    }
    time("B bcast unrolled, no ckpt") {
      var r = ranks0
      (1 to 10).foreach { _ =>
        r = Mining.rankRound(edges, r, base, Mining.BroadcastRanks)
      }
      r.write.format("noop").mode("overwrite").save()
    }
    val edgesP = withW.repartition(col("src")).persist()
    edgesP.count()
    time("C copart SHJ unrolled (edges carry wsum)") {
      var r = ranks0
      (1 to 10).foreach { _ =>
        r = Mining.rankRound(edgesP, r, base, Mining.CoPartitionedRanks)
      }
      r.write.format("noop").mode("overwrite").save()
    }
    // D: 3-col edges, wsum rides the rank frame, broadcast reused per round
    val edges3 = raw.repartition(col("src")).persist()
    edges3.count()
    val wsumf = raw.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
      .withColumnRenamed("src", "node")
      .localCheckpoint(true)
    time("D copart SHJ unrolled, wsum on ranks") {
      var r = wsumf.select(col("node"), lit(1000000000L / n).as("pr"),
        col("wsum"))
      (1 to 10).foreach { _ =>
        val j = edges3.join(r.hint("shuffle_hash"),
          edges3("src") === r("node"))
          .select(col("dst"), expr("(pr * w) DIV wsum").as("contrib"))
          .groupBy(col("dst"))
          .agg((lit(base) + expr("(85 * sum(contrib)) DIV 100")).as("pr"))
          .withColumnRenamed("dst", "node")
        r = j.join(broadcast(wsumf.withColumnRenamed("node", "n2")),
          j("node") === col("n2"))
          .select(col("node"), col("pr"), col("wsum"))
      }
      r.select(col("node"), col("pr"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
