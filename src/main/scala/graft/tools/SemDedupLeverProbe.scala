package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the semanticDedup scale lever: time the operator at a
  * fixed corpus across a sweep of nLists values. SCALE.md's claim is
  * that within-cluster pair work is O(n²/nLists), so nLists ∝ corpus
  * keeps the operator linear — this probe measures the trade directly
  * (training/assignment cost rises ~linearly in nLists while the pair
  * term falls ~linearly; the optimum moves right as the corpus grows).
  * usage: SemDedupLeverProbe <sfDir> [nLists...]
  */
object SemDedupLeverProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val sweep = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
    else Seq(16, 64, 160)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (nLists <- sweep; trial <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.operators.Similarity.semanticDedup(spark, dir, nLists = nLists)
        .write.format("noop").mode("overwrite").save()
      println(f"[lever] nLists=$nLists trial $trial: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
