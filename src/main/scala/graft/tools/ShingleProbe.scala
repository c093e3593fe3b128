package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: isolate the slow step inside the shingling pipeline. */
object ShingleProbe {
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
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    timed("scan_count")(raw.count())
    timed("scan_count_warm")(raw.count())
    val toks = raw.withColumn("ws", expr(graft.operators.TextAnalysis.TokensExpr))
    timed("tokenize")(toks.select(sum(size(col("ws")))).head())
    timed("tokenize_warm")(toks.select(sum(size(col("ws")))).head())
    val sh = toks.filter(expr("size(ws) >= 3"))
      .withColumn("sh", expr(graft.operators.Dedup.ShinglesExpr))
    timed("shingle")(sh.select(sum(size(col("sh")))).head())
    timed("shingle_warm")(sh.select(sum(size(col("sh")))).head())
    val spreadDf = graft.sources.Tables.spread(spark, dir, "documents")
      .withColumn("ws", expr(graft.operators.TextAnalysis.TokensExpr))
      .filter(expr("size(ws) >= 3"))
      .withColumn("sh", expr(graft.operators.Dedup.ShinglesExpr))
    timed("spread_shingle")(spreadDf.select(sum(size(col("sh")))).head())
    timed("spread_shingle_warm")(spreadDf.select(sum(size(col("sh")))).head())
    timed("checkpoint")(spreadDf
      .select(col("doc_id"), col("sh"), expr("CAST(size(sh) AS BIGINT)").as("n"))
      .localCheckpoint(true).count())
    spark.stop()
  }
}
