package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: dump `.explain("formatted")` for named registry queries (or
  * the full headline set) under the BENCH session conf — local[32],
  * shuffle.partitions=32, AQE on — so the committed plan artifacts in
  * the committed plans-dir artifacts match what the bench executes.
  * usage: PlanDump <sfDir> <outDir> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_plans_bench"
    val names = if (args.length > 2) args.drop(2).toSeq else graft.Bench.Headline
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$name.txt"), plan)
      val ex = "Exchange".r.findAllIn(plan).size
      val wscg = "WholeStageCodegen".r.findAllIn(plan).size
      println(s"[plandump] $name exchanges=$ex wscg=$wscg -> $out/$name.txt")
    }
    spark.stop()
  }
}
