package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: dumps the formatted physical plan of every SparkEntry
  * query and flags scale smells — missing filter pushdown, wide scans,
  * cartesian products, missing broadcasts, shuffle counts. Run with the
  * sf dir as arg; writes plans to /tmp/graft_plans/<name>.txt and prints
  * a one-line summary per query.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File("/tmp/graft_plans").mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/graft_plans/$name.txt"), plan)
        val shuffles = "Exchange".r.findAllIn(plan).length
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
        val smj = "SortMergeJoin".r.findAllIn(plan).length
        val nlj = "NestedLoop".r.findAllIn(plan).length
        val scans = "Scan parquet".r.findAllIn(plan).length
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
        // NOTE: no codegen-span metric — under AQE the pre-execution
        // formatted plan carries no WholeStageCodegen wrappers (codegen is
        // applied as stages materialize), so counting here would always
        // read 0 and mislead
        println(s"[plan] $name: scans=$scans pushedFilterScans=$pushed " +
          s"shuffles=$shuffles bhj=$bhj smj=$smj nlj=$nlj")
      } catch { case e: Throwable =>
        println(s"[plan] $name: ERROR ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
