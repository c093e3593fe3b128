package graft.tools

import graft.{GraftSession, SparkEntry}

/** Executed-plan scan audit over the query registry: counts `Scan
  * parquet` nodes and `CartesianProduct` nodes in each query's FINAL
  * executed plan at sf0.001. The tool that caught q_triangle_count
  * re-deriving its incidence subtree per consumer branch (134 fact-table
  * scans before the edges frame was pinned — r9).
  *
  * Reading the numbers: queries over `Tables.spread` tables deliberately
  * split the scan into multiple range nodes (compute/scan parallelism
  * decoupling), so the interesting signal is GROWTH — a query whose scan
  * count jumps after a refactor re-derives some shared frame per branch
  * and needs the localCheckpoint pin (SCALE.md, "Materialized shared
  * frames"). Cartesian count should be zero everywhere, always.
  *
  * Usage: `runMain graft.tools.ScanAudit [substring ...]` — with args,
  * audits only queries whose name contains one of the substrings.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("scan-audit")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val wanted: String => Boolean =
      if (args.isEmpty) _ => true
      else name => args.exists(name.contains)
    var worst = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sf)
          df.write.format("noop").mode("overwrite").save()
          val plan = df.queryExecution.executedPlan.toString
          val scans = "Scan parquet".r.findAllIn(plan).length
          val cart = "CartesianProduct".r.findAllIn(plan).length
          worst = math.max(worst, scans)
          println(f"AUDIT $name%-32s scans=$scans%-3d cartesian=$cart")
          if (cart > 0)
            println(s"AUDIT-CARTESIAN $name — this is always a bug")
        } catch {
          case e: Throwable =>
            println(s"AUDIT-ERROR $name: ${e.getMessage}")
        }
      }
    println(s"AUDIT-MAX scans=$worst")
    spark.stop()
  }
}
