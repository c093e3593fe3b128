package graft.tools

import graft.GraftSession
import graft.sources.XlsSource

/** Debug utility: dump schema + stats of an XLS file through XlsSource. */
object XlsProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      "/root/reference/data/traffic_spreadsheet.xls")
    val spark = GraftSession.builder("xls-probe", "local[2]", 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = XlsSource.read(spark, path)
    df.printSchema()
    println(s"rows = ${df.count()}")
    df.show(5, truncate = false)
    df.summary("min", "max", "mean").show(truncate = false)
    spark.stop()
  }
}
