package graft.tools

import graft.functions.GraftFunctions

object DotFProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    println("[probe] good: " + spark.sql(
      "SELECT dot_f(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(2 AS FLOAT), CAST(2 AS FLOAT)))")
      .head().getDouble(0))
    try spark.sql("SELECT dot_f(array(1, 2), array(3, 4))").head()
    catch { case e: Exception =>
      println("[probe] wrong-type error: " + e.getMessage.linesIterator.next()) }
    try spark.sql("SELECT dot_f(array(CAST(1 AS FLOAT)))").head()
    catch { case e: Exception =>
      println("[probe] arity error: " + e.getMessage.linesIterator.next()) }
    val plan = spark.sql(
      "SELECT dot_f(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT)))")
      .queryExecution.executedPlan.toString
    println("[probe] plan contains dot_f: " + plan.contains("dot_f"))
    spark.stop()
  }
}
