package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.sources.Tables

/** Dev harness for the SQL front door: for every SparkEntry query, try
  * running its DuckDB oracle SQL through spark.sql over the registered
  * views and report whether it (a) parses+runs and (b) matches the
  * DataFrame operator result. PORTABLE means the oracle text itself is
  * the Spark SQL twin; names that print SQL_FAIL or MISMATCH need a
  * hand-written Spark-dialect twin (or an explicit API-only exemption)
  * in graft.SqlFrontDoor.
  */
object SqlTwinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.oracleSql.get(name) match {
        case None => println(s"NO_ORACLE $name")
        case Some(sql) =>
          try {
            val viaSql = spark.sql(sql)
            val df = SparkEntry.queries(name)(spark, sfDir)
            // full schema (name + type): a type-only mismatch would make
            // exceptAll throw and be mislabeled SQL_FAIL
            val sqlSchema = viaSql.schema.map(f => (f.name, f.dataType))
            val dfSchema = df.schema.map(f => (f.name, f.dataType))
            if (sqlSchema != dfSchema)
              println(s"MISMATCH $name schema ${sqlSchema.mkString(",")} vs ${dfSchema.mkString(",")}")
            else if (viaSql.exceptAll(df).isEmpty && df.exceptAll(viaSql).isEmpty)
              println(s"PORTABLE $name")
            else println(s"MISMATCH $name values differ")
          } catch {
            case e: Throwable =>
              val msg = Option(e.getMessage).getOrElse(e.toString)
                .linesIterator.find(_.trim.nonEmpty).getOrElse("")
              println(s"SQL_FAIL $name :: ${msg.take(160)}")
          }
      }
    }
    spark.stop()
  }
}
