package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.sources.Tables
import graft.sql.SqlFrontDoor

/** Dev harness for the SQL front door: for every SparkEntry query, run its
  * Spark SQL surface (SqlFrontDoor — portable oracle text or hand-written
  * twin) and compare against the DataFrame operator result. Prints one
  * line per query: OK / MISMATCH / SQL_FAIL / NO_SQL. Optional args:
  * sfDir, then query names to restrict to.
  */
object SqlTwinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Set[String] = args.drop(1).toSet
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
      .filter(n => only.isEmpty || only(n))
    var bad = 0
    names.foreach { name =>
      SqlFrontDoor.sql(name) match {
        case None =>
          if (SqlFrontDoor.exemptions.contains(name))
            println(s"EXEMPT $name :: ${SqlFrontDoor.exemptions(name)}")
          else { bad += 1; println(s"NO_SQL $name") }
        case Some(sql) =>
          try {
            val viaSql = spark.sql(sql)
            val df = SparkEntry.queries(name)(spark, sfDir)
            // full schema (name + type): a type-only mismatch would make
            // exceptAll throw and be mislabeled SQL_FAIL
            val sqlSchema = viaSql.schema.map(f => (f.name, f.dataType))
            val dfSchema = df.schema.map(f => (f.name, f.dataType))
            if (sqlSchema != dfSchema) {
              bad += 1
              println(s"MISMATCH $name schema ${sqlSchema.mkString(",")} vs ${dfSchema.mkString(",")}")
            } else if (viaSql.exceptAll(df).isEmpty && df.exceptAll(viaSql).isEmpty)
              println(s"OK $name")
            else { bad += 1; println(s"MISMATCH $name values differ") }
          } catch {
            case e: Throwable =>
              bad += 1
              val msg = Option(e.getMessage).getOrElse(e.toString)
                .linesIterator.find(_.trim.nonEmpty).getOrElse("")
              println(s"SQL_FAIL $name :: ${msg.take(200)}")
          }
      }
    }
    println(s"front door: ${names.size} checked, $bad bad")
    spark.stop()
  }
}
