package graft.tools

/** Dev harness: dump every SparkEntry oracle's SQL text to one file per
  * query (no Spark session), for studying dialect gaps when authoring
  * SqlFrontDoor twins.
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracles")
    new java.io.File(out).mkdirs()
    graft.SparkEntry.oracleSql.foreach { case (k, v) =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/$k.sql"), v)
    }
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle files to $out")
  }
}
