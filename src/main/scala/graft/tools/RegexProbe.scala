package graft.tools

import org.apache.spark.sql.SparkSession

object RegexProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    def timed[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm scan
    timed("split")(docs
      .selectExpr("size(split(trim(text), '\\\\s+')) AS n").agg(org.apache.spark.sql.functions.sum("n")).head())
    timed("rea_100rows")(docs.limit(100)
      .selectExpr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS n")
      .agg(org.apache.spark.sql.functions.sum("n")).head())
    timed("rea_all")(docs
      .selectExpr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS n")
      .agg(org.apache.spark.sql.functions.sum("n")).head())
    timed("rea_all_warm")(docs
      .selectExpr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS n")
      .agg(org.apache.spark.sql.functions.sum("n")).head())
    // pure JVM regex over the same data, driver-side
    val texts = docs.select("text").collect().map(_.getString(0))
    timed("jvm_regex") {
      val p = java.util.regex.Pattern.compile("[a-z0-9]+")
      var n = 0
      texts.foreach { t =>
        val m = p.matcher(t.toLowerCase)
        while (m.find()) n += 1
      }
      n
    }
    spark.stop()
  }
}
