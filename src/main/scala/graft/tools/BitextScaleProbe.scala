package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Measures the bitext-mining scale story empirically: the brute
  * operator vs the IVF-candidate face at a given fixture size — the
  * evidence row behind SCALE.md's "the from-index face is the
  * warehouse path" claim. Usage:
  *   runMain graft.tools.BitextScaleProbe <sfDir> [nLists] [nProbe]
  */
object BitextScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nLists = args.lift(1).map(_.toInt).getOrElse(64)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bitext-probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val idx = java.nio.file.Files
      .createTempDirectory("bitext_probe_idx").toString
    time(s"buildIvfIndex nLists=$nLists") {
      Similarity.buildIvfIndex(spark, sfDir, idx, nLists = nLists)
    }
    val nIdx = time(s"fromIndex nProbe=$nProbe") {
      Similarity.bitextMarginFromIndex(spark, sfDir, idx,
        nLists = nLists, nProbe = nProbe).count()
    }
    val nBrute = time("brute") {
      Similarity.bitextMarginMine(spark, sfDir).count()
    }
    println(s"[bitext-probe] mined: fromIndex=$nIdx brute=$nBrute " +
      f"(coverage ${nIdx * 100.0 / nBrute}%.1f%%)")
    spark.stop()
  }
}
