package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the exact prefixFilterJaccard pipeline with per-stage
  * timing, run twice in one JVM so pass 2 is steady-state.
  */
object PrefixStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t1e4 = 5000L
    for (pass <- 1 to 2) {
      def timed[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe] pass$pass $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      val docs = timed("docs_ckpt") {
        graft.operators.Dedup.withShingles(spark, dir)
          .select(col("doc_id"), col("sh"),
            expr("CAST(size(sh) AS BIGINT)").as("n"))
          .localCheckpoint(true)
      }
      val ex = docs.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
      val dfreq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
      val prefix = timed("prefix_ckpt") {
        ex.join(dfreq, Seq("shingle"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("alpha", expr(s"((2 * $t1e4 - 1) * n + 19999) DIV 20000"))
          .filter(col("rk") <= col("n") - col("alpha") + 1)
          .select(col("doc_id"), col("shingle"), col("n"))
          .localCheckpoint(true)
      }
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .filter(expr(s"""least(a.n, b.n) >=
          ((2 * $t1e4 - 1) * greatest(a.n, b.n) + 19999) DIV 20000"""))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val out = cands
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
          col("n").as("na")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
          col("n").as("nb")), Seq("doc_b"))
        .withColumn("common",
          expr("CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT)"))
        .withColumn("jaccard_1e4", expr(
          "(20000 * common + (na + nb - common)) DIV (2 * (na + nb - common))"))
        .filter(col("jaccard_1e4") >= t1e4)
        .select(col("doc_a"), col("doc_b"), col("jaccard_1e4"))
        .orderBy(col("doc_a"), col("doc_b"))
      timed("cands_plus_verify") {
        out.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
