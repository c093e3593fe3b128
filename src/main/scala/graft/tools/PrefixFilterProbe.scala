package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does prefixFilterJaccard's time go at a given SF —
  * prefix build, candidate generation, or the exact verify join? Also
  * counts candidates with and without the AllPairs length filter to
  * size that optimization before committing to it.
  */
object PrefixFilterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val t1e4 = 5000L
    val docs = timed("docs_checkpoint") {
      graft.operators.Dedup.withShingles(spark, dir)
        .select(col("doc_id"), col("sh"), expr("CAST(size(sh) AS BIGINT)").as("n"))
        .localCheckpoint(true)
    }
    println("[probe] docs: " + timed("count_docs")(docs.count()))
    println("[probe] avg shingles/doc: " + docs.agg(avg(col("n"))).head().getDouble(0))
    val ex = docs.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
    val dfreq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefix = timed("prefix_build") {
      ex.join(dfreq, Seq("shingle"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("alpha", expr(s"((2 * $t1e4 - 1) * n + 19999) DIV 20000"))
        .filter(col("rk") <= col("n") - col("alpha") + 1)
        .select(col("doc_id"), col("shingle"), col("n"))
        .localCheckpoint(true)
    }
    println("[probe] prefix rows: " + timed("count_prefix")(prefix.count()))
    val candsRaw = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
    println("[probe] raw candidate pairs (pre-distinct): " +
      timed("count_cands_raw")(candsRaw.count()))
    println("[probe] distinct candidates, no length filter: " +
      timed("count_cands_distinct")(
        candsRaw.select("doc_a", "doc_b").distinct().count()))
    // AllPairs length filter: min(na,nb) >= alpha(max(na,nb)) — the same
    // half-up bound as the prefix size (see prefixFilterJaccard notes)
    val candsLen = candsRaw.filter(
      expr(s"least(na, nb) >= ((2 * $t1e4 - 1) * greatest(na, nb) + 19999) DIV 20000"))
    val cands = candsLen.select("doc_a", "doc_b").distinct()
      .localCheckpoint(true)
    println("[probe] distinct candidates, WITH length filter: " +
      timed("count_cands_len")(cands.count()))
    // r14 two-tier verify: summary pre-verify at candidate volume, exact
    // array_intersect only on its survivors (the production spelling).
    graft.functions.GraftFunctions.register(spark)
    val B = graft.operators.Dedup.SummaryBuckets
    val sums = timed("summaries_build") {
      graft.operators.Dedup.withShingles(spark, dir)
        .select(col("doc_id"), expr("CAST(size(sh) AS BIGINT)").as("n"),
          expr(s"jacc_summary(sh, $B)").as("sm"))
        .localCheckpoint(true)
    }
    val pre = timed("pre_verify_minsum") {
      cands.repartition(spark.sparkContext.defaultParallelism, col("doc_a"))
        .join(sums.select(col("doc_id").as("doc_a"), col("n").as("na"),
          col("sm").as("sm_a")), Seq("doc_a"))
        .join(sums.select(col("doc_id").as("doc_b"), col("n").as("nb"),
          col("sm").as("sm_b")), Seq("doc_b"))
        .filter(expr(s"""sm_a IS NULL OR sm_b IS NULL OR least(na, nb) >= 255
          OR CAST(minsum_b(sm_a, sm_b) AS BIGINT) * (19999 + 2 * $t1e4)
             >= (2 * $t1e4 - 1) * (na + nb)"""))
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
    }
    println("[probe] pre-verify survivors: " + pre.count())
    val verified2 = pre
      .repartition(spark.sparkContext.defaultParallelism, col("doc_a"))
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("n").as("na")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("n").as("nb")), Seq("doc_b"))
      .withColumn("common",
        expr("CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT)"))
      .withColumn("jaccard_1e4", expr(
        "(20000 * common + (na + nb - common)) DIV (2 * (na + nb - common))"))
      .filter(col("jaccard_1e4") >= t1e4)
    println("[probe] verified pairs (two-tier): " +
      timed("verify_exact_on_survivors")(verified2.count()))
    // the retired one-tier spelling, for A/B stage timing on demand
    if (args.contains("--with-old-verify")) {
      val verified = cands
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
          col("n").as("na")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
          col("n").as("nb")), Seq("doc_b"))
        .withColumn("common",
          expr("CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT)"))
        .withColumn("jaccard_1e4", expr(
          "(20000 * common + (na + nb - common)) DIV (2 * (na + nb - common))"))
        .filter(col("jaccard_1e4") >= t1e4)
      println("[probe] verified pairs (one-tier OLD): " +
        timed("verify_join_old_full_arrays")(verified.count()))
    }
    spark.stop()
  }
}
