package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scaler: synthesizes an f-times-larger scale
  * factor from an existing driver fixture (TESTDATA.md tables) as f
  * DISJOINT ISOMETRIC REPLICAS — the honest way to grow a benchmark
  * corpus without changing the workload's per-decade shape:
  *
  *  - every table's dense 0-based keys shift by `copy * tableSize`, so
  *    the star-schema relationships (order->customer, lineitem->part/
  *    supplier, event->user) replicate with identical fan-outs, skew
  *    profiles, and join selectivities — copy k is the same graph as
  *    copy 0, relabeled;
  *  - document TEXT is Caesar-rotated per copy (letters+digits, 1:1 so
  *    lengths and n_chars stay exact): token shapes, Zipf profile, and
  *    within-copy duplicate structure are preserved, while vocabularies
  *    are disjoint ACROSS copies — so dedup/search workloads scale as
  *    "10x more corpus at the same dup rate", not as a pathological
  *    everything-matches-everything blowup;
  *  - EMBEDDINGS cyclically shift coordinates per copy: a coordinate
  *    permutation is an isometry (norms and within-copy dot products
  *    bit-preserved), while cross-copy cosines of the zero-centered
  *    vectors land near 0 — again 10x corpus, same similarity structure;
  *  - region/nation are catalog dims and copy verbatim; sources, langs,
  *    brands, event types, and the event-time window deliberately do NOT
  *    grow (10x density in the same domains — how real feeds scale).
  *
  * No RNG anywhere: same input + factor => bit-identical output.
  *
  * Usage: runMain graft.tools.FixtureScale <srcDir> <dstDir> [factor=10]
  */
object FixtureScale {

  private val Letters = "abcdefghijklmnopqrstuvwxyz"
  private val Digits = "0123456789"
  private val Base = Letters + Letters.toUpperCase + Digits

  /** The copy-k Caesar alphabet: letters rotate by k within a-z (case
    * preserved), digits rotate by k within 0-9.
    */
  private def rotated(k: Int): String = {
    def rot(s: String, by: Int) = {
      val n = s.length
      (0 until n).map(i => s((i + by) % n)).mkString
    }
    rot(Letters, k % 26) + rot(Letters.toUpperCase, k % 26) + rot(Digits, k % 10)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FixtureScale <srcDir> <dstDir> [factor]")
    val src = args(0)
    val dst = args(1)
    val f = if (args.length > 2) args(2).toInt else 10
    require(f >= 1 && f <= 100, "factor in [1, 100]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("fixture-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // catalog dims: verbatim
    for (t <- Seq("region", "nation")) write(read(t), t)

    val nCust = span(read("customer"), "c_custkey")
    val nSupp = span(read("supplier"), "s_suppkey")
    val nPart = span(read("part"), "p_partkey")
    val nOrd = span(read("orders"), "o_orderkey")
    val nEv = span(read("events"), "event_id")
    val nUser = span(read("events"), "user_id")
    val nDoc = span(read("documents"), "doc_id")
    val nVec = span(read("embeddings"), "vec_id")
    val dims = read("embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    val shiftStep = math.max(1, dims / f)

    /** f unioned copies with per-copy column rewrites. */
    def scaled(t: String)(tx: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = read(t)
      (0 until f).map(k => tx(base, k)).reduce(_ unionByName _)
    }

    write(scaled("customer") { (d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(k * nCust))
    }, "customer")
    write(scaled("supplier") { (d, k) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(k * nSupp))
    }, "supplier")
    write(scaled("part") { (d, k) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(k * nPart))
    }, "part")
    write(scaled("orders") { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * nOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(k * nCust))
    }, "orders")
    write(scaled("lineitem") { (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k * nOrd))
        .withColumn("l_partkey", col("l_partkey") + lit(k * nPart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * nSupp))
    }, "lineitem")
    write(scaled("events") { (d, k) =>
      d.withColumn("event_id", col("event_id") + lit(k * nEv))
        .withColumn("user_id", col("user_id") + lit(k * nUser))
    }, "events")
    write(scaled("documents") { (d, k) =>
      d.withColumn("doc_id", col("doc_id") + lit(k * nDoc))
        .withColumn("text",
          if (k == 0) col("text") else translate(col("text"), Base, rotated(k)))
    }, "documents")
    write(scaled("embeddings") { (d, k) =>
      val s = (k * shiftStep) % dims
      d.withColumn("vec_id", col("vec_id") + lit(k * nVec))
        .withColumn("embedding",
          if (s == 0) col("embedding")
          else expr(s"transform(sequence(0, ${dims - 1}), i -> embedding[(i + $s) % $dims])"))
    }, "embeddings")

    // sanity: row counts scale exactly, keys stay distinct
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings")) {
      val in = read(t).count()
      val out = spark.read.parquet(s"$dst/$t.parquet").count()
      require(out == in * f, s"$t: expected ${in * f} rows, wrote $out")
    }
    val keyOf = Map("customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    for ((t, k) <- keyOf) {
      val d = spark.read.parquet(s"$dst/$t.parquet")
      require(d.select(k).distinct().count() == d.count(),
        s"$t: key $k not distinct after scaling")
    }
    println(s"scaled $src -> $dst at ${f}x")
    spark.stop()
  }
}
