package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the testdata star schema (see /root/repo/FIXTURES.md §B).
  *
  * All reads are plain parquet scans so Catalyst gets pushdown/pruning for
  * free; callers `select` only the columns they need so `ReadSchema` in the
  * physical plan stays narrow.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read nanos as long (legacy conf, set here
    * defensively for sessions we didn't build) and floor-convert to
    * microsecond TimestampType — the same truncation DuckDB applies, so
    * oracle comparisons agree.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  /** Register all tables as temp views (for spark.sql callers). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
