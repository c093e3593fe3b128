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

  /** events.parquet has shipped with three physical encodings of `ts`
    * across fixture generations: TIMESTAMP(NANOS) (surfaced as BIGINT via
    * the nanosAsLong legacy conf, which Spark's vectorized reader needs to
    * accept nanos at all), TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (surfaced as TIMESTAMP_NTZ), and plain session-zoned TIMESTAMP.
    * Dispatch on the LOADED schema rather than hard-coding one encoding —
    * all three normalize to microsecond TimestampType with identical UTC
    * instants (sessions run with spark.sql.session.timeZone=UTC), which is
    * exactly what DuckDB sees reading the same file, so oracle comparisons
    * agree regardless of fixture vintage.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, dir, "events")
    df.schema("ts").dataType match {
      // A bare BIGINT ts could be a nanos vintage (nanosAsLong) OR a future
      // vintage storing plain epoch micros. Magnitude disambiguates per row:
      // 1e17 nanos = 1973-03-03 while 1e17 micros = year 5138, so any
      // instant in (1973, 5138) lands on the right side of the threshold —
      // far wider than the 1990-2100 sanity band EventsSchemaSpec pins.
      case LongType         => df.withColumn("ts", expr(
        "timestamp_micros(CASE WHEN abs(ts) >= 100000000000000000 THEN ts div 1000 ELSE ts END)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  /** Decouples COMPUTE parallelism from SCAN parallelism for compute-bound
    * per-row pipelines (shingling + hashing, vector math, payload decode).
    *
    * Scan task count is bounded by file splits — a table that is physically
    * few files / few row groups decodes in few tasks, and everything
    * downstream of it (md5 over every shingle, dot products over every
    * embedding) inherits that ceiling until the first shuffle. For
    * compute-heavy operators that is the difference between 1 busy core and
    * the whole cluster.
    *
    * The repartition is CONDITIONAL on the scan being too small to fill the
    * cluster on its own (bytes < cores x maxPartitionBytes): exactly the
    * regime where the extra round-robin shuffle is cheap (it moves less
    * than one scan-split per core). At warehouse scale the same table spans
    * thousands of splits, the condition is false, and this is an identity —
    * so operators can call it unconditionally.
    */
  def spreadForCompute(df: DataFrame, files: Seq[String] = Nil): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val cores = sc.defaultParallelism
    // JavaUtils understands Spark byte strings ("128m", "1g") — a naive
    // digit-strip would read "256m" as 256 bytes and silently disable the
    // spread everywhere
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    // Hadoop FS, not java.io — works for any scheme the scan itself reads
    val hconf = sc.hadoopConfiguration
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum
    if (files.nonEmpty && bytes >= cores * maxSplit) df
    else df.repartition(cores)
  }

  /** spreadForCompute keyed off the table's backing file. */
  def spread(s: SparkSession, dir: String, name: String): DataFrame =
    spreadForCompute(load(s, dir, name), Seq(s"$dir/$name.parquet"))

  /** Register all tables as temp views (for spark.sql callers). Events
    * goes through [[events]] so SQL callers see the same micro-truncated
    * TimestampType `ts` the operators (and DuckDB) see — the raw view
    * would expose nanos-as-BIGINT.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
