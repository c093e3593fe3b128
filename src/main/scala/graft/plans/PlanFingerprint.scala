package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan

import graft.{Bench, SparkEntry}

/** Structural fingerprints of the benchmark queries' physical plans — the
  * bench guard's ground truth. A fingerprint is the md5 of the statically
  * planned operator tree (class names only: join algorithm, aggregate
  * kind, sorts, exchanges — no ids, paths, stats, or partition counts, so
  * it is stable across runs, core counts, and AQE runtime re-planning),
  * plus a human-readable shape summary so a changed fingerprint diffs
  * meaningfully in git.
  *
  * Purpose: the r3-r5 bench triage kept re-litigating sub-second timing
  * drift ("did the plan change or is it noise?"). With fingerprints
  * checked in (plan_fingerprints.txt), PlanFingerprintSpec answers that
  * mechanically: fingerprint unchanged -> noise, don't touch code;
  * fingerprint changed -> a code change altered the plan, intentionally
  * or not. Regenerate with `runMain graft.tools.BenchGuard --write`.
  */
object PlanFingerprint {

  /** The checked-in fingerprint file (repo root). */
  val DefaultFile = "plan_fingerprints.txt"

  /** The sf dir fingerprints are pinned at — the spec's fixture scale
    * (statistics-driven choices like broadcast-by-size depend on input
    * size, so the pin names its scale).
    */
  val PinnedSf = "/root/testdata/sf0.001"

  private def render(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
    sb.append("  " * depth).append(p.getClass.getSimpleName).append('\n')
    p.children.foreach(render(_, depth + 1, sb))
  }

  /** Operator-tree text of the FULL static physical plan: the query is
    * planned with AQE off, so EnsureRequirements' exchanges and the
    * codegen wrappers are in the tree (under AQE the pre-execution plan
    * is just an adaptive placeholder and the exchange count — the key
    * scale signal — would read zero). AQE still runs in production; the
    * static plan is its deterministic input, which is exactly what a
    * code-change fingerprint should pin.
    */
  def planTreeOf(spark: SparkSession, build: => DataFrame): String = {
    val was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sb = new StringBuilder
      render(build.queryExecution.executedPlan, 0, sb)
      sb.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", was)
  }

  def digestOf(tree: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tree.getBytes("UTF-8")).map(b => f"${b & 0xFF}%02x").mkString
  }

  /** One-line shape summary for readable fingerprint diffs. */
  def summaryOf(tree: String): String = {
    def n(cls: String) = tree.linesIterator.count(_.trim == cls)
    s"shuffle=${n("ShuffleExchangeExec")} bcast=${n("BroadcastExchangeExec")} " +
      s"bhj=${n("BroadcastHashJoinExec")} smj=${n("SortMergeJoinExec")} " +
      s"shj=${n("ShuffledHashJoinExec")} bnlj=${n("BroadcastNestedLoopJoinExec")} " +
      s"hashagg=${n("HashAggregateExec")} objagg=${n("ObjectHashAggregateExec")} " +
      s"sortagg=${n("SortAggregateExec")} sort=${n("SortExec")} " +
      s"window=${n("WindowExec")} scan=${n("FileSourceScanExec")} " +
      s"wscg=${n("WholeStageCodegenExec")}"
  }

  /** (digest, summary) of one registry query's static plan. */
  def fingerprint(spark: SparkSession, sfDir: String, name: String): (String, String) = {
    val tree = planTreeOf(spark, SparkEntry.queries(name)(spark, sfDir))
    (digestOf(tree), summaryOf(tree))
  }

  /** Plan-guarded query set: the bench headliners plus the heavyweight
    * composite operators (iterative training, multi-channel fusion,
    * cluster machinery) whose plans would otherwise regress silently —
    * they are too slow-moving for the bench but exactly the ones where
    * an accidental sort/shuffle matters most at 100 TB.
    */
  val Guarded: Seq[String] = (Bench.Headline ++ Seq(
    "q_dup_clusters",
    "q_semantic_dedup",
    "q_ann_ivfpq_topk",
    "q_cluster_sample",
    "q_hybrid_search",
    "q_source_overlap",
    "q_bloom_screen",
    "q_domain_affinity",
    "q_collocations",
    "q_ann_recall_report")).distinct

  /** (query, digest, summary) for every Guarded query. */
  def compute(spark: SparkSession, sfDir: String): Seq[(String, String, String)] =
    Guarded.map { name =>
      val (d, s) = fingerprint(spark, sfDir, name)
      (name, d, s)
    }

  def write(spark: SparkSession, sfDir: String, path: String): Unit = {
    val lines = compute(spark, sfDir).map { case (n, d, s) => s"$n $d $s" }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n"))
  }

  /** Parse the checked-in file to (query -> (digest, summary)). */
  def read(path: String): Map[String, (String, String)] =
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .toArray(Array.empty[String]).toSeq
      .filter(_.trim.nonEmpty)
      .map { line =>
        val parts = line.split(" ", 3)
        parts(0) -> (parts(1), if (parts.length > 2) parts(2) else "")
      }.toMap
}
