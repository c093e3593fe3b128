package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Bench, SparkEntry}
import graft.plans.PlanFingerprint

/** The bench-drift triage protocol as a tool (r3 established it by hand;
  * this commits it):
  *
  *  - `--write`: regenerate plan_fingerprints.txt — do this ONLY when a
  *    plan change is intentional, and commit the diff (the summary column
  *    shows what shape changed).
  *  - default (check): recompute fingerprints against the checked-in file
  *    and report PLAN_SAME / PLAN_CHANGED per headline query.
  *  - `--bench`: additionally run each headline query best-of-3 and print
  *    the times next to the plan verdict — a slowdown with PLAN_SAME is
  *    noise or environment, don't touch code; with PLAN_CHANGED it's a
  *    plan regression with a named culprit.
  *
  * The session mirrors SparkTestBase (local[4], 4 shuffle partitions,
  * sf0.001) so the tool and PlanFingerprintSpec always agree.
  */
object BenchGuard {
  def main(args: Array[String]): Unit = {
    val write = args.contains("--write")
    val bench = args.contains("--bench")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = PlanFingerprint.PinnedSf
    if (write) {
      PlanFingerprint.write(spark, sf, PlanFingerprint.DefaultFile)
      println(s"wrote ${PlanFingerprint.Guarded.size} fingerprints to ${PlanFingerprint.DefaultFile}")
    } else {
      val pinned = PlanFingerprint.read(PlanFingerprint.DefaultFile)
      var changed = 0
      PlanFingerprint.compute(spark, sf).foreach { case (name, d, s) =>
        val verdict = pinned.get(name) match {
          case Some((pd, _)) if pd == d => "PLAN_SAME"
          case Some((_, ps)) => changed += 1; s"PLAN_CHANGED (was: $ps)"
          case None => changed += 1; "PLAN_NEW (not in fingerprint file)"
        }
        val timing = if (bench) {
          val fn = SparkEntry.queries(name)
          val best = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sf).write.mode("overwrite")
              .format("noop").save()
            (System.nanoTime() - t0) / 1e9
          }.min
          f" best3=$best%.3fs"
        } else ""
        println(s"[guard] $name: $verdict$timing now: $s")
      }
      println(if (changed == 0) "[guard] all plans match the pinned fingerprints"
        else s"[guard] $changed plan(s) changed — if intentional, rerun with --write and commit")
    }
    spark.stop()
  }
}
