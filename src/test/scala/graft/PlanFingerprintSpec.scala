package graft

import graft.plans.PlanFingerprint

/** The bench guard's spec half: every guarded query's static physical
  * plan must match the checked-in fingerprint. A failure here means a
  * code change altered a benchmark plan — if intentional, regenerate with
  * `runMain graft.tools.BenchGuard --write` and commit the diff; if not,
  * the fingerprint names the regression before the bench ever runs.
  */
class PlanFingerprintSpec extends SparkTestBase {

  private lazy val pinned = PlanFingerprint.read(PlanFingerprint.DefaultFile)

  test("fingerprint file covers exactly the guarded queries") {
    assert(pinned.keySet == PlanFingerprint.Guarded.toSet,
      s"stale fingerprint file — rerun BenchGuard --write " +
        s"(missing: ${PlanFingerprint.Guarded.filterNot(pinned.contains).mkString(",")})")
  }

  for (name <- PlanFingerprint.Guarded) {
    test(s"plan fingerprint unchanged: $name") {
      val (now, nowSummary) = PlanFingerprint.fingerprint(spark, Sf, name)
      val (want, wantSummary) = pinned(name)
      assert(now == want,
        s"\nplan shape changed for $name" +
          s"\n  pinned:  $wantSummary" +
          s"\n  now:     $nowSummary" +
          s"\nif intentional: runMain graft.tools.BenchGuard --write, commit the diff")
    }
  }
}
