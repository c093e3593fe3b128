package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.FixtureScale

/** Pure invariants of the fixture scaler's per-copy text substitution —
  * the r11/r12 advisory class: the r11 Caesar rotation silently shared
  * letter vocabulary between copies k and k+26, and a raw 62-wheel
  * rotation collapses to the identity under the pipeline's lower().
  * These checks pin the current scheme's claims without touching Spark.
  */
class FixtureScaleSpec extends AnyFunSuite {

  private val Base =
    "abcdefghijklmnopqrstuvwxyz" + "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + "0123456789"

  /** Apply copy-k's substitution to a string the way translate() does. */
  private def subst(k: Int, s: String): String = {
    val m = Base.zip(FixtureScale.mapped(k)).toMap
    s.map(c => m.getOrElse(c, c))
  }

  test("copy 0 is the identity; every induced effective map is a bijection") {
    assert(FixtureScale.mapped(0) == Base)
    val effective = "abcdefghijklmnopqrstuvwxyz0123456789"
    for (k <- Seq(1, 25, 26, 35, 36, 99, 431)) {
      val t = FixtureScale.mapped(k)
      assert(t.length == Base.length)
      assert(t.toSet.subsetOf(Base.toSet), s"copy $k leaves the alphabet")
      // the raw 62-char map deliberately merges case pairs whose target
      // is a digit (every consumer case-folds first); the bijection
      // claim lives on the EFFECTIVE post-lowercase alphabet
      val ind = subst(k, effective).toLowerCase
      assert(ind.toSet.size == 36, s"copy $k: induced map is not a bijection")
      assert(ind.forall(effective.contains(_)), s"copy $k leaves the effective alphabet")
    }
  }

  test("induced post-lowercase maps are pairwise distinct across the factor range") {
    // the invariant dedup workloads rely on: after the tokenizer's
    // lower(), no two copies share a letter/digit mapping — so
    // vocabularies stay disjoint (up to coincidental short-token images)
    def induced(k: Int): String = subst(k, "abcdefghijklmnopqrstuvwxyz0123456789").toLowerCase
    val maps = (0 until 432).map(induced)
    assert(maps.distinct.size == 432,
      "two copies in range share an induced effective-alphabet map")
  }

  test("lengths, tokenization boundaries, and case classes are preserved") {
    val doc = "The Quick9 brown-fox 42 jumps_over: LAZY dogs!"
    for (k <- Seq(1, 26, 63, 100)) {
      val out = subst(k, doc)
      assert(out.length == doc.length)
      // non-alphanumerics untouched => token boundaries identical
      assert(doc.zip(out).forall { case (a, b) =>
        a.isLetterOrDigit == b.isLetterOrDigit &&
          (a.isLetterOrDigit || a == b) })
      // uppercase source letters keep producing uppercase letters when
      // the target is a letter (the case-preserving claim)
      assert(doc.zip(out).forall { case (a, b) => !(a.isUpper && b.isLower) })
    }
  }

  test("the r11 failure modes stay dead: k and k+26 induce different maps") {
    val letters = "abcdefghijklmnopqrstuvwxyz"
    for (k <- 0 until 74)
      assert(subst(k, letters).toLowerCase != subst(k + 26, letters).toLowerCase,
        s"copies $k and ${k + 26} share the letter mapping")
  }
}
