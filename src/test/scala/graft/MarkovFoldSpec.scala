package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Focused spec for the r15 fold rewrite of the markov value iteration:
  * `markovFromTransitions` now runs the catalog-sized rounds as one
  * aggregate() fold over a collected transition array instead of K
  * join-aggregate rounds. These tests pin the fold against an inline
  * row-level reference implementation of the OLD spelling's semantics
  * (per-round join + clamp + absent-row-is-zero) on hand-built transition
  * frames that exercise every branch: removal clamp, CONV absorption,
  * dst-only states (DROP), disconnected channels, and empty input.
  */
class MarkovFoldSpec extends SparkTestBase {

  /** Reference value iteration — the old join-aggregate semantics, row
    * level: p_k(s) = 0 if s = rm; 1e9 if s = CONV; else
    * (sum_d cnt(s,d) * p_{k-1}(d)) DIV n(s) with absent states reading 0.
    */
  private def reference(trans: Seq[(String, String, Long)], iters: Int)
  : Seq[(String, Long, Long)] = {
    val srcs = trans.map(_._1).distinct
    val n = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    def iterate(rm: String): Long = {
      var p = Map("CONV" -> 1000000000L).withDefaultValue(0L)
      (1 to iters).foreach { _ =>
        p = (srcs.map { s =>
          s -> (if (s == rm) 0L
                else trans.collect { case (a, b, c) if a == s => c * p(b) }
                  .sum / n(s))
        }.toMap + ("CONV" -> 1000000000L)).withDefaultValue(0L)
      }
      p("START")
    }
    val base = iterate("(base)")
    val channels = srcs.filter(_ != "START").sorted
    (channels.map { c =>
      val pr = iterate(c)
      (c, pr, if (base == 0) 0L else (base - pr) * 1000000L / base)
    } :+ (("(base)", base, 0L))).sortBy(_._1)
  }

  private def run(trans: Seq[(String, String, Long)], iters: Int = 12)
  : Seq[(String, Long, Long)] = {
    import spark.implicits._
    val t = trans.toDF("src", "dst", "cnt")
    val channels = t.filter(col("src") =!= "START")
      .select(col("src").as("rm")).distinct()
    Analytics.markovFromTransitions(spark, t, channels, iters)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("fold equals the row-level reference on a mixed journey graph") {
    // two channels, a cycle (view <-> click), CONV and DROP terminals,
    // asymmetric counts so the DIV truncation actually bites
    val trans = Seq(
      ("START", "view", 7L), ("START", "click", 3L),
      ("view", "click", 4L), ("click", "view", 2L),
      ("view", "CONV", 2L), ("view", "DROP", 1L),
      ("click", "CONV", 1L), ("click", "DROP", 4L))
    assert(run(trans) == reference(trans, 12))
  }

  test("removal clamp: a channel on every converting path loses all mass") {
    // every conversion goes through 'gate' — removing it must zero
    // p(START), i.e. removal_1e6 = 1e6 exactly
    val trans = Seq(
      ("START", "gate", 5L),
      ("gate", "CONV", 3L), ("gate", "DROP", 2L))
    val got = run(trans)
    assert(got == reference(trans, 12))
    assert(got.find(_._1 == "gate").get._3 == 1000000L)
  }

  test("dst-only states hold zero: DROP never feeds mass back") {
    // 'dead' is reachable but has no outgoing row (like DROP): the old
    // spelling dropped its row after round 1 (absent = 0); the fold must
    // read 0 for it in every round
    val trans = Seq(
      ("START", "a", 2L), ("a", "dead", 1L), ("a", "CONV", 1L))
    assert(run(trans) == reference(trans, 12))
  }

  test("iters=1 and iters=0 edge rounds agree with the reference") {
    val trans = Seq(
      ("START", "x", 1L), ("x", "CONV", 1L))
    assert(run(trans, iters = 1) == reference(trans, 1))
    // zero rounds: p stays at the CONV-only init, START reads 0, base = 0
    // and the readout guards division by zero
    assert(run(trans, iters = 0) == reference(trans, 0))
  }

  test("empty transition frame yields an empty readout") {
    assert(run(Seq.empty).isEmpty)
  }
}
