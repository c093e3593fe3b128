package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mining, Quality, TextAnalysis}
import graft.sources.Tables

/** Brute-force cross-checks (sf0.001, where O(n^2) in a test is fine) and
  * structural invariants for the round-10 additions: item-neighbor
  * Jaccard, the k-anonymity ladder, vocabulary growth, and per-doc
  * novelty.
  */
class CorpusGrowthSpec extends SparkTestBase {

  private def tokens(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(Option(text).getOrElse("").toLowerCase).toSeq

  private def shingles(text: String): Seq[String] = {
    val ws = tokens(text)
    if (ws.size < 3) Seq.empty else ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
  }

  // ---- item neighbor Jaccard ----

  test("item neighbor jaccard matches the in-memory brute force") {
    val got = Mining.itemNeighborJaccard(spark, Sf, maxItems = 8,
        minCo = 1, topN = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = inc.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .filter(_._2.size <= 8).toMap
    val deg = byBasket.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val co = scala.collection.mutable.Map[(Long, Long), Long]()
    byBasket.values.foreach { items =>
      val s = items.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size)
        co((s(i), s(j))) = co.getOrElse((s(i), s(j)), 0L) + 1
    }
    val want = co.toSeq.map { case ((a, b), c) =>
      val un = deg(a) + deg(b) - c
      (a, b, c, deg(a), deg(b), (2000000L * c + un) / (2 * un))
    }.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(50)
    assert(got == want)
  }

  test("item neighbor jaccard bounds and canonical ordering") {
    val rows = Mining.itemNeighborJaccard(spark, Sf, maxItems = 8,
      minCo = 1, topN = 50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (co, da, db, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b, "canonical item_a < item_b")
      assert(co >= 1 && co <= math.min(da, db))
      assert(j >= 0 && j <= 1000000L)
    }
  }

  // ---- k-anonymity ladder ----

  test("k-anonymity ladder matches the in-memory census") {
    val cust = Tables.load(spark, Sf, "customer")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def census(lvl: Int, key: ((Long, String, Double)) => Product)
        : (Int, Long, Long, Long, Long) = {
      val sizes = cust.groupBy(key).view.mapValues(_.length.toLong).values.toSeq
      val n = sizes.sum
      val risk = sizes.filter(_ < 5).sum
      (lvl, sizes.size.toLong, sizes.min, risk, (20000L * risk + n) / (2 * n))
    }
    val want = Seq(
      census(0, t => (t._1, t._2, math.floor(t._3 / 100).toLong)),
      census(1, t => (t._1, t._2, math.floor(t._3 / 1000).toLong)),
      census(2, t => (t._1, t._2)))
    val got = Quality.kAnonymity(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
  }

  test("k-anonymity risk is weakly decreasing along the ladder") {
    val rows = Quality.kAnonymity(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(3))).toMap
    // each level is a strict coarsening of the previous: classes only
    // merge, sizes only grow, so at-risk rows can only shrink
    assert(rows(1) <= rows(0))
    assert(rows(2) <= rows(1))
  }

  // ---- vocabulary growth ----

  test("vocab growth matches the per-checkpoint brute force") {
    val docs = Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), tokens(r.getString(1))))
    val maxId = docs.map(_._1).max
    val want = Seq(13, 25, 50, 100).map { pct =>
      val thr = maxId * pct / 100
      val in = docs.filter(_._1 <= thr)
      (pct, in.size.toLong, in.map(_._2.size.toLong).sum,
        in.flatMap(_._2).distinct.size.toLong)
    }
    val got = TextAnalysis.vocabGrowth(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("vocab growth is monotone and ends at the global totals") {
    val rows = TextAnalysis.vocabGrowth(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(13, 25, 50, 100))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 <= hi._2 && lo._3 <= hi._3 && lo._4 <= hi._4)
    }
    val docs = Tables.load(spark, Sf, "documents")
      .select(col("text")).collect().map(r => tokens(r.getString(0)))
    val last = rows.last
    assert(last._3 == docs.map(_.size.toLong).sum)
    assert(last._4 == docs.flatten.distinct.size.toLong)
  }

  // ---- per-doc novelty ----

  test("novelty matches the ingest-ordered brute force") {
    val docs = Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), shingles(r.getString(1))))
      .filter(_._2.nonEmpty).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val want = docs.map { case (id, sh) =>
      val novel = sh.count(!seen(_))
      seen ++= sh
      (id, sh.size.toLong, novel.toLong,
        (20000L * novel + sh.size) / (2L * sh.size))
    }.toSeq
    val got = TextAnalysis.noveltyScores(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("novelty counts partition the global distinct-shingle set") {
    val rows = TextAnalysis.noveltyScores(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
    }
    val globalDistinct = Tables.load(spark, Sf, "documents")
      .select(col("text")).collect().flatMap(r => shingles(r.getString(0)))
      .distinct.length.toLong
    // every distinct shingle is novel in exactly one doc (its first)
    assert(rows.map(_.getLong(2)).sum == globalDistinct)
  }
}
