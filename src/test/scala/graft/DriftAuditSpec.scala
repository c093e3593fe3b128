package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Quality, Sampling, TextAnalysis}
import graft.sources.Tables

/** Brute-force cross-checks (sf0.001) and invariants for the drift/audit
  * additions: two-sample KS, the Benford digit audit, categorical HHI,
  * class-balanced downsampling, position-based attribution, readability,
  * and the tokenizer round-trip check.
  */
class DriftAuditSpec extends SparkTestBase {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def halfUp(num: Long, den: Long): Long = (2 * num + den) / (2 * den)

  // ---- two-sample KS ----

  test("ks drift matches the in-memory exact CDF scan") {
    val rows = Tables.load(spark, Sf, "orders")
      .select(col("o_totalprice"), col("o_orderpriority"))
      .collect()
      .map(r => (math.floor(r.getDouble(0) * 100 + 0.5).toLong,
        r.getString(1) == "1-URGENT"))
    val a = rows.filter(_._2).map(_._1)
    val b = rows.filterNot(_._2).map(_._1)
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    val ca = a.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cb = b.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vs = (ca.keySet ++ cb.keySet).toSeq.sorted
    var (ra, rb) = (0L, 0L)
    val gaps = vs.map { v =>
      ra += ca.getOrElse(v, 0L); rb += cb.getOrElse(v, 0L)
      (v, math.abs(halfUp(1000000L * ra, n1) - halfUp(1000000L * rb, n2)))
    }
    val d = gaps.map(_._2).max
    val vAt = gaps.filter(_._2 == d).map(_._1).min
    val got = Quality.ksDrift(spark, Sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == (n1, n2, vs.length.toLong, d, vAt))
    assert(d >= 0 && d <= 1000000L)
  }

  // ---- Benford audit ----

  test("benford audit counts every positive order once and bounds shares") {
    val got = Quality.benfordAudit(spark, Sf).collect()
    val nOrders = Tables.load(spark, Sf, "orders")
      .filter(col("o_totalprice") > 0).count()
    assert(got.map(_.getLong(1)).sum == nOrders)
    assert(got.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9))
    // half-up shares sum to 1e6 within one rounding step per digit
    val shareSum = got.map(_.getLong(3)).sum
    assert(math.abs(shareSum - 1000000L) <= got.length)
    // expected shares are the pinned Benford constants, summing to exactly 1e6
    assert(got.map(_.getLong(2)).sum <= 1000000L)
    got.foreach { r =>
      assert(r.getLong(4) == math.abs(r.getLong(3) - r.getLong(2)))
    }
  }

  test("benford first digit agrees with a string-prefix brute force") {
    val want = Tables.load(spark, Sf, "orders")
      .filter(col("o_totalprice") > 0)
      .collect()
      .map(r => math.floor(r.getAs[Double]("o_totalprice") * 100 + 0.5).toLong)
      .map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Quality.benfordAudit(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  // ---- categorical HHI ----

  test("column hhi matches a brute-force share computation per column") {
    val langs = Tables.load(spark, Sf, "documents")
      .groupBy(col("lang")).count().collect()
      .map(_.getLong(1))
    val n = langs.sum
    val shares = langs.map(c => halfUp(2000 * c / 2, n)) // (2000c + n)/(2n)
    val wantHhi = langs.map(c => { val s = (2000 * c + n) / (2 * n); s * s }).sum
    val wantTop = langs.map(c => (2000 * c + n) / (2 * n)).max
    val row = Quality.columnHhi(spark, Sf).collect()
      .find(_.getString(0) == "documents.lang").get
    assert(row.getLong(1) == n)
    assert(row.getLong(2) == langs.length.toLong)
    assert(row.getLong(3) == wantTop)
    assert(row.getLong(4) == wantHhi)
    assert(shares.length == langs.length) // silence unused-val linting paths
  }

  test("column hhi is 1e6-bounded and covers the five-slate") {
    val got = Quality.columnHhi(spark, Sf).collect()
    assert(got.length == 5)
    got.foreach { r =>
      assert(r.getLong(3) <= 1001L)
      assert(r.getLong(4) >= 1000000L / r.getLong(2) - r.getLong(2))
      assert(r.getLong(4) <= 1002001L) // (1000+1)^2 worst-case rounding
    }
  }

  // ---- class-balanced downsample ----

  test("balanced downsample keeps exactly the min class count per language") {
    val got = Sampling.balancedDownsample(spark, Sf).collect()
    val minTotal = got.map(_.getLong(1)).min
    assert(got.forall(_.getLong(2) == minTotal))
    // brute-force the kept set for one language via the same md5 order
    val lang = got.head.getString(0)
    val ids = Tables.load(spark, Sf, "documents")
      .filter(col("lang") === lang).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val kept = ids.sortBy(id => (md5hex(id.toString), id)).take(minTotal.toInt)
    assert(got.head.getLong(3) == kept.sum)
  }

  // ---- position-based attribution ----

  test("position attribution matches an in-memory replay and conserves revenue") {
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2),
        r.getString(3), math.floor(r.getDouble(4) * 100 + 0.5).toLong))
    case class Cr(channel: String, isFirst: Long, isLast: Long, credit: Long)
    val credits = scala.collection.mutable.ArrayBuffer[Cr]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val tl = rows.sortBy(r => (r._2, r._3))
      val touches = scala.collection.mutable.ArrayBuffer[String]()
      tl.foreach { case (_, _, _, typ, cents) =>
        if (typ == "purchase") {
          val n = touches.length.toLong
          if (n == 0) credits += Cr("(none)", 1, 1, cents)
          else {
            val lastCredit =
              if (n >= 3) cents * 4 / 10 else if (n == 2) cents / 2 else 0L
            val midEach = if (n >= 3) cents * 2 / (10 * (n - 2)) else 0L
            val firstCredit = cents - lastCredit - midEach * math.max(n - 2, 0)
            credits += Cr(touches.head, 1, 0, firstCredit)
            if (n >= 2) credits += Cr(touches.last, 0, 1, lastCredit)
            touches.slice(1, (n - 1).toInt).foreach { c =>
              credits += Cr(c, 0, 0, midEach)
            }
          }
        } else touches += typ
      }
    }
    val want = credits.groupBy(_.channel).view.mapValues { cs =>
      (cs.map(_.isFirst).sum, cs.map(_.isLast).sum, cs.map(_.credit).sum)
    }.toMap
    val got = Analytics.positionAttribution(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    // exact revenue conservation against the purchase total
    val totalPurchases = ev.filter(_._4 == "purchase").map(_._5).sum
    assert(got.values.map(_._3).sum == totalPurchases)
  }

  test("markov attribution matches the in-memory value iteration") {
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3)))
    // journeys: per user ordered by (ts, event_id), cut at first purchase
    val trans = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val tl = rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
      val cut = tl.indexOf("purchase")
      val j = (if (cut >= 0) tl.take(cut + 1) else tl)
        .map(t => if (t == "purchase") "CONV" else t)
      ("START" +: j).sliding(2).foreach(w => trans((w(0), w(1))) += 1)
      if (cut < 0) trans((j.last, "DROP")) += 1
    }
    val nSrc = trans.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val srcs = trans.keys.map(_._1).toSeq.distinct
    def iterate(rm: String): Long = {
      var p = Map("CONV" -> 1000000000L).withDefaultValue(0L)
      (1 to 12).foreach { _ =>
        val next = srcs.map { s =>
          s -> (if (s == rm) 0L
                else trans.collect { case ((a, b), c) if a == s => c * p(b) }
                  .sum / nSrc(s))
        }.toMap + ("CONV" -> 1000000000L)
        p = next.withDefaultValue(0L)
      }
      p("START")
    }
    val base = iterate("(base)") // no state is named (base): clamps nothing
    val channels = ev.map(_._4).filter(_ != "purchase").distinct.sorted
    val want = (channels.map { c =>
      val pr = iterate(c)
      (c, pr, (base - pr) * 1000000L / base)
    } :+ (("(base)", base, 0L))).sortBy(_._1).toSeq
    val got = Analytics.markovAttribution(spark, Sf, 12).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // removal effect is a probability share: bounded, and zero on the base
    assert(got.forall(r => r._3 >= 0 && r._3 <= 1000000L))
    assert(got.find(_._1 == "(base)").get._3 == 0L)
  }

  test("time-decay attribution matches the in-memory weighted recompute") {
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        math.floor(r.getDouble(4) * 100 + 0.5).toLong))
    val credits = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val tl = rows.sortBy(r => (r._2, r._3))
      tl.filter(_._4 == "purchase").foreach { p =>
        val pday = p._2 / 1000000L / 86400L
        val w = tl.filter(t => t._4 != "purchase" &&
            (t._2 < p._2 || (t._2 == p._2 && t._3 < p._3)) &&
            pday - t._2 / 1000000L / 86400L <= 9)
          .groupBy(_._4).view
          .mapValues(_.map(t => 1024L >> (pday - t._2 / 1000000L / 86400L).toInt).sum)
          .filter(_._2 > 0).toSeq
        if (w.isEmpty) {
          val (n, c) = credits("(none)"); credits("(none)") = (n + 1, c + p._5)
        } else {
          val wtot = w.map(_._2).sum
          val fl = w.map { case (ch, wc) => (ch, p._5 * wc / wtot) }
          val rem = p._5 - fl.map(_._2).sum
          // deterministic heaviest-first: order by (w desc, channel asc)
          val winner = w.sortBy { case (ch, wc) => (-wc, ch) }.head._1
          fl.foreach { case (ch, f) =>
            val bonus = if (ch == winner) rem else 0L
            val (n, c) = credits(ch); credits(ch) = (n + 1, c + f + bonus)
          }
        }
      }
    }
    val want = credits.toSeq.map { case (ch, (n, c)) => (ch, n, c) }.sortBy(_._1)
    val got = Analytics.timeDecayAttribution(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("attribution models conserve the same revenue") {
    val total = Analytics.positionAttribution(spark, Sf)
      .agg(sum(col("credit_cents"))).head().getLong(0)
    val first = Analytics.firstTouchAttribution(spark, Sf)
      .agg(sum(col("revenue_cents"))).head().getLong(0)
    val last = Analytics.lastTouchAttribution(spark, Sf)
      .agg(sum(col("revenue_cents"))).head().getLong(0)
    val decay = Analytics.timeDecayAttribution(spark, Sf)
      .agg(sum(col("credit_cents"))).head().getLong(0)
    assert(total == first && total == last && total == decay)
  }

  // ---- readability ----

  test("readability matches a brute-force for one source and stays bounded") {
    val got = TextAnalysis.readability(spark, Sf).collect()
    assert(got.nonEmpty)
    val src = got.head.getString(0)
    val docs = Tables.load(spark, Sf, "documents")
      .filter(col("source") === src).select(col("text"))
      .collect().map(r => Option(r.getString(0)).getOrElse(""))
    val words = docs.map(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase).length.toLong).sum
    val sents = docs.map(t => math.max("[.!?]+".r.findAllIn(t).length, 1).toLong).sum
    val syls = docs.map(t => "[aeiouy]+".r.findAllIn(t.toLowerCase).length.toLong).sum
    val wps = halfUp(10000 * words, sents)
    val spw = halfUp(10000 * syls, math.max(words, 1))
    val flesch = 206835 - (1015 * wps + 5000) / 10000 - (84600 * spw + 5000) / 10000
    val r = got.head
    assert(r.getLong(1) == docs.length.toLong)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (words, sents, syls))
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == (wps, spw, flesch))
  }

  // ---- tokenizer round-trip ----

  test("decode roundtrip is lossless exactly on the zero-OOV documents") {
    val got = TextAnalysis.decodeRoundtrip(spark, Sf).collect()
    val nDocs = Tables.load(spark, Sf, "documents").count()
    assert(got.map(_.getLong(1)).sum == nDocs)
    got.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2),
        s"source ${r.getString(0)}: ok != docs - oov_docs")
    }
  }
}
