package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Mining}
import graft.sources.Tables

/** Invariants and in-memory brute-force cross-checks for the TPC-H
  * classics block (volume shipping, market share, promotion effect, top
  * supplier, small-qty revenue, min-cost supplier), the daily-ACF
  * statistic, the traffic KPI report, and the k-core peel — beyond the
  * oracle equality the driver checks and the twin equality
  * SqlFrontDoorSpec pins.
  */
class ClassicsSpec extends SparkTestBase {

  private def cents(x: Double): Long = math.floor(x * 100d + 0.5d).toLong

  test("volume shipping: only the two trading nations, both roles, in-window years") {
    val rows = Analytics.volumeShipping(spark, Sf).collect()
    assert(rows.nonEmpty)
    val nations = Set("NATION_18", "NATION_19")
    rows.foreach { r =>
      val (supp, cust) = (r.getString(0), r.getString(1))
      assert(nations(supp) && nations(cust) && supp != cust)
      assert(r.getLong(2) >= 1996L && r.getLong(2) <= 1997L)
      assert(r.getLong(3) > 0L)
    }
  }

  test("returned-item report matches the in-memory join recompute") {
    import org.apache.spark.sql.functions.col
    val li = Tables.load(spark, Sf, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1) * (1d - r.getDouble(2)))))
    val ord = Tables.load(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("string").as("d"))
      .collect()
      .filter { r =>
        val d = r.getString(2)
        d >= "1996-01-01" && d < "1996-04-01"
      }
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.load(spark, Sf, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val nat = Tables.load(spark, Sf, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = li.flatMap { case (ok, c) => ord.get(ok).map(ck => (ck, c)) }
      .groupBy(_._1).map { case (ck, xs) =>
        val (name, nk) = cust(ck)
        (ck, name, nat(nk), xs.length.toLong, xs.map(_._2).sum)
      }.toSeq
      .sortBy(t => (-t._5, t._1)).take(20)
    val got = Analytics.returnedItemReport(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("forecast revenue matches the in-memory filter recompute") {
    import org.apache.spark.sql.functions.col
    val want = Tables.load(spark, Sf, "lineitem")
      .select(col("l_shipdate").cast("string").as("d"), col("l_discount"),
        col("l_quantity"), col("l_extendedprice"))
      .collect()
      .filter { r =>
        val d = r.getString(0)
        d >= "1996-01-01" && d < "1997-01-01" &&
          r.getDouble(1) >= 0.05 && r.getDouble(1) <= 0.07 &&
          r.getDouble(2) < 24d
      }
      .map(r => cents(r.getDouble(3) * r.getDouble(1)))
    val got = Analytics.forecastRevenue(spark, Sf).collect().head
    assert((got.getLong(0), got.getLong(1)) == (want.length.toLong, want.sum))
  }

  test("disjunctive revenue: every arm priced, recompute agrees") {
    import org.apache.spark.sql.functions.col
    val arms = Seq(("Brand#11", 1, 15, 1d, 20d), ("Brand#22", 10, 30, 10d, 35d),
      ("Brand#13", 20, 50, 25d, 50d))
    val parts = Tables.load(spark, Sf, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val want = Tables.load(spark, Sf, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .collect()
      .flatMap { r =>
        parts.get(r.getLong(0)).collect {
          case (b, sz) if arms.exists { case (ab, s0, s1, q0, q1) =>
            b == ab && sz >= s0 && sz <= s1 &&
              r.getDouble(1) >= q0 && r.getDouble(1) <= q1 } =>
            (b, cents(r.getDouble(2) * (1d - r.getDouble(3))))
        }
      }
      .groupBy(_._1).view.mapValues(xs => (xs.length.toLong, xs.map(_._2).sum))
      .toMap
    val got = Analytics.disjunctiveRevenue(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("market share: numerator bounded by denominator, share in [0, 1e4]") {
    val rows = Analytics.marketShare(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= r.getLong(2))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
    }
    val years = rows.map(_.getLong(0)).toSeq
    assert(years == years.sorted && years.distinct == years)
  }

  test("promotion effect: promo slice bounded, months dense-sorted") {
    val rows = Analytics.promotionEffect(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= r.getLong(2))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
      assert(r.getString(0).matches("\\d{4}-\\d{2}"))
    }
    val months = rows.map(_.getString(0)).toSeq
    assert(months == months.sorted && months.distinct == months)
  }

  test("top supplier equals the max of an independently-composed revenue agg") {
    val got = Analytics.topSupplier(spark, Sf).collect()
    assert(got.nonEmpty)
    // independent composition: SQL-style agg over the registered table
    Tables.registerAll(spark, Sf)
    val per = spark.sql(
      """SELECT l_suppkey, sum(CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)
        |  * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS rev
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |GROUP BY l_suppkey""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val mx = per.values.max
    assert(got.forall(_.getLong(2) == mx))
    assert(got.map(_.getLong(0)).toSet == per.filter(_._2 == mx).keySet)
  }

  test("small-qty revenue matches the in-memory correlated subquery") {
    val got = Analytics.smallQtyRevenue(spark, Sf).collect()(0)
    val li = Tables.load(spark, Sf, "lineitem")
      .join(Tables.load(spark, Sf, "part").filter(col("p_brand") === "Brand#1")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val avgQty = li.groupBy(_._1).map { case (p, xs) =>
      p -> xs.map(_._2).sum / xs.size
    }
    val kept = li.filter { case (p, q, _, _) => q < 0.2 * avgQty(p) }
    val rev = kept.map { case (_, _, ep, d) => cents(ep * (1d - d)) }.sum
    assert(got.getLong(0) == kept.size.toLong)
    assert(got.getLong(1) == rev)
    assert(got.getLong(2) == (2 * rev + 7) / 14)
  }

  test("min-cost supplier matches the in-memory min/tie-break") {
    val rows = Analytics.minCostSupplier(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val li = Tables.load(spark, Sf, "lineitem")
      .join(Tables.load(spark, Sf, "part").filter(col("p_brand") === "Brand#2")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "l_suppkey", "l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), cents(r.getDouble(2))))
    val want = li.groupBy(x => (x._1, x._2)).map { case ((p, sp), xs) =>
      (p, sp, xs.map(_._3).min)
    }.groupBy(_._1).map { case (p, offers) =>
      offers.toSeq.minBy(o => (o._3, o._2))
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == want)
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("daily ACF matches the in-memory Pearson at every lag") {
    val rows = Analytics.acfDailyValue(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    rows.foreach { case (_, n, a) =>
      assert(n > 0L); assert(math.abs(a) <= 1000000L)
    }
    // brute force: same integer components, same double finish
    val daily = Tables.load(spark, Sf, "events")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(expr(
        "CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .as("v"))
      .orderBy(col("day"))
      .collect().map(_.getLong(1))
    rows.foreach { case (k, n, acfMicro) =>
      val pairs = daily.dropRight(k.toInt).zip(daily.drop(k.toInt))
      assert(n == pairs.length.toLong)
      val (xs, ys) = (pairs.map(x => BigInt(x._1)), pairs.map(x => BigInt(x._2)))
      val bn = BigInt(pairs.length)
      val num = (bn * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum).toDouble
      val dx = (bn * xs.map(x => x * x).sum - xs.sum * xs.sum).toDouble
      val dy = (bn * ys.map(y => y * y).sum - ys.sum * ys.sum).toDouble
      val want =
        if (dx <= 0 || dy <= 0) 0L
        else {
          val r = num / (math.sqrt(dx) * math.sqrt(dy))
          if (r >= 0) math.floor(r * 1e6 + 0.5).toLong
          else -math.floor(-r * 1e6 + 0.5).toLong
        }
      assert(acfMicro == want, s"lag $k: got $acfMicro want $want")
    }
  }

  test("traffic KPI reconciles against raw counts and the sessionizer") {
    val rows = Analytics.trafficKpiReport(spark, Sf).collect()
    val nEvents = Tables.load(spark, Sf, "events").count()
    assert(rows.map(_.getLong(1)).sum == nEvents)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "users <= events per day")
      assert(r.getLong(4) <= r.getLong(1), "session starts <= events per day")
      val (ne, ns, ratio) = (r.getLong(1), r.getLong(4), r.getLong(5))
      if (ns == 0) assert(ratio == 0L)
      else assert(ratio == (20000 * ne + ns) / (2 * ns))
    }
    // cross-operator: total session starts == total sessions
    val nSessions = Analytics.sessionizeBatch(spark, Sf).count()
    assert(rows.map(_.getLong(4)).sum == nSessions)
  }

  test("k-core matches the in-memory peel and respects the core bound") {
    val got = Mining.kcoreMembership(spark, Sf, maxItems = 8, minCo = 2,
      k = 3, rounds = 8).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // brute force: same edge rule, same fixed-round peel
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = inc.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .filter(_._2.size <= 8)
    val co = scala.collection.mutable.Map[(Long, Long), Int]()
    byBasket.foreach { case (_, items) =>
      val s = items.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size)
        co((s(i), s(j))) = co.getOrElse((s(i), s(j)), 0) + 1
    }
    var edges = co.filter(_._2 >= 2).keys.toSet
    for (_ <- 1 to 8) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size)
      val alive = deg.filter(_._2 >= 3).keys.toSet
      edges = edges.filter(e => alive(e._1) && alive(e._2))
    }
    val want = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got == want)
    // the fixture reaches the fixed point inside 8 rounds, so every
    // surviving node genuinely has core degree >= k
    got.values.foreach(d => assert(d >= 3L))
  }
}
