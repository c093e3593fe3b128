package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Mining, Quality, TextAnalysis}
import graft.sources.Tables

/** Invariants for the mining / audit family beyond the oracle equality the
  * driver checks: brute-force cross-checks at sf0.001 (where O(n^2) in a
  * test is fine) and structural invariants the fixed-point arithmetic must
  * respect.
  */
class MiningSpec extends SparkTestBase {

  test("market basket matches the in-memory brute force") {
    val got = Mining.marketBasket(spark, Sf, maxItems = 8, topK = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // brute force over the collected incidence list
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = inc.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
      .filter(_._2.size <= 8)
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
    byBasket.foreach { case (_, items) =>
      for (i <- items.indices; j <- (i + 1) until items.size)
        counts((items(i), items(j))) = counts.getOrElse((items(i), items(j)), 0L) + 1
    }
    val want = counts.toSeq.map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }.take(25)
    assert(got == want)
  }

  test("market basket pairs are ordered and positive") {
    val rows = Mining.marketBasket(spark, Sf, maxItems = 8, topK = 25).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair must be canonical part_a < part_b")
      assert(r.getLong(2) >= 1L)
    }
  }

  test("pareto frontier equals the O(n^2) dominance definition") {
    val pts = Tables.load(spark, Sf, "part")
      .select(col("p_partkey"),
        expr("CAST(floor(p_retailprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pts.filter { case (_, pc, sz) =>
      !pts.exists { case (_, qc, qs) =>
        qc <= pc && qs >= sz && (qc < pc || qs > sz)
      }
    }.map { case (k, pc, sz) => (k, pc, sz) }.sortBy(t => (t._2, t._1)).toSeq
    val got = Mining.paretoFrontier(spark, Sf, bandWidth = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("pareto frontier is antichain under dominance") {
    val f = Mining.paretoFrontier(spark, Sf, bandWidth = 5000L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    for (a <- f; b <- f if a != b)
      assert(!(a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)),
        s"$a dominates $b inside the frontier")
  }

  test("pareto frontier is band-width invariant") {
    val a = Mining.paretoFrontier(spark, Sf, bandWidth = 5000L).collect().toSeq
    val b = Mining.paretoFrontier(spark, Sf, bandWidth = 137L).collect().toSeq
    val c = Mining.paretoFrontier(spark, Sf, bandWidth = 1000000000L).collect().toSeq
    assert(a == b && a == c)
  }

  test("chi2 audit marginals are consistent") {
    val rows = Quality.chi2SourceLang(spark, Sf).collect()
    val totalDocs = Tables.load(spark, Sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum == totalDocs, "cell obs must sum to n")
    // each source's cells sum to its row_tot, each lang's to its col_tot
    rows.groupBy(_.getString(1)).foreach { case (_, cs) =>
      assert(cs.map(_.getLong(2)).sum == cs.head.getLong(4))
    }
    rows.groupBy(_.getString(0)).foreach { case (_, cs) =>
      assert(cs.map(_.getLong(2)).sum == cs.head.getLong(3))
    }
    rows.foreach { r =>
      assert(r.getLong(5) >= 0 && r.getLong(6) >= 0)
    }
  }

  test("token log2 histogram partitions the corpus exactly") {
    val rows = TextAnalysis.tokenLog2Histogram(spark, Sf).collect()
    val nDocs = Tables.load(spark, Sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    // bucket bounds: lo = 2^bucket and every bucket's tokens fit [lo, 2*lo)
    rows.filter(_.getLong(0) >= 0).foreach { r =>
      val (bucket, lo) = (r.getLong(0), r.getLong(1))
      assert(lo == (1L << bucket))
      val nTokens = r.getLong(3)
      val nDocsB = r.getLong(2)
      assert(nTokens >= nDocsB * lo && nTokens < nDocsB * lo * 2,
        s"bucket $bucket token mass outside [n*2^b, n*2^(b+1))")
    }
    // cumulative share is monotone and ends at exactly 10000
    val cum = rows.sortBy(_.getLong(0)).map(_.getLong(4))
    assert(cum.sameElements(cum.sorted))
    assert(cum.last == 10000L)
  }

  test("pagerank matches the in-memory integer power iteration") {
    val got = Mining.pagerankCopurchase(spark, Sf, maxItems = 8, iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // brute force with the identical integer fixed-point arithmetic
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = inc.groupBy(_._1).view.mapValues(_.map(_._2)).filter(_._2.size <= 8)
    val w = scala.collection.mutable.Map[(Long, Long), Long]()
    baskets.foreach { case (_, items) =>
      for (a <- items; b <- items if a != b)
        w((a, b)) = w.getOrElse((a, b), 0L) + 1
    }
    val nodes = w.keys.map(_._1).toSet
    val n = nodes.size.toLong
    val wout = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var pr = nodes.map(v => v -> 1000000000L / n).toMap
    val base = 150000000L / n
    (1 to 10).foreach { _ =>
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      w.foreach { case ((u, v), wt) => in(v) += (pr(u) * wt) / wout(u) }
      pr = nodes.map(v => v -> (base + (85L * in(v)) / 100L)).toMap
    }
    val want = pr.toSeq.map { case (v, r) => (v, r) }
      .sortBy { case (v, r) => (-r, v) }
    assert(got == want)
  }

  test("pagerank co-partitioned mode is bit-identical to broadcast mode") {
    // the mode moves data, never arithmetic: the once-repartitioned
    // shuffled-hash rounds (the >1e8-node regime) must reproduce the
    // broadcast rounds' ranks exactly
    val bc = Mining.pagerankCopurchase(spark, Sf, maxItems = 8, iters = 10,
      mode = Mining.BroadcastRanks)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cp = Mining.pagerankCopurchase(spark, Sf, maxItems = 8, iters = 10,
      mode = Mining.CoPartitionedRanks)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cp == bc)
  }

  test("co-partitioned rank round plans a shuffled-hash join, edge side exchange-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, BroadcastHashJoinExec}
    val raw = Mining.copurchaseEdges(spark, Sf, maxItems = 8)
    val withW = raw.join(
      broadcast(raw.groupBy(col("src")).agg(sum(col("w")).as("wsum"))), Seq("src"))
    val edges = withW.repartition(col("src")).persist()
    edges.count() // materialize the cache so the scan reports its partitioning
    val ranks = edges.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1000000L)).localCheckpoint(true)
    try {
      val was = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val round = Mining.rankRound(edges, ranks, 1000L, Mining.CoPartitionedRanks)
        val plan = round.queryExecution.executedPlan
        val shj = plan.collect { case j: ShuffledHashJoinExec => j }
        assert(shj.nonEmpty, s"expected a ShuffledHashJoin round:\n$plan")
        // the edge (stream) side must satisfy the join's distribution
        // from the cached repartition — NO exchange under it
        val streamSideExchanges = shj.head.left.collect {
          case e: ShuffleExchangeExec => e
        } ++ shj.head.right.collect { case e: ShuffleExchangeExec => e }
        // exactly one exchange total (the rank side); the edge side
        // rides the InMemoryTableScan's hash partitioning
        assert(streamSideExchanges.size == 1,
          s"expected exactly the rank-side exchange, got ${streamSideExchanges.size}:\n$plan")
        // and the broadcast mode keeps its broadcast join
        val bplan = Mining.rankRound(edges, ranks, 1000L, Mining.BroadcastRanks)
          .queryExecution.executedPlan
        assert(bplan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty)
      } finally spark.conf.set("spark.sql.adaptive.enabled", was)
    } finally edges.unpersist()
  }

  test("shortest paths / BFS / closeness co-partitioned mode is bit-identical to broadcast") {
    // the rankRound contract extended to every frontier loop: the mode
    // moves data, never arithmetic
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(
      rows(Mining.shortestPaths(spark, Sf, 8, 4, 25,
        mode = Mining.CoPartitionedRanks)) ==
      rows(Mining.shortestPaths(spark, Sf, 8, 4, 25,
        mode = Mining.BroadcastRanks)))
    assert(
      rows(Mining.bfsLevels(spark, Sf, maxItems = 8, maxHops = 4,
        mode = Mining.CoPartitionedRanks)) ==
      rows(Mining.bfsLevels(spark, Sf, maxItems = 8, maxHops = 4,
        mode = Mining.BroadcastRanks)))
    assert(
      rows(Mining.closenessCentrality(spark, Sf, maxItems = 8,
        mode = Mining.CoPartitionedRanks)) ==
      rows(Mining.closenessCentrality(spark, Sf, maxItems = 8,
        mode = Mining.BroadcastRanks)))
  }

  test("co-partitioned frontier round: shuffled-hash joins, adjacency side exchange-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, BroadcastHashJoinExec}
    // one BFS hop built exactly as bfsLevels builds it in co-partitioned
    // mode: adjacency pinned via the cached repartition (localCheckpoint
    // would drop the partitioning — pinAdjacency's contract), frontier
    // and visited checkpointed node-sized frames
    val edges = Mining.basketEdges(spark, Sf, maxItems = 8)
    val adj = Mining.pinAdjacency(
      edges.unionByName(edges.select(col("v").as("u"), col("u").as("v"))),
      col("u"), Mining.CoPartitionedRanks)
    val frontier = adj.select(col("u").as("node")).distinct().limit(5)
      .localCheckpoint(true)
    val levels = frontier.withColumn("lvl", lit(0L)).localCheckpoint(true)
    val was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val hop = Mining.visitedAnti(
        Mining.frontierJoin(adj, frontier, frontier("node") === adj("u"),
          Mining.CoPartitionedRanks)
          .select(col("v").as("node")).distinct(),
        levels, Seq("node"), Mining.CoPartitionedRanks)
      val plan = hop.queryExecution.executedPlan
      val shj = plan.collect { case j: ShuffledHashJoinExec => j }
      assert(shj.size == 2, s"expected SHJ expand + SHJ anti:\n$plan")
      // the adjacency (stream) side of the expansion join must ride the
      // checkpointed repartition — no exchange beneath it; the only
      // exchanges in the whole hop are node-sized (frontier, distinct,
      // visited), never the adjacency
      val expand = shj.filter(
        _.joinType == org.apache.spark.sql.catalyst.plans.Inner).head
      val streamExchanges = expand.left.collect { case e: ShuffleExchangeExec => e } ++
        expand.right.collect { case e: ShuffleExchangeExec => e }
      assert(streamExchanges.size == 1,
        s"expected only the frontier-side exchange under the expansion join, " +
          s"got ${streamExchanges.size}:\n$plan")
      // and the default mode keeps its broadcast joins
      val bplan = Mining.visitedAnti(
        Mining.frontierJoin(adj, frontier, frontier("node") === adj("u"),
          Mining.BroadcastRanks)
          .select(col("v").as("node")).distinct(),
        levels, Seq("node"), Mining.BroadcastRanks)
        .queryExecution.executedPlan
      assert(bplan.collect { case j: BroadcastHashJoinExec => j }.size == 2)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", was)
      adj.unpersist()
    }
  }

  test("pagerank mass stays near 1e9 and every node survives") {
    val rows = Mining.pagerankCopurchase(spark, Sf, maxItems = 8, iters = 10)
      .collect()
    val mass = rows.map(_.getLong(1)).sum
    // floors only ever LEAK mass; ten rounds over this graph must stay
    // within a few thousand 1e-9 units of the full walk mass
    assert(mass <= 1000000000L && mass > 990000000L, s"mass=$mass")
    assert(rows.map(_.getLong(1)).forall(_ > 0))
  }

  test("join size estimate upper-bounds and localizes the exact join") {
    val rows = Quality.joinSizeEstimate(spark, Sf, buckets = 32).collect()
    assert(rows.length == 32)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(4), "est must upper-bound exact")
      assert(r.getInt(5) == 1)
    }
    val exactTotal = rows.map(_.getLong(4)).sum
    val trueJoin = Tables.load(spark, Sf, "orders").select(col("o_orderkey"))
      .join(Tables.load(spark, Sf, "lineitem").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(exactTotal == trueJoin, "bucketed exact counts must sum to the true join size")
  }

  test("kaplan-meier survival matches the in-memory product-limit recompute") {
    val got = Analytics.survivalSignupPurchase(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // brute force with the identical integer arithmetic
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val horizon = ev.map(_._3).max
    val t0 = ev.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val tp = ev.filter(_._2 == "purchase")
      .filter(e => t0.get(e._1).exists(e._3 >= _))
      .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val durs = t0.toSeq.map { case (u, s0) =>
      tp.get(u) match {
        case Some(p) => ((p - s0) / 86400000000L, 1L)
        case None    => ((horizon - s0) / 86400000000L, 0L)
      }
    }
    val days = durs.groupBy(_._1).view.mapValues { g =>
      (g.map(_._2).sum, g.size.toLong - g.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    var atRisk = durs.size.toLong
    var surv = 1000000000L
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    days.foreach { case (day, (d, c)) =>
      if (d > 0) {
        surv = surv * (atRisk - d) / atRisk
        want += ((day, atRisk, d, c, surv))
      }
      atRisk -= (d + c)
    }
    assert(got == want.toSeq)
    // structural invariants: survival non-increasing within [0, 1e9]
    assert(got.map(_._5).sameElements(got.map(_._5).sorted.reverse))
    assert(got.forall(r => r._5 >= 0 && r._5 <= 1000000000L))
    assert(got.nonEmpty)
  }

  test("bitmap distinct and overlap equal the set-based brute force") {
    import graft.operators.Sketches
    val pairs = Tables.events(spark, Sf)
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gotDistinct = Sketches.bitmapDistinctUsers(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotDistinct == sets.view.mapValues(_.size.toLong).toMap)
    val gotOverlap = Sketches.bitmapOverlap(spark, Sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val types = sets.keys.toSeq.sorted
    val wantOverlap = (for {
      a <- types; b <- types if a < b
      n = (sets(a) intersect sets(b)).size.toLong if n > 0
    } yield (a, b) -> n).toMap
    assert(gotOverlap == wantOverlap)
    // overlap can never exceed either side's cardinality
    gotOverlap.foreach { case ((a, b), n) =>
      assert(n <= gotDistinct(a) && n <= gotDistinct(b))
    }
  }

  test("image near-dup pairs equal the predicted-feature brute force") {
    import graft.operators.Multimodal
    val got = Multimodal.imageNearDup(spark, Sf, tol = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSeq
    val feats = Multimodal.predictedFeatures(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4)))
    val want = (for {
      a <- feats; b <- feats
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3 &&
        math.abs(a._4 - b._4) <= 8
    } yield (a._1, b._1, a._2, a._3, math.abs(a._4 - b._4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // banded candidates must be exact: no pair beyond tolerance survives
    assert(got.forall(_._5 <= 8))
  }

  test("ordered funnel matches the in-memory greedy tracker and is monotone") {
    val got = Analytics.funnelOrdered(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // independent recompute: min-after chain over collected events
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val deepest = byUser.view.mapValues { es =>
      def minAfter(tpe: String, after: Long): Option[Long] =
        es.filter(e => e._2 == tpe && e._3 > after).map(_._3)
          .reduceOption(_ min _)
      es.filter(_._2 == "signup").map(_._3).reduceOption(_ min _) match {
        case None => 0
        case Some(t1) => minAfter("click", t1) match {
          case None => 1
          case Some(t2) => if (minAfter("purchase", t2).isDefined) 3 else 2
        }
      }
    }.toMap
    val n1 = deepest.values.count(_ >= 1).toLong
    val want = (1 to 3).map { s =>
      val n = deepest.values.count(_ >= s).toLong
      (s.toLong, n, (20000 * n + n1) / (2 * n1))
    }.filter(_._2 > 0)
    assert(got == want)
    // funnel counts are monotone non-increasing by construction
    assert(got.map(_._2).sameElements(got.map(_._2).sorted.reverse))
  }

  test("mom revenue conserves total revenue and links deltas") {
    val rows = Analytics.momRevenue(spark, Sf).collect()
    assert(rows.length > 1, "fixture must span multiple months")
    val total = Tables.load(spark, Sf, "orders")
      .agg(sum(expr(
        "CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)")))
      .head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3) && rows.head.isNullAt(4))
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getLong(2) == prev.getLong(1), "prev_cents must chain")
      assert(cur.getLong(3) == cur.getLong(1) - prev.getLong(1))
    }
  }

  test("assoc rules match the in-memory support/confidence/lift recompute") {
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = inc.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
      .filter(_._2.size <= 8).toMap
    val nB = baskets.size.toLong
    val itemCnt = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pairCnt = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    baskets.values.foreach { items =>
      for (a <- items; b <- items if a != b) pairCnt((a, b)) += 1L
    }
    val want = pairCnt.toSeq.filter(_._2 >= 5L).map { case ((a, b), np) =>
      val (na, nb2) = (itemCnt(a), itemCnt(b))
      (a, b, np, na, nb2,
        (20000L * np + na) / (2L * na),
        (20000L * np * nB + na * nb2) / (2L * na * nb2))
    }.sortBy(t => (-t._7, t._1, t._2)).take(25)
    val got = Mining.assocRules(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(_._7 > 0L))
  }

  test("triangle count matches the in-memory adjacency enumeration") {
    // brute force: build the whale-guarded undirected edge set, then count
    // common neighbors per canonical edge — a deliberately different
    // algorithm than BOTH the degree-ordered operator and the naive-join
    // oracle
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = inc.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .filter(_._2.size <= 8)
      .flatMap { case (_, items) =>
        for (i <- items.indices; j <- (i + 1) until items.size)
          yield (items(i), items(j))
      }.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val perNode = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    edges.foreach { case (u, v) =>
      (adj(u) intersect adj(v)).filter(_ > v).foreach { w =>
        perNode(u) += 1; perNode(v) += 1; perNode(w) += 1
      }
    }
    val want = perNode.toSeq.map { case (n, c) => (n, c) }
      .sortBy { case (n, c) => (-c, n) }.take(25)
    val got = Mining.triangleCount(spark, Sf, maxItems = 8, k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("bfs levels match the in-memory breadth-first search") {
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = inc.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .filter(_._2.size <= 8)
      .flatMap { case (_, items) =>
        for (i <- items.indices; j <- (i + 1) until items.size)
          yield (items(i), items(j))
      }.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val nodes = adj.keySet.toSet
    val src = nodes.min
    val lvl = scala.collection.mutable.Map(src -> 0L)
    var frontier = Set(src)
    for (hop <- 1 to 4) {
      frontier = frontier.flatMap(adj).filterNot(lvl.contains)
      frontier.foreach(n => lvl(n) = hop.toLong)
    }
    val want = nodes.toSeq.map(n => lvl.getOrElse(n, -1L))
      .groupBy(identity).toSeq
      .map { case (l, g) => (l, g.size.toLong) }.sortBy(_._1)
    val got = Mining.bfsLevels(spark, Sf, maxItems = 8, maxHops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    // a useful fixture reaches past hop 1 and leaves something unreached
    assert(got.exists(_._1 >= 2), s"graph must have multi-hop structure: $got")
    assert(got.map(_._2).sum == nodes.size.toLong)
  }

  test("connected components match the in-memory bounded label propagation") {
    // faithful independent recompute of the CONTRACT: synchronous min-label
    // propagation for exactly ccRounds rounds (bounded-round semantics is
    // the spec — parity must hold whether or not the flood converged)
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Int]()
      .withDefaultValue(0)
    inc.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .filter(_._2.size <= 8)
      .foreach { case (_, items) =>
        for (i <- items.indices; j <- (i + 1) until items.size)
          pairCounts((items(i), items(j))) += 1
      }
    // iterator first: collect on a Map whose output is itself a Tuple2
    // would rebuild a MAP keyed by the pair's first element, silently
    // collapsing every edge that shares a left endpoint
    val edges = pairCounts.iterator.collect { case (e, c) if c >= 2 => e }.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val nodes = adj.keySet.toSet
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 12)
      lab = nodes.map(n => n -> (adj(n) + n).map(lab).min).toMap
    val want = lab.values.groupBy(identity).toSeq
      .map { case (c, g) => (c, g.size.toLong) }
      .sortBy { case (c, n) => (-n, c) }.take(25)
    val got = Mining.connectedComponents(spark, Sf, maxItems = 8,
        minCo = 2, rounds = 12, topN = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    // census conserves nodes when the census is smaller than topN
    if (got.size < 25) assert(got.map(_._2).sum == nodes.size.toLong)
    // every component label is a real node id (labels only move DOWN the
    // id order, so a label that is not a node would mean invented mass)
    got.foreach { case (c, _) => assert(nodes.contains(c)) }
  }

  test("clustering coefficient matches the in-memory per-node recompute") {
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = inc.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .filter(_._2.size <= 8)
      .flatMap { case (_, items) =>
        for (i <- items.indices; j <- (i + 1) until items.size)
          yield (items(i), items(j))
      }.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val perNode = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    edges.foreach { case (u, v) =>
      (adj(u) intersect adj(v)).filter(_ > v).foreach { w =>
        perNode(u) += 1; perNode(v) += 1; perNode(w) += 1
      }
    }
    val want = adj.toSeq.collect { case (n, nb) if nb.size >= 2 =>
      val deg = nb.size.toLong
      val tri = perNode(n)
      val denom = deg * (deg - 1)
      (n, deg, tri, (4000000L * tri + denom) / (2 * denom))
    }.sortBy { case (n, _, _, c) => (-c, n) }.take(25)
    val got = Mining.clusteringCoeff(spark, Sf, maxItems = 8,
        minDeg = 2, topN = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // a coefficient is a ratio of realized to possible neighbor links
    got.foreach { case (_, _, _, c) => assert(c >= 0L && c <= 1000000L) }
  }

  test("winsorized mean sits between the raw mean and the median side") {
    val rows = Analytics.winsorizedStats(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val p05 = r.getLong(2); val p95 = r.getLong(3)
      val clamped = r.getLong(4); val wm = r.getLong(5)
      assert(p05 <= p95)
      assert(wm >= p05 && wm <= p95) // clamped values span [p05, p95]
      assert(clamped >= 0L && clamped <= n)
    }
    // independent recompute of one priority's winsorized mean
    val cents = Tables.load(spark, Sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_totalprice")).collect()
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong).sorted
    val n = cents.length.toLong
    val p05 = cents(((n + 19) / 20 - 1).toInt)
    val p95 = cents(((19 * n + 19) / 20 - 1).toInt)
    val s = cents.map(c => math.min(math.max(c, p05), p95)).sum
    val want = (2 * s + n) / (2 * n)
    val got = rows.find(_.getString(0) == "1-URGENT").get
    assert(got.getLong(2) == p05 && got.getLong(3) == p95)
    assert(got.getLong(5) == want)
  }

  test("degree histogram equals the in-memory bucket recompute") {
    val inc = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = inc.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .filter(_._2.size <= 8)
      .flatMap { case (_, items) =>
        for (i <- items.indices; j <- (i + 1) until items.size)
          yield (items(i), items(j))
      }.toSet
    val deg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    edges.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
    val want = deg.values.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d))
      .toSeq.map { case (b, g) => (b.toLong, 1L << b, g.size.toLong) }
      .sortBy(_._1)
    val got = Mining.degreeHistogram(spark, Sf, maxItems = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._3).sum == deg.size.toLong)
  }

  test("cusum matches the in-memory recurrence and clamps at zero") {
    val daily = Tables.events(spark, Sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(expr(
        "CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val total = daily.map(_._2).sum
    var sHi = 0L; var sLo = 0L
    val want = daily.map { case (day, cents) =>
      sHi = math.max(0L, sHi + 2L * n * cents - 3L * total)
      sLo = math.max(0L, sLo + total - 2L * n * cents)
      (day, cents, sHi, sLo,
        if (sHi > 4L * total) 1L else 0L, if (sLo > 4L * total) 1L else 0L)
    }.toSeq
    val got = Analytics.cusumChangepoint(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(got.forall(r => r._3 >= 0L && r._4 >= 0L))
  }

  test("holt forecast matches the in-memory recurrence; residual reconciles") {
    val daily = Tables.events(spark, Sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(expr(
        "CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var l = 0L; var b = 0L
    val want = daily.zipWithIndex.map { case ((day, cents), i) =>
      val x = 10000L * cents
      if (i == 0) { l = x; b = 0L; (day, cents, l, b, None, None) }
      else {
        val f = l + b
        val lNew = (x + l + b) / 2
        b = ((lNew - l) + b) / 2
        l = lNew
        (day, cents, l, b, Some(f), Some(x - f))
      }
    }.toSeq
    val got = Analytics.holtForecast(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got == want)
    // residual is exactly the forecast miss wherever a forecast exists
    got.foreach { r =>
      (r._5, r._6) match {
        case (Some(f), Some(res)) => assert(res == 10000L * r._2 - f)
        case (None, None) => ()
        case other => fail(s"forecast/residual must be null together: $other")
      }
    }
  }

  test("corr matrix matches the in-memory Pearson recompute; diagonal-free") {
    val cols = Tables.spread(spark, Sf, "lineitem")
      .select(
        expr("CAST(floor(l_quantity + 0.5D) AS BIGINT)").as("qty"),
        expr("CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)").as("price"),
        expr("CAST(floor(l_discount * 100D + 0.5D) AS BIGINT)").as("disc"),
        expr("CAST(floor(l_tax * 100D + 0.5D) AS BIGINT)").as("tax"))
      .collect().map(r => Map("qty" -> r.getLong(0), "price" -> r.getLong(1),
        "disc" -> r.getLong(2), "tax" -> r.getLong(3)))
    def pearsonMicro(a: String, b: String): Long = {
      val xs = cols.map(_(a)).map(BigInt(_))
      val ys = cols.map(_(b)).map(BigInt(_))
      val n = BigInt(xs.length)
      val num = (n * xs.zip(ys).map { case (x, y) => x * y }.sum
        - xs.sum * ys.sum).toDouble
      val dx = (n * xs.map(x => x * x).sum - xs.sum * xs.sum).toDouble
      val dy = (n * ys.map(y => y * y).sum - ys.sum * ys.sum).toDouble
      if (dx <= 0 || dy <= 0) 0L
      else if (num >= 0) math.floor(num / (math.sqrt(dx) * math.sqrt(dy)) * 1e6 + 0.5).toLong
      else -math.floor(-num / (math.sqrt(dx) * math.sqrt(dy)) * 1e6 + 0.5).toLong
    }
    val got = Quality.corrMatrix(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 6) // upper triangle of 4 columns, no diagonal
    got.foreach { case (pair, n, r) =>
      assert(n == cols.length.toLong)
      assert(math.abs(r) <= 1000000L)
      val Array(a, b) = pair.split("_")
      assert(r == pearsonMicro(a, b), s"pair $pair")
    }
    // the synthetic columns are drawn independently — every |r| is small,
    // which is itself the profile a feature audit wants to see here
    assert(got.forall(g => math.abs(g._3) < 200000L))
  }

  test("ccf matches the in-memory Pearson-at-every-lag recompute") {
    val daily = Tables.events(spark, Sf)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(
        sum(expr("CASE WHEN event_type = 'click' THEN CAST(floor(value * 100D + 0.5D) AS BIGINT) ELSE 0 END")).as("x"),
        sum(expr("CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 100D + 0.5D) AS BIGINT) ELSE 0 END")).as("y"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val xs = daily.map(t => BigInt(t._2))
    val ys = daily.map(t => BigInt(t._3))
    def pearson(as: Seq[BigInt], bs: Seq[BigInt]): Long = {
      val n = BigInt(as.length)
      val num = (n * as.zip(bs).map { case (a, b) => a * b }.sum
        - as.sum * bs.sum).toDouble
      val dx = (n * as.map(a => a * a).sum - as.sum * as.sum).toDouble
      val dy = (n * bs.map(b => b * b).sum - bs.sum * bs.sum).toDouble
      if (dx <= 0 || dy <= 0) 0L
      else if (num >= 0) math.floor(num / (math.sqrt(dx) * math.sqrt(dy)) * 1e6 + 0.5).toLong
      else -math.floor(-num / (math.sqrt(dx) * math.sqrt(dy)) * 1e6 + 0.5).toLong
    }
    val want = (-7 to 7).map { k =>
      // pairs (x_t, y_{t+k}); negative k drops the first |k| y's
      val (as, bs) =
        if (k >= 0) (xs.dropRight(k), ys.drop(k))
        else (xs.drop(-k), ys.dropRight(-k))
      (k.toLong, as.length.toLong, pearson(as.toSeq, bs.toSeq))
    }
    val got = graft.operators.Analytics.ccfDailyValue(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // self-consistency: lag 0 pairs every day
    assert(got.find(_._1 == 0L).get._2 == daily.length.toLong)
  }

  test("shortest paths match the in-memory Bellman-Ford recompute") {
    val li = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).values.map(_.map(_._2).distinct.toSeq)
      .filter(_.size <= 8).toSeq
    val w = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    baskets.foreach { its =>
      for (a <- its; b <- its if a != b) w((a, b)) += 1
    }
    val edges = w.toSeq.map { case ((a, b), c) => (a, b, 1000000L / c) }
    val src = edges.map(_._1).min
    var dist = Map(src -> 0L)
    (1 to 4).foreach { _ =>
      val relaxed = edges.flatMap { case (a, b, len) =>
        dist.get(a).map(d => b -> (d + len))
      }
      dist = (relaxed ++ dist.toSeq).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val want = dist.toSeq.map { case (n, d) => (n, d) }
      .sortBy(t => (t._2, t._1)).take(25)
    val got = graft.operators.Mining
      .shortestPaths(spark, Sf, 8, 4, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    // the anchor itself is distance 0 and ranks first
    assert(got.head == ((src, 0L)))
  }

  test("moment profile matches the BigInt power-sum recompute") {
    val rows = Tables.events(spark, Sf)
      .select(col("event_type"),
        expr("CAST(floor(value * 10D + 0.5D) AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
    val want = rows.groupBy(_._1).toSeq.map { case (t, xs0) =>
      val xs = xs0.map(_._2)
      val n = BigInt(xs.length)
      val (s1, s2, s3, s4) = (xs.sum, xs.map(x => x * x).sum,
        xs.map(x => x * x * x).sum, xs.map(x => x * x * x * x).sum)
      val d2 = (n * s2 - s1 * s1).toDouble
      val d3 = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1).toDouble
      val d4 = (n * n * n * s4 - 4 * n * n * s1 * s3
        + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1).toDouble
      def signedMicro(v: Double): Long =
        if (v >= 0) math.floor(v * 1e6 + 0.5).toLong
        else -math.floor(-v * 1e6 + 0.5).toLong
      val mean = math.floor(s1.toDouble / n.toDouble * 1000d + 0.5).toLong
      val vr = if (d2 <= 0) 0L
        else math.floor(d2 / (n.toDouble * n.toDouble) * 100d + 0.5).toLong
      val sk = if (d2 <= 0) 0L else signedMicro(d3 / (d2 * math.sqrt(d2)))
      val ku = if (d2 <= 0) 0L else signedMicro(d4 / (d2 * d2) - 3d)
      (t, xs.length.toLong, mean, vr, sk, ku)
    }.sortBy(_._1)
    val got = Quality.momentProfile(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // the value draws are exponential-shaped: every type must read as
    // right-skewed and heavy-tailed — exactly the profile this audit is
    // for (a symmetric readout here would mean the math is wrong)
    assert(got.forall(g => g._5 > 0L && g._6 > 0L))
  }

  test("label separability matches the BigInt Welch recompute") {
    val rows = Tables.load(spark, Sf, "embeddings")
      .filter(col("label").isin(0, 1))
      .selectExpr("CAST(label AS BIGINT) AS label",
        """transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576D
           + 0.5D) AS BIGINT)) AS codes""")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val dims = rows.head._2.length
    val want = (0 until dims).map { d =>
      def sums(l: Long) = {
        val xs = rows.filter(_._1 == l).map(c => BigInt(c._2(d)))
        (BigInt(xs.length), xs.sum, xs.map(x => x * x).sum)
      }
      val (n1, s11, s21) = sums(0L)
      val (n2, s12, s22) = sums(1L)
      val num = {
        val m = s11.toDouble / n1.toDouble - s12.toDouble / n2.toDouble
        m * m
      }
      val den =
        (n1 * s21 - s11 * s11).toDouble /
          (n1.toDouble * n1.toDouble * (n1 - 1).toDouble) +
        (n2 * s22 - s12 * s12).toDouble /
          (n2.toDouble * n2.toDouble * (n2 - 1).toDouble)
      val t2 = if (n1 < 2 || n2 < 2 || den <= 0) 0L
        else math.floor(num / den * 1e6 + 0.5).toLong
      (d.toLong, n1.toLong, n2.toLong, t2)
    }
    val got = graft.operators.Similarity.labelSeparability(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // synthetic labels are independent of the embedding draw: no dim
    // should show a huge separation (t^2 far above small-sample noise)
    assert(got.map(_._4).max < 20000000L)
  }

  test("freshness audit matches the recompute; freshest type lags zero") {
    val ev = Tables.events(spark, Sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val per = ev.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).max)).toMap
    val head = per.values.map(_._2).max
    val want = per.toSeq.map { case (t, (n, last)) =>
      (t, n, last, (head - last) / 1000000L)
    }.sortBy(_._1)
    val got = graft.operators.Quality.freshnessAudit(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.map(_._4).min == 0L)
  }

  test("quantile uplift matches the in-memory per-arm percentile scan") {
    val rows = Tables.load(spark, Sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0) == "1-URGENT",
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def pcts(arm: Seq[Long]): Map[Long, Long] = {
      val sorted = arm.sorted
      val n = sorted.length.toLong
      (1 to 9).map { q =>
        val pct = q * 10L
        // smallest value whose cumulative count reaches pct% (max-rank)
        var cum = 0L
        val v = sorted.find { x => cum += 1; cum * 100 >= pct * n }.get
        pct -> v
      }.toMap
    }
    val u = pcts(rows.filter(_._1).map(_._2).toSeq)
    val o = pcts(rows.filterNot(_._1).map(_._2).toSeq)
    val want = (1 to 9).map { q =>
      val pct = q * 10L
      (pct, u(pct), o(pct), u(pct) - o(pct))
    }
    val got = graft.operators.Quality.quantileUplift(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // per-arm percentile curves are non-decreasing in the decile
    assert(got.map(_._2) == got.map(_._2).sorted)
    assert(got.map(_._3) == got.map(_._3).sorted)
  }

  test("shrunken rates lie between raw and global, match the recompute") {
    def halfUp(num: Long, den: Long): Long = (2 * num + den) / (2 * den)
    val li = Tables.load(spark, Sf, "lineitem")
      .select(col("l_partkey"), col("l_returnflag")).collect()
      .map(r => (r.getLong(0), r.getString(1) == "R"))
    val per = li.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.count(_._2).toLong)).toMap
    val nn = per.values.map(_._1).sum
    val xx = per.values.map(_._2).sum
    val k = 20L
    val want = per.toSeq.map { case (p, (n, x)) =>
      (p, n, x, halfUp(10000L * x, n),
        halfUp(10000L * (x * nn + k * xx), nn * (n + k)))
    }.sortBy(t => (-t._5, t._1)).take(50)
    val got = graft.operators.Quality.shrunkenRates(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // shrinkage pulls toward the global rate: shrunk sits between the raw
    // rate and the global rate (inclusive, modulo half-up rounding)
    val g = halfUp(10000L * xx, nn)
    got.foreach { case (_, _, _, raw, shrunk) =>
      val (lo, hi) = (math.min(raw, g) - 1, math.max(raw, g) + 1)
      assert(shrunk >= lo && shrunk <= hi)
    }
  }

  test("basket triples match the in-memory canonical-triple recompute") {
    val li = Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = scala.collection.mutable.Map[(Long, Long, Long), Long]()
      .withDefaultValue(0L)
    li.groupBy(_._1).values.foreach { rows =>
      val its = rows.map(_._2).distinct.sorted
      if (its.size >= 3 && its.size <= 8)
        for (i <- its.indices; j <- (i + 1) until its.size;
             k <- (j + 1) until its.size)
          counts((its(i), its(j), its(k))) += 1
    }
    val want = counts.toSeq.map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(25)
    val got = graft.operators.Mining.basketTriples(spark, Sf, 8, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    got.foreach { case (a, b, c, n) =>
      assert(a < b && b < c && n >= 1L)
    }
  }

  test("ab power audit matches the BigInt ratio recompute, scales with k^2") {
    val rows = Tables.events(spark, Sf)
      .select(col("event_type"),
        expr("CAST(floor(value * 10D + 0.5D) AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
    val want = rows.groupBy(_._1).toSeq.map { case (t, xs0) =>
      val xs = xs0.map(_._2)
      val n = BigInt(xs.length)
      val s1 = xs.sum
      val d2 = (n * xs.map(x => x * x).sum - s1 * s1).toDouble
      val m2 = (s1 * s1).toDouble
      (t, xs.length.toLong,
        math.ceil(156800d * d2 / m2).toLong,
        math.ceil(6272d * d2 / m2).toLong,
        math.floor(1e8 * d2 / m2 + 0.5).toLong)
    }.sortBy(_._1)
    val got = graft.operators.Quality.abPowerAudit(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // a 1% shift needs ~25x the sample of a 5% shift (exact k^2 in the
    // formula before the ceil; allow the two rounding steps one unit)
    got.foreach { case (_, _, n1, n5, _) =>
      assert(n1 >= 25 * (n5 - 1) && n1 <= 25 * n5)
    }
  }

  test("trend audit matches the in-memory Mann-Kendall + Theil-Sen recompute") {
    val daily = Tables.events(spark, Sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(expr(
        "CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    def epochDay(d: String): Long = fmt.parse(d).getTime / 86400000L
    val pairs = for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(i), daily(j))
    val s = pairs.map { case ((_, a), (_, b)) =>
      java.lang.Long.signum(b - a).toLong }.sum
    val n = daily.length.toLong
    val tie18 = daily.groupBy(_._2).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie18
    val slopes = pairs.map { case ((d1, a), (d2, b)) =>
      val dy = b - a
      val dx = epochDay(d2) - epochDay(d1)
      (dy.toDouble / dx, d1, d2, dy, dx)
    }.sortBy(t => (t._1, t._2, t._3))
    val m = slopes((((slopes.length + 1) / 2) - 1).toInt)
    val slope = if (m._4 >= 0) (20000L * m._4 + m._5) / (2L * m._5)
                else -((20000L * -m._4 + m._5) / (2L * m._5))
    val trend = if (180000L * s * s > 38416L * var18) (if (s > 0) 1L else -1L)
                else 0L
    val row = Analytics.trendAudit(spark, Sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5)) ==
      (n, pairs.length.toLong, s, var18, trend, slope))
    // the S statistic is bounded by the pair count
    assert(math.abs(row.getLong(2)) <= row.getLong(1))
  }

  test("seq pair support matches the in-memory subsequence recompute") {
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getLong(3)))
    val byUser = ev.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._3, e._4)).map(_._2).toSeq).toMap
    val nTotal = byUser.size.toLong
    // brute force: for each user timeline, the set of ordered pairs
    // (e1 strictly before e2 somewhere in the sequence)
    val pairSets = byUser.values.map { seq =>
      (for {
        i <- seq.indices
        j <- (i + 1) until seq.length
      } yield (seq(i), seq(j))).toSet
    }
    val want = pairSets.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2L)
      .toSeq.sortBy(_._1)
      .map { case ((e1, e2), n) =>
        (e1, e2, n, (20000L * n + nTotal) / (2L * nTotal)) }
    val got = Mining.seqPairSupport(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // the diagonal means "occurs at least twice": cross-check one cell
    got.filter(r => r._1 == r._2).foreach { r =>
      val direct = byUser.values.count(s => s.count(_ == r._1) >= 2).toLong
      assert(r._3 == direct)
    }
  }

  test("seasonal anomaly: dense grid, reconciled baselines, exact flags") {
    val rows = Quality.seasonalAnomaly(spark, Sf).collect()
    val nDays = rows.map(_.getString(0)).distinct.length
    assert(rows.length == nDays * 24, "grid must be dense: every day x 24 hours")
    // per-(dow, hour) totals must reconcile with the cells they cover
    val byDowHour = rows.groupBy(r => (r.getLong(2), r.getLong(1)))
    byDowHour.foreach { case ((_, _), cells) =>
      assert(cells.map(_.getLong(3)).sum == cells.head.getLong(4),
        "dh_total must equal the sum of its cells")
      assert(cells.length == cells.head.getLong(5),
        "n_days must equal the number of grid cells for that (dow, hour)")
    }
    rows.foreach { r =>
      val (n, dh, nd, hi, lo) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(hi == (if (n * nd > 2 * dh) 1L else 0L))
      assert(lo == (if (2 * n * nd < dh) 1L else 0L))
      if (dh == 0) assert(hi == 0 && lo == 0, "dead-by-design hours don't flag")
    }
  }

  test("revenue lorenz matches the in-memory rank recompute; gini in bounds") {
    val pc = Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(expr(
        "CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (u, c) => (c, u) }
    val n = pc.length.toLong
    val total = pc.map(_._2).sum
    val rankCents = pc.zipWithIndex.map { case ((_, c), i) => (i + 1L) * c }.sum
    val gini = ((2L * rankCents - (n + 1L) * total) * 10000L +
      (n * total) / 2L) / (n * total)
    val byDecile = pc.zipWithIndex
      .groupBy { case (_, i) => (10L * i) / n }
    var cum = 0L
    val want = byDecile.toSeq.sortBy(_._1).map { case (d, rows) =>
      val cs = rows.map(_._1._2).sum
      cum += cs
      (d, rows.length.toLong, cs, cum, (20000L * cum + total) / (2L * total), gini)
    }
    val got = Analytics.revenueLorenz(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(gini >= 0L && gini <= 10000L)
    // Lorenz curve is convex-ish: cumulative shares strictly increase
    assert(got.map(_._5) == got.map(_._5).sorted)
  }

  test("daily value bands match the in-memory sorted recompute") {
    val ev = Tables.events(spark, Sf)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr("CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)")
          .as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toSeq
      .map { case (day, cs) =>
        val n = cs.length
        // percentile(2c, 0.5): linear interpolation over doubled values
        val p50x2 =
          if (n % 2 == 1) 2L * cs(n / 2) else cs(n / 2 - 1) + cs(n / 2)
        val p90 = cs((9 * n + 9) / 10 - 1)
        (day, n.toLong, p50x2, p90)
      }.sortBy(_._1)
    val got = Analytics.dailyValueBands(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("ab test readout: 2x2 cells reconcile, arms partition users, chi2 exact") {
    val rows = Quality.abTestReadout(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("control", "treatment"))
    val nUsers = Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._3).sum == nUsers, "cells must partition the user set")
    // arm assignment recomputed from md5 semantics
    val want = Tables.events(spark, Sf)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .collect().map { r =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getLong(0).toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (if (md5.charAt(0) < '8') "control" else "treatment", r.getLong(1))
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (arm, conv, obs, rowTot, colTot, exp, chi2c, share) =>
      assert(obs == want((arm, conv)))
      assert(rowTot == rows.filter(_._1 == arm).map(_._3).sum)
      assert(colTot == rows.filter(_._2 == conv).map(_._3).sum)
      val n = rows.map(_._3).sum
      assert(exp == rowTot * colTot * 10000L / n)
      val d = math.abs(obs * 10000L - exp)
      assert(chi2c == d * d / (math.max(exp, 1L) * 10000L))
      assert(share == (20000L * obs + rowTot) / (2L * rowTot))
    }
  }

  test("fd discovery matches the set-based recompute") {
    val orders = Tables.load(spark, Sf, "orders")
      .select(col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
        col("o_orderstatus"), col("o_orderdate").cast("string"),
        col("o_orderpriority"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    def check(lhs: Array[String], rhs: Array[String]): (Long, Long) = {
      val pairs = lhs.zip(rhs).distinct
      (pairs.map(_._1).distinct.length.toLong, pairs.length.toLong)
    }
    val want = Seq(
      ("o_custkey->o_orderstatus",
        check(orders.map(_._2), orders.map(_._3))),
      ("o_orderdate->o_orderpriority",
        check(orders.map(_._4), orders.map(_._5))),
      ("o_orderkey->o_custkey", check(orders.map(_._1), orders.map(_._2))),
      ("o_orderkey->o_orderstatus", check(orders.map(_._1), orders.map(_._3))),
      ("o_orderstatus->o_orderpriority",
        check(orders.map(_._3), orders.map(_._5))))
      .map { case (name, (nl, np)) =>
        (name, nl, np, np - nl, if (np == nl) 1L else 0L)
      }
    val got = Quality.fdDiscovery(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // the PK dependencies must hold; the status->priority one must not
    assert(got.find(_._1 == "o_orderkey->o_custkey").get._5 == 1L)
    assert(got.find(_._1 == "o_orderstatus->o_orderpriority").get._5 == 0L)
  }

  test("fdDiscovery NULL contract: operator equals its SQL twin on nullable columns") {
    import spark.implicits._
    // countDistinct skips NULL tuples while SELECT DISTINCT keeps them —
    // the sentinel coalesce on both surfaces is what keeps them equal.
    // k=1 maps to both 'x' and NULL (violation); k=3 maps only to NULL
    // (holds); a NULL lhs is one more distinct determinant value.
    val df = Seq(
      (Option(1L), Option("x")), (Option(1L), None), (Option(1L), Option("x")),
      (Option(2L), Option("y")),
      (Option(3L), None), (Option(3L), None),
      (None, Option("z")))
      .toDF("k", "v")
    val deps = Seq(("k->v", "k", "v"))
    val op = Quality.fdDiscoveryCore(df, deps).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    df.createOrReplaceTempView("fd_null_fixture")
    val twin = spark.sql(Quality.fdDiscoverySqlFor("fd_null_fixture", deps))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(op == twin, "operator and SQL twin must agree on nullable input")
    // spot values: 4 distinct lhs (1,2,3,<null>), 5 distinct pairs
    assert(op == Seq(("k->v", 4L, 5L, 1L, 0L)))
  }

  private def dailyFixture(): Seq[(java.time.LocalDate, Long, Long)] =
    spark.read.parquet(s"$Sf/events.parquet")
      .select(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("value")).collect()
      .map { r =>
        val day = r.get(0) match {
          case t: java.sql.Timestamp =>
            t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
          case ldt: java.time.LocalDateTime => ldt.toLocalDate
        }
        (day, math.floor(r.getDouble(1) * 100 + 0.5).toLong)
      }
      .groupBy(_._1).map { case (d, xs) =>
        (d, xs.size.toLong, xs.map(_._2).sum)
      }.toSeq.sortBy(_._1.toString)

  test("theil-sen trend equals a driver-side median-of-slopes recompute") {
    val daily = dailyFixture().map { case (d, _, cents) => (d, cents) }
    val pairs = for {
      (da, va) <- daily; (db, vb) <- daily
      if da.isBefore(db)
    } yield (vb - va, java.time.temporal.ChronoUnit.DAYS.between(da, db), da)
    // the operator's exact order: slope double, then num, den, da
    val sorted = pairs.sortBy { case (num, den, da) =>
      (num.toDouble / den.toDouble, num, den, da.toString)
    }
    val n = sorted.length
    val (num, den, _) = sorted((n + 1) / 2 - 1)
    val slope = (num * 1000000L - (num * 1000000L) % den) / den
    val row = graft.operators.Analytics.theilSenTrend(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2)) ==
      (den, n.toLong, slope))
  }

  test("mann-whitney U equals a driver-side midrank recompute; U_u + U_o = n_u*n_o") {
    val vals = spark.read.parquet(s"$Sf/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_orderpriority"),
        org.apache.spark.sql.functions.col("o_totalprice")).collect()
      .map(r => (r.getString(0) == "1-URGENT",
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val byVal = vals.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (v, xs) =>
        (v, xs.count(_._1).toLong, xs.count(!_._1).toLong)
      }
    var below = 0L
    var r2u = BigInt(0)
    var tcorr = BigInt(0)
    byVal.foreach { case (_, cu, co) =>
      val t = cu + co
      r2u += BigInt(cu) * (2 * below + t + 1)
      tcorr += BigInt(t) * t * t - t
      below += t
    }
    val nu = vals.count(_._1).toLong
    val no = vals.count(!_._1).toLong
    val u2 = r2u - BigInt(nu) * (nu + 1)
    // rank-sum identity: U_u + U_o == n_u * n_o (in x2 units: sum of both
    // arms' u2 equals 2 * nu * no)
    var r2o = BigInt(0)
    below = 0L
    byVal.foreach { case (_, cu, co) =>
      val t = cu + co
      r2o += BigInt(co) * (2 * below + t + 1)
      below += t
    }
    assert(u2 + (r2o - BigInt(no) * (no + 1)) == BigInt(2) * nu * no)
    val nn = nu + no
    val inner = nu.toDouble * no.toDouble *
      ((nn + 1).toDouble - tcorr.toDouble / (nn.toDouble * (nn - 1).toDouble)) / 12d
    val num = (u2 - BigInt(nu) * no).toDouble
    val z =
      if (inner <= 0) 0L
      else if (num >= 0) math.floor(num / (2 * math.sqrt(inner)) * 1e6 + 0.5).toLong
      else -math.floor(-num / (2 * math.sqrt(inner)) * 1e6 + 0.5).toLong
    val row = Quality.mannWhitneyValue(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3)) == (nu, no, u2.toLong, z))
  }

  test("poisson bootstrap CI equals a driver-side deterministic recompute; CI brackets the total") {
    val b = 200
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def md5hex8(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val thresholds = Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
      "ff1025f5", "ffd90f3b", "fffa8b71", "ffff540c")
    def weight(h: String): Long = {
      val i = thresholds.indexWhere(t => h < t)
      if (i < 0) 8L else i.toLong
    }
    var wsum = 0L
    val totals = (0 until b).map { rep =>
      val t = orders.map { case (k, cents) =>
        val wv = weight(md5hex8(s"$k:$rep"))
        wsum += wv
        wv * cents
      }.sum
      (rep.toLong, t)
    }
    // the Poisson(1) kernel really has unit mean on this fixture
    val meanW = wsum.toDouble / (orders.length.toLong * b)
    assert(math.abs(meanW - 1.0) < 0.01, s"poisson mean drifted: $meanW")
    val sorted = totals.sortBy(x => (x._2, x._1)).map(_._2)
    def bound(pctPerMille: Int): Long =
      sorted.zipWithIndex.collectFirst {
        case (t, i) if (i + 1) * 1000 >= pctPerMille * b => t
      }.get
    val trueTotal = orders.map(_._2).sum
    val row = Quality.bootstrapRevenueCi(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3), row.head.getLong(4)) ==
      (orders.length.toLong, trueTotal, bound(25), bound(975), b.toLong))
    assert(row.head.getLong(2) <= trueTotal && trueTotal <= row.head.getLong(3),
      "the 95% CI must bracket the true total on this fixture")
    // merge == rescan: per-replicate totals are sums of deterministic
    // per-row terms, so the sliced union re-sum is bit-identical
    val inc = Quality.bootstrapRevenueCiIncremental(spark, Sf).collect()
    assert(inc.toSeq == row.toSeq,
      "incremental (prefix + delta partials) must equal the one-shot scan")
  }

  test("kendall tau-b equals a driver-side pair census") {
    val daily = dailyFixture()
    var (c, d, tx, ty, n0) = (0L, 0L, 0L, 0L, 0L)
    for (i <- daily.indices; j <- daily.indices if i < j) {
      val (_, xa, ya) = daily(i); val (_, xb, yb) = daily(j)
      n0 += 1
      if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) c += 1
      else if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) d += 1
      if (xa == xb) tx += 1
      if (ya == yb) ty += 1
    }
    val tau =
      if (n0 == tx || n0 == ty) 0L
      else {
        val den = math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble)
        if (c >= d) math.floor((c - d).toDouble / den * 1e6 + 0.5).toLong
        else -math.floor((d - c).toDouble / den * 1e6 + 0.5).toLong
      }
    val row = graft.operators.Analytics.kendallTauDaily(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3), row.head.getLong(4), row.head.getLong(5)) ==
      (n0, c, d, tx, ty, tau))
  }

  test("closeness centrality equals a driver-side panel BFS") {
    val inc = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct
    val adj = inc.groupBy(_._1).values.toSeq
      .filter(_.size <= 8) // the whale-basket guard
      .flatMap { rows =>
        val its = rows.map(_._2).distinct
        for (x <- its; y <- its if x != y) yield (x, y)
      }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    val srcs = adj.keySet.toSeq.sorted.take(8)
    val want = srcs.map { src =>
      var dist = Map(src -> 0L); var frontier = Set(src); var hop = 0L
      while (hop < 4 && frontier.nonEmpty) {
        hop += 1
        val next = frontier.flatMap(adj(_)) -- dist.keySet
        next.foreach(n => dist += n -> hop)
        frontier = next
      }
      val reached = (dist.size - 1).toLong
      val sumd = dist.values.sum
      val closeness = if (sumd == 0) 0L else reached * 1000000L / sumd
      val harmonic = dist.values.filter(_ > 0).map(1000000L / _).sum
      (src, reached, sumd, closeness, harmonic)
    }
    val got = graft.operators.Mining
      .closenessCentrality(spark, Sf, maxItems = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // a panel source reaches at least its own neighbors
    got.zip(srcs).foreach { case ((_, reached, _, _, _), src) =>
      assert(reached >= adj(src).size)
    }
  }

  test("spearman equals a driver-side doubled-average-rank recompute") {
    val daily = dailyFixture()
    val n = daily.size.toLong
    val xs = daily.map(_._2); val ys = daily.map(_._3)
    // doubled average rank of v among vs: 2*(#smaller) + (#tied) + 1
    def dr(vs: Seq[Long], v: Long): Long =
      2L * vs.count(_ < v) + vs.count(_ == v) + 1L
    var (sx, sy, sxx, syy, sxy) = (0L, 0L, 0L, 0L, 0L)
    daily.foreach { case (_, x, y) =>
      val rx = dr(xs, x); val ry = dr(ys, y)
      sx += rx; sy += ry; sxx += rx * rx; syy += ry * ry; sxy += rx * ry
    }
    val (dxy, dxx, dyy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
    val rho =
      if (n < 2 || dxx == 0L || dyy == 0L) 0L
      else {
        val den = math.sqrt(dxx.toDouble) * math.sqrt(dyy.toDouble)
        if (dxy >= 0) math.floor(dxy.toDouble / den * 1e6 + 0.5).toLong
        else -math.floor(-dxy.toDouble / den * 1e6 + 0.5).toLong
      }
    val row = graft.operators.Analytics.spearmanDaily(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3), row.head.getLong(4)) == (n, dxy, dxx, dyy, rho))
    // a rank-based rho must live in micro bounds
    assert(math.abs(rho) <= 1000000L)
  }

  test("seasonal mann-kendall equals a driver-side per-weekday census") {
    val dv = dailyFixture().map(t => (t._1, t._3)) // (day, cents), day-sorted
    val bySeason = dv.groupBy(_._1.getDayOfWeek.getValue % 7) // 0 = Sunday
    var (sStat, nPairs) = (0L, 0L)
    bySeason.values.foreach { days =>
      val seq = days.sortBy(_._1.toString)
      for (i <- seq.indices; j <- seq.indices if i < j) {
        nPairs += 1
        sStat += java.lang.Long.signum(seq(j)._2 - seq(i)._2)
      }
    }
    val var18n = bySeason.values.map { days =>
      val m = days.size.toLong; m * (m - 1) * (2 * m + 5)
    }.sum
    val var18t = dv.groupBy(d => (d._1.getDayOfWeek.getValue % 7, d._2))
      .values.map { g => val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }.sum
    val var18 = var18n - var18t
    val z =
      if (var18 <= 0L || sStat == 0L) 0L
      else {
        val den = math.sqrt(var18.toDouble / 18.0)
        if (sStat > 0) math.floor((sStat - 1).toDouble / den * 1e6 + 0.5).toLong
        else -math.floor((-sStat - 1).toDouble / den * 1e6 + 0.5).toLong
      }
    val row = graft.operators.Analytics.mannKendallSeasonal(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3)) == (sStat, nPairs, var18, z))
  }

  test("siegel repeated-median slope equals a driver-side recompute") {
    val dv = dailyFixture().map(t => (t._1, t._3)) // (day, cents), day-sorted
    // inner: per day i, the lower-median slope to every other day j
    val inner = dv.map { case (di, vi) =>
      val slopes = dv.filter(_._1 != di).map { case (dj, vj) =>
        val num = vj - vi
        val den = java.time.temporal.ChronoUnit.DAYS.between(di, dj)
        (num.toDouble / den.toDouble, num, den, dj.toString)
      }.sortBy(identity)
      val m = slopes((slopes.size + 1) / 2 - 1)
      (m._1, m._2, m._3, di.toString)
    }.sortBy(identity)
    // outer: the lower median of the per-day medians
    val n = inner.size.toLong
    val (_, num, den, day) = inner(((n + 1) / 2 - 1).toInt)
    val slope1e6 = {
      val x = num * 1000000L
      (x - x % den) / den
    }
    val row = graft.operators.Analytics.siegelSlope(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getDate(0).toString, row.head.getLong(1),
      row.head.getLong(2)) == (day, n, slope1e6))
  }

  test("qn scale estimator equals a driver-side pairwise-gap recompute") {
    val dv = dailyFixture().map(t => (t._1, t._3)) // (day, cents), day-sorted
    val gaps = (for {
      i <- dv.indices; j <- dv.indices
      if dv(i)._1.isBefore(dv(j)._1)
    } yield (math.abs(dv(j)._2 - dv(i)._2), dv(i)._1.toString, dv(j)._1.toString))
      .sortBy(identity)
    val n = dv.size.toLong
    val h = n / 2 + 1
    val k = h * (h - 1) / 2
    val g = gaps((k - 1).toInt)._1
    val row = graft.operators.Quality.qnScaleValue(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3)) == (n, k, g, g * 221914L))
    // Qn is a gap order statistic: bounded by the extreme daily spread
    assert(g >= 0 && g <= dv.map(_._2).max - dv.map(_._2).min)
  }

  test("wilcoxon signed-rank equals a driver-side paired recompute") {
    val dv = dailyFixture().map(t => (t._1, t._3)) // (day, cents), day-sorted
    val epoch = java.time.LocalDate.of(1970, 1, 5) // a Monday
    val keyed = dv.map { case (day, v) =>
      val ed = java.time.temporal.ChronoUnit.DAYS.between(epoch, day)
      ((if (ed >= 0) ed / 7 else -((-ed + 6) / 7), ((ed % 7) + 7) % 7), v)
    }.toMap
    val diffs = keyed.flatMap { case ((week, dow), v1) =>
      keyed.get((week + 1, dow)).map(v2 => v2 - v1)
    }.filter(_ != 0L).toSeq
    val ads = diffs.map(math.abs)
    def r2(ad: Long): Long = 2L * ads.count(_ < ad) + ads.count(_ == ad) + 1L
    val n = diffs.size.toLong
    val w2 = diffs.filter(_ > 0).map(d => r2(math.abs(d))).sum
    val tie3 = ads.distinct.map { ad =>
      val t = ads.count(_ == ad).toLong; t * t * t - t
    }.sum
    val num = 2 * w2 - n * (n + 1)
    val var48 = 2 * n * (n + 1) * (2 * n + 1) - tie3
    val z =
      if (var48 <= 0 || num == 0) 0L
      else {
        val mag = math.max(math.abs(num) - 2, 0L).toDouble
        val v = math.floor(mag * math.sqrt(3.0) / math.sqrt(var48.toDouble)
          * 1e6 + 0.5).toLong
        if (num > 0) v else -v
      }
    val row = graft.operators.Quality.wilcoxonSignedRank(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3), row.head.getLong(4)) == (n, w2, num, var48, z))
    assert(n > 0, "fixture must produce week-over-week pairs")
  }

  test("runs test equals a driver-side up/down streak census") {
    val dv = dailyFixture().map(_._3) // cents, day-sorted
    val signs = dv.zip(dv.tail).map { case (a, b) => b - a }
      .filter(_ != 0L).map(d => if (d > 0) 1L else -1L)
    val nP = signs.count(_ == 1L).toLong
    val nM = signs.count(_ == -1L).toLong
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.zip(signs.tail).count { case (a, b) => a != b }.toLong
    val n = nP + nM
    val z =
      if (nP == 0 || nM == 0 || n < 2) 0L
      else {
        val num = (runs * n - 2 * nP * nM - n).toDouble
        val den = math.sqrt(
          2.0 * nP * nM * (2.0 * nP * nM - n) / (n - 1).toDouble)
        math.floor(num / den * 1e6 + 0.5).toLong
      }
    val row = graft.operators.Analytics.runsTestDaily(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3)) == (nP, nM, runs, z))
    assert(runs >= 1 && runs <= n, "runs count must be a valid streak census")
  }

  test("ljung-box equals a driver-side recompute from the specced acf") {
    val acf = graft.operators.Analytics.acfDailyValue(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val n = dailyFixture().size.toLong
    val q =
      if (n <= 7) 0L
      else {
        var terms = 0.0
        for (k <- 1 to 7) { // same left-to-right order as the expression
          val r = acf(k.toLong).toDouble
          terms += r * r / (1e12 * (n - k).toDouble)
        }
        math.floor(n.toDouble * (n + 2).toDouble * terms * 1e6 + 0.5).toLong
      }
    val row = graft.operators.Analytics.ljungBoxDaily(spark, Sf).collect()
    assert(row.length == 1)
    assert(row.head.getLong(0) == n)
    assert(row.head.getLong(1) == 7L)
    (1 to 7).foreach(k => assert(row.head.getLong(1 + k) == acf(k.toLong)))
    assert(row.head.getLong(9) == q)
    assert(q >= 0L, "Q is a sum of squares scaled by positive factors")
  }

  test("pacf equals a driver-side durbin-levinson recompute") {
    val acf = graft.operators.Analytics.acfDailyValue(spark, Sf).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(2)).toMap
    val r = (1 to 7).map(k => acf(k).toDouble / 1e6)
    // the recursion in the exact step order the shared expressions use
    var phi = Map(1 -> Map(1 -> r(0)))
    for (k <- 2 to 7) {
      var num = 0.0; var den = 0.0
      for (j <- 1 until k) num += phi(k - 1)(j) * r(k - j - 1)
      for (j <- 1 until k) den += phi(k - 1)(j) * r(j - 1)
      val pkk = if (math.abs(1.0 - den) < 1e-12) 0.0
        else (r(k - 1) - num) / (1.0 - den)
      var level = Map(k -> pkk)
      for (j <- 1 until k)
        level += j -> (phi(k - 1)(j) - pkk * phi(k - 1)(k - j))
      phi += k -> level
    }
    val want = (1 to 7).map { k =>
      val p = phi(k)(k)
      val m = if (p >= 0) math.floor(p * 1e6 + 0.5).toLong
        else -math.floor(-p * 1e6 + 0.5).toLong
      (k.toLong, m)
    }
    val got = graft.operators.Analytics.pacfDaily(spark, Sf).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1))).toSeq
    assert(got == want)
    // pacf at lag 1 IS the acf at lag 1
    assert(got.head._2 == acf(1))
  }

  test("seasonal decomposition equals a driver-side recompute and closes the identity") {
    val dv = dailyFixture().map(t => (t._1, t._3)) // (day, cents), day-sorted
    // the ±3 window is over OBSERVED days (row frame, gap-blind — the
    // operator's documented contract; densify first if gaps matter)
    val full = dv.indices.filter(i => i >= 3 && i < dv.size - 3)
    val rows = full.map { i =>
      val sum7 = (i - 3 to i + 3).map(dv(_)._2).sum
      val (day, v) = dv(i)
      (day, v, sum7, 7 * v - sum7, day.getDayOfWeek.getValue % 7)
    }
    val seasonal = rows.groupBy(_._5).map { case (dow, rs) =>
      val sd = rs.map(_._4).sum; val n = rs.size.toLong
      dow -> (if (sd >= 0) sd * 1000 / (7 * n) else -((-sd) * 1000 / (7 * n)))
    }
    val want = rows.map { case (day, v, sum7, _, dow) =>
      val trend = sum7 * 1000 / 7
      val seas = seasonal(dow)
      (day.toString, v, trend, seas, 1000 * v - trend - seas)
    }
    val got = graft.operators.Analytics.seasonalDecompose(spark, Sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // the additive identity closes exactly on every row
    got.foreach { case (_, v, t, s2, res) => assert(1000 * v == t + s2 + res) }
  }

  test("bot likeness equals a driver-side per-user timing census") {
    val ev = graft.sources.Tables.events(spark, Sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS t_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.map { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val gaps = sorted.map(_._4).zip(sorted.map(_._4).tail)
        .map { case (a, b) => b - a }
      val n = rows.size.toLong
      val nPur = rows.count(_._3 == "purchase").toLong
      val k = gaps.size.toLong
      val sg = gaps.sum
      val sg2 = gaps.map(g => BigInt(g) * BigInt(g)).sum
      val meanMs = if (k > 0) sg / (k * 1000) else 0L
      val regular = if (k >= 5 && sg > 0 &&
        100 * (BigInt(k) * sg2 - BigInt(sg) * BigInt(sg)) <
          BigInt(sg) * BigInt(sg)) 1L else 0L
      val rate = if (k > 0 && sg < k * 60000000L) 1L else 0L
      val noPur = if (nPur == 0) 1L else 0L
      (uid, n, nPur, k, meanMs, regular, rate, noPur,
        regular + rate + noPur)
    }.filter(_._2 >= 10).sortBy(_._1)
    val got = graft.operators.Analytics.botLikeness(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toSeq
    assert(got == want)
    // score decomposes into its flags on every row
    got.foreach { case (_, _, _, _, _, a, b, c, s2) => assert(s2 == a + b + c) }
  }

  test("mcnemar equals a driver-side paired-conversion census") {
    val epoch = java.time.LocalDate.of(1970, 1, 5)
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id", "event_type", "ts").collect()
      .map { r =>
        val day = r.get(2) match {
          case t: java.sql.Timestamp =>
            t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
          case ldt: java.time.LocalDateTime => ldt.toLocalDate
        }
        (r.getLong(0), r.getString(1),
          java.time.temporal.ChronoUnit.DAYS.between(epoch, day))
      }
    val lo = ev.map(_._3).min; val hi = ev.map(_._3).max
    // .values.toSeq first: mapping a Map to Tuple2s would re-form a map
    // and silently dedup equal (early, late) profiles
    val perUser = ev.groupBy(_._1).values.toSeq.map { rows =>
      (rows.exists(e => e._2 == "purchase" && 2 * e._3 <= lo + hi),
        rows.exists(e => e._2 == "purchase" && 2 * e._3 > lo + hi))
    }
    val both = perUser.count(p => p._1 && p._2).toLong
    val neither = perUser.count(p => !p._1 && !p._2).toLong
    val b = perUser.count(p => p._1 && !p._2).toLong
    val c = perUser.count(p => !p._1 && p._2).toLong
    val chi2 = if (b + c == 0) 0L
      else (math.abs(b - c) - 1) * (math.abs(b - c) - 1) * 1000000L / (b + c)
    val row = graft.operators.Quality.mcnemarConversion(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3), row.head.getLong(4)) == (both, neither, b, c, chi2))
    assert(both + neither + b + c ==
      ev.map(_._1).distinct.length.toLong, "2x2 cells partition the users")
  }

  test("hodges-lehmann equals a driver-side walsh-average median") {
    val dv = dailyFixture().map(t => (t._1, t._3)) // (day, cents), day-sorted
    val walsh = (for {
      i <- dv.indices; j <- dv.indices
      if !dv(i)._1.isAfter(dv(j)._1)
    } yield (dv(i)._2 + dv(j)._2, dv(i)._1.toString, dv(j)._1.toString))
      .sortBy(identity)
    val m = walsh.size.toLong
    val w = walsh(((m + 1) / 2 - 1).toInt)._1
    val row = graft.operators.Quality.hodgesLehmannValue(spark, Sf).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2)) ==
      (m, w, w * 500L))
    // the pseudo-median must sit inside the daily-total range (doubled)
    assert(w >= 2 * dv.map(_._2).min && w <= 2 * dv.map(_._2).max)
  }
}
