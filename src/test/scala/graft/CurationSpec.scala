package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Layout, TextAnalysis}
import graft.operators.Dedup

/** Invariant checks for the curation passes (decontamination, sequence
  * packing, stratified split) and the z-order layout audit. Cell-exact
  * cross-engine equality is the driver's DuckDB gate + SqlFrontDoorSpec;
  * these pin the semantic contracts.
  */
class CurationSpec extends SparkTestBase {

  test("decontaminate: flags only non-eval docs, every flag has a real overlap") {
    val out = Curation.decontaminate(spark, Sf).collect()
    assert(out.nonEmpty) // the fixture does contain planted-by-chance overlaps
    assert(out.forall(_.getAs[Long]("doc_id") % 97 != 0),
      "eval docs must never be flagged against themselves")
    assert(out.forall(_.getAs[Long]("n_overlap_ngrams") >= 1))
    assert(out.forall(r => r.getAs[Long]("n_eval_docs") >= 1 &&
      r.getAs[Long]("n_eval_docs") <= r.getAs[Long]("n_overlap_ngrams") * 6))
  }

  test("contamination report: covers every source, reconciles with the flag set") {
    val rep = Curation.contaminationReport(spark, Sf).collect()
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val nonEval = docs.filter(expr("doc_id % 97 <> 0")).count()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == nonEval)
    assert(rep.map(_.getAs[Long]("n_contaminated")).sum ==
      Curation.decontaminate(spark, Sf).count())
    rep.foreach(r => assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_docs")))
  }

  test("dup cluster sizes: histogram mass equals clustered docs, min size 2") {
    val hist = Dedup.dupClusterSizes(spark, Sf).collect()
    assert(hist.forall(_.getAs[Long]("cluster_size") >= 2),
      "a cluster needs at least one near-dup pair")
    val docsInClusters = hist.map(r =>
      r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")).sum
    assert(docsInClusters == Dedup.dupClusters(spark, Sf).count())
  }

  test("pack sequences: token mass conserves and doc spans are disjoint per source") {
    val out = Curation.packSequences(spark, Sf)
    val bySource = out.groupBy("source")
      .agg(sum("seq_tokens").as("packed"), max("seq_id").as("max_seq"),
        count(lit(1)).as("n_seqs")).collect()
    val totals = spark.read.parquet(s"$Sf/documents.parquet")
      .groupBy("source")
      .agg(sum(expr(s"size(${TextAnalysis.TokensExpr})")).as("total"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("total")).toMap
    bySource.foreach { r =>
      assert(r.getAs[Long]("packed") == totals(r.getAs[String]("source")),
        s"token mass must conserve for ${r.getAs[String]("source")}")
      // seq ids are dense 0..max: a doc starts in every budget-sized chunk
      // of the stream except possibly beyond the last token
      assert(r.getAs[Long]("max_seq") == r.getAs[Long]("n_seqs") - 1)
    }
    // doc id ranges of consecutive sequences never overlap (concat order)
    val rows = out.orderBy("source", "seq_id").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getAs[String]("source") == b.getAs[String]("source") =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
  }

  test("incremental packing: offset-continued delta merges to the from-scratch answer") {
    val full = Curation.packSequences(spark, Sf).collect().toSeq
    val maxId = spark.read.parquet(s"$Sf/documents.parquet")
      .agg(max("doc_id")).head().getLong(0)
    val split = maxId * 4 / 5
    val merged = Curation.mergePacked(
      Curation.packSequencesSlice(spark, Sf, 512, 0L, split),
      Curation.packSequencesSlice(spark, Sf, 512, split, Long.MaxValue,
        Some(Curation.packOffsets(spark, Sf, split)))).collect().toSeq
    assert(merged == full)
    // the split genuinely lands mid-sequence somewhere, or the merge
    // proved nothing
    val prefix = Curation.packSequencesSlice(spark, Sf, 512, 0L, split)
      .count()
    val delta = Curation.packSequencesSlice(spark, Sf, 512, split, Long.MaxValue,
      Some(Curation.packOffsets(spark, Sf, split))).count()
    assert(prefix + delta > full.size, "no boundary sequence was shared")
  }

  test("stratified split: partitions every doc, realized shares near the targets") {
    val out = Curation.stratifiedSplit(spark, Sf).collect()
    val splits = out.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")))
    val nDocs = out.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == spark.read.parquet(s"$Sf/documents.parquet").count())
    val train = out.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("n_docs")).sum
    assert(train >= nDocs * 7 / 10 && train <= nDocs * 9 / 10,
      s"global train share off: $train of $nDocs")
    // per-source shares sum to exactly 1 up to the half-up rounding of
    // each term (<= 3 splits x 1 ulp of 1e-4)
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val share = rs.map(_.getAs[Long]("share_1e4")).sum
      assert(share >= 9998 && share <= 10002)
    }
  }

  test("apportionment: allocations sum EXACTLY to the budget, within 1 of proportional") {
    val out = Curation.apportionBudget(spark, Sf).collect()
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    val budget = (total - total % 3) / 3
    assert(out.map(_.getAs[Long]("alloc_tokens")).sum == budget,
      "largest-remainder apportionment must hit the budget exactly")
    out.foreach { r =>
      val alloc = r.getAs[Long]("alloc_tokens")
      val base = r.getAs[Long]("base_tokens")
      assert(alloc == base || alloc == base + 1)
      // quota property: base = floor(budget * share)
      val q = BigInt(budget) * BigInt(r.getAs[Long]("n_tokens"))
      assert(BigInt(base) == q / BigInt(total))
    }
  }

  test("threshold sweep: monotone non-increasing, endpoints match single-threshold runs") {
    val out = Dedup.thresholdSweep(spark, Sf).collect()
      .map(r => (r.getAs[Long]("threshold_1e4"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs_dropped")))
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1)
        assert(a._2 >= b._2, "pair count must fall as the threshold rises")
        assert(a._3 >= b._3, "dropped-doc count must fall as the threshold rises")
      case _ =>
    }
    // the 5000 grid point is exactly the standard 0.5-threshold dedup run
    val at5000 = out.find(_._1 == 5000L).get
    assert(at5000._2 == Dedup.minHashLsh(spark, Sf, threshold = 0.5).count())
  }

  test("quality calibration: bounded-domain CDF ranks equal a direct window percent_rank") {
    import org.apache.spark.sql.expressions.Window
    val out = TextAnalysis.calibrateQuality(spark, Sf)
    // independent reference: the single-partition-per-source window form
    // the operator deliberately avoids at scale
    val w = Window.partitionBy("source").orderBy("quality_1e4")
    val wn = Window.partitionBy("source")
    val ref = out.select("doc_id", "source", "quality_1e4")
      .withColumn("rk", rank().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("expected", expr(
        "CASE WHEN n = 1 THEN CAST(0 AS BIGINT) ELSE (20000 * (rk - 1) + (n - 1)) DIV (2 * (n - 1)) END"))
      .select("doc_id", "expected")
    val joined = out.join(ref, "doc_id")
    assert(joined.filter(col("pct_rank_1e4") =!= col("expected")).count() == 0)
    assert(out.count() > 0)
    // the corpus-side probe join must be broadcast (the CDF is bounded)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "CDF join-back must broadcast")
  }

  test("quantile normalization: per-source multiset equals pooled quantile draw") {
    val out = TextAnalysis.quantileNormalize(spark, Sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // independent recompute: pooled sorted values, per-source max-ranks
    val pooledSorted = rows.map(_._3).sorted
    val n = pooledSorted.length.toLong
    rows.groupBy(_._2).foreach { case (_, src) =>
      val ns = src.length.toLong
      val sortedQ = src.map(_._3).sorted
      src.foreach { case (_, _, q, pooled) =>
        val cum = sortedQ.count(_ <= q).toLong // max-rank on ties
        val tr = (cum * n + ns - 1) / ns
        assert(pooled == pooledSorted((tr - 1).toInt),
          s"pooled value must be the target-rank-th smallest pooled score")
      }
      // monotone within source: higher raw score never maps lower
      val bySorted = src.sortBy(r => (r._3, r._1))
      bySorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4)
        case _ =>
      }
      // the top doc of every source reaches the pooled maximum
      assert(bySorted.last._4 == pooledSorted.last)
    }
    // corpus-side join-back must broadcast the catalog-sized mapping;
    // the only BNLJ allowed is the 1-row n_total cross join — a RANGE-
    // conditioned BNLJ would mean the interval join crept back in (the
    // cells x scores quadratic the merge window exists to avoid)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "mapping join-back must broadcast")
    val intervalBnlj = plan.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains(">="))
    assert(!intervalBnlj,
      s"the anchors/probes merge must not be an interval join:\n$plan")
  }

  test("length-filter impact: monotone, lowest cutoff covers every non-empty doc") {
    val out = TextAnalysis.lengthFilterImpact(spark, Sf).collect()
      .map(r => (r.getAs[Long]("min_tokens"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens")))
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1 && a._2 >= b._2 && a._3 >= b._3)
      case _ =>
    }
    val nonEmpty = spark.read.parquet(s"$Sf/documents.parquet")
      .withColumn("n", expr(s"size(${TextAnalysis.TokensExpr})"))
      .filter(col("n") >= 1)
    assert(out.head._1 == 1L)
    assert(out.head._2 == nonEmpty.count())
  }

  test("boilerplate: covers every shingled doc, mass reconciles with shingle dfs") {
    val out = TextAnalysis.boilerplate(spark, Sf)
    val rows = out.collect()
    val shingled = spark.read.parquet(s"$Sf/documents.parquet")
      .withColumn("ws", expr(TextAnalysis.TokensExpr))
      .filter(expr("size(ws) >= 3")).count()
    assert(rows.length == shingled, "one row per shingled doc, zero-boiler docs included")
    assert(rows.forall(r => r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_sh")))
    assert(rows.forall(r => r.getAs[Long]("boiler_1e4") <= 10000))
    // total boilerplate mass == sum of df over the boiler shingle set,
    // recomputed independently
    val ex = spark.read.parquet(s"$Sf/documents.parquet")
      .withColumn("ws", expr(TextAnalysis.TokensExpr))
      .filter(expr("size(ws) >= 3"))
      .withColumn("sh", expr(Dedup.ShinglesExpr))
      .select(explode(col("sh")).as("shingle"))
    val dfs = ex.groupBy("shingle").count()
    val expected = dfs.filter(col("count") * 100 >= lit(shingled))
      .agg(sum("count")).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_boiler")).sum == expected)
  }

  test("zorder write: real files carry tight min/max on BOTH keys") {
    val out = tmpDir("graft-zorder")
    Layout.zorderWrite(spark, Sf, out)
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val total = li.count()
    val gp = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    val (mnp, mxp, mns, mxs) =
      (gp.getLong(0), gp.getLong(1), gp.getLong(2), gp.getLong(3))
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length >= 8, s"expected a multi-file layout, got ${files.length}")
    var written = 0L
    val spans = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
      val r = d.agg(count(lit(1)), min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head()
      written += r.getLong(0)
      (1.0 * (r.getLong(2) - r.getLong(1)) / math.max(mxp - mnp, 1),
        1.0 * (r.getLong(4) - r.getLong(3)) / math.max(mxs - mns, 1))
    }
    assert(written == total, "the rewrite must preserve every row")
    // mean per-file span tight on BOTH dims at once — the property a
    // single-column sort cannot provide (its second dim sits near 1.0)
    val meanPart = spans.map(_._1).sum / spans.length
    val meanSupp = spans.map(_._2).sum / spans.length
    assert(meanPart <= 0.5, s"partkey spans too wide: $meanPart")
    assert(meanSupp <= 0.5, s"suppkey spans too wide: $meanSupp")
  }

  test("keep-best: one survivor per cluster, quality argmax, full corpus") {
    import org.apache.spark.sql.functions.col
    val rows = Curation.keepBestPerCluster(spark, Sf).collect()
    val corpus = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(rows.length.toLong == corpus, "every doc must get a retention decision")
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (c, rs) =>
      assert(rs.count(_.getAs[Boolean]("kept")) == 1,
        s"cluster $c must keep exactly one doc")
      assert(rs.forall(_.getAs[Long]("cluster_size") == rs.length),
        s"cluster $c size mismatch")
      // the keeper is the quality argmax (nulls last, doc_id tiebreak)
      val keeper = rs.find(_.getAs[Boolean]("kept")).get
      val key = (r: org.apache.spark.sql.Row) =>
        (Option(r.getAs[java.lang.Long]("quality_1e4")).map(-_.longValue)
          .getOrElse(Long.MaxValue), r.getAs[Long]("doc_id"))
      assert(rs.minBy(key) == keeper, s"cluster $c kept a non-argmax doc")
    }
    // the clustering must actually group something, and singletons must
    // self-label (cluster_id == doc_id, trivially kept)
    assert(byCluster.values.exists(_.length > 1), "fixture should have dup clusters")
    rows.filter(_.getAs[Long]("cluster_size") == 1L).take(5).foreach { r =>
      assert(r.getAs[Long]("cluster_id") == r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("kept"))
    }
    // quality-aware retention differs from keep-smallest-id somewhere
    // (otherwise the operator adds nothing over q_dup_clusters)
    val quality = Curation.keepBestPerCluster(spark, Sf)
      .filter(col("kept") && col("cluster_size") > 1)
      .collect().map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("doc_id")))
    assert(quality.exists { case (c, d) => c != d },
      "some multi-doc cluster should keep a doc other than the min-id label")
  }

  test("zorder cells: partition the table and bound BOTH key spans") {
    val out = Layout.zorderCells(spark, Sf).collect()
    assert(out.length == 16) // 4x4 grid from the top 4 z bits
    val total = out.map(_.getAs[Long]("n_rows")).sum
    assert(total == spark.read.parquet(s"$Sf/lineitem.parquet").count())
    // the z-order contract: every cell is narrow in BOTH dimensions at
    // once (a single-column sort would leave the other dim at ~10000)
    out.foreach { r =>
      assert(r.getAs[Long]("part_span_1e4") <= 3000,
        s"cell ${r.getAs[Long]("z_cell")} too wide on partkey")
      assert(r.getAs[Long]("supp_span_1e4") <= 3000,
        s"cell ${r.getAs[Long]("z_cell")} too wide on suppkey")
    }
  }

  test("pack efficiency reconciles with the packed-sequence table") {
    val seqs = Curation.packSequences(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val finals = seqs.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = seqs.groupBy(_._1).toSeq.map { case (src, rows) =>
      val fin = finals(src)
      val n = rows.length.toLong
      val tot = rows.map(_._3).sum
      (src, n, tot,
        rows.count(_._3 > 512L).toLong,
        rows.count(r => r._3 < 512L && r._2 != fin).toLong,
        rows.filter(_._2 != fin).map(r => math.max(0L, 512L - r._3)).sum,
        (20000L * tot + n * 512L) / (2L * n * 512L))
    }.sortBy(_._1)
    val got = Curation.packEfficiency(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    // token mass conservation against the corpus
    val corpusTokens = graft.sources.Tables.load(spark, Sf, "documents")
      .selectExpr(s"CAST(size(${TextAnalysis.TokensExpr}) AS BIGINT) AS n")
      .collect().map(_.getLong(0)).sum
    assert(got.map(_._3).sum == corpusTokens)
  }

  test("interleave mix: matches the stride recompute, deciles carry the corpus mix") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // in-memory stride-schedule recompute
    val bySource = docs.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val counts = scala.collection.mutable.Map[(String, Long), Long]()
      .withDefaultValue(0L)
    bySource.foreach { case (src, ids) =>
      val nS = ids.length.toLong
      val stride = 1099511627776L / (2L * nS)
      ids.indices.foreach { i =>
        val skey = (2L * (i + 1) - 1L) * stride
        counts((src, (skey * 10L) / 1099511627776L)) += 1L
      }
    }
    val nTotal = docs.length.toLong
    val got = Curation.interleaveMix(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val want = counts.toSeq.map { case ((src, dec), n) =>
      val nS = bySource(src).length.toLong
      (src, dec, n,
        (20000L * n * 10L + nTotal) / (2L * nTotal),
        (20000L * nS + nTotal) / (2L * nTotal))
    }.sortBy(t => (t._1, t._2))
    assert(got == want)
    // the mix property: every decile's per-source count is within one doc
    // of the source's proportional slice (the stride schedule guarantee)
    got.foreach { case (src, _, n, _, _) =>
      val nS = bySource(src).length.toLong
      assert(math.abs(n * 10L - nS) <= 10L,
        s"decile count $n for $src strays from ${nS}/10")
    }
    // every source with >= 10 docs appears in all 10 deciles
    bySource.filter(_._2.length >= 10).keys.foreach { src =>
      assert(got.count(_._1 == src) == 10, s"$src must hit all deciles")
    }
  }

  test("snapshot diff matches the in-memory recompute, all four statuses live") {
    val docs = graft.sources.Tables.load(spark, Sf, "documents")
      .selectExpr("doc_id", "source", "coalesce(text, '') AS text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ceil = docs.map(_._1).max + 1
    val (lo, hi) = (ceil / 10, ceil * 4 / 5)
    val prior = docs.filter(_._1 < hi).map { case (id, src, t) =>
      (id, src, if (id % 5 == 0) t + " draft" else t)
    }.map(d => d._1 -> d).toMap
    val cur = docs.filter(_._1 >= lo).map(d => d._1 -> d).toMap
    val rows = (prior.keySet ++ cur.keySet).toSeq.map { id =>
      (cur.get(id), prior.get(id)) match {
        case (Some((_, src, t)), None) => (src, "added", t.length.toLong)
        case (None, Some((_, src, p))) => (src, "removed", -p.length.toLong)
        case (Some((_, src, t)), Some((_, _, p))) =>
          (src, if (t == p) "unchanged" else "changed",
            t.length.toLong - p.length.toLong)
        case _ => sys.error("unreachable")
      }
    }
    val want = rows.groupBy(r => (r._1, r._2)).toSeq.map {
      case ((src, st), g) => (src, st, g.length.toLong, g.map(_._3).sum)
    }.sortBy(r => (r._1, r._2))
    val got = graft.operators.Curation.snapshotDiff(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // the fabricated prior must exercise every branch of the diff
    val statuses = got.map(_._2).toSet
    assert(statuses == Set("added", "removed", "changed", "unchanged"),
      s"all four statuses must be populated: $statuses")
    // changed rows gained exactly ' draft' (6 chars) per doc
    got.filter(_._2 == "changed").foreach { r =>
      assert(r._4 == -6 * r._3, s"changed delta must be -6/doc: $r")
    }
  }

  test("dup flow matrix recomputes from the truth pairs and conserves them") {
    val truth = Dedup.prefixFilterJaccard(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val src = graft.sources.Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = truth.map { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).toSeq
      .map { case (k, g) => (k._1, k._2, g.length.toLong) }
      .sortBy { case (a, b, _) => (a, b) }
    val got = Dedup.dupFlow(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._3).sum == truth.length.toLong) // every pair lands once
  }

  test("split leakage census conserves pairs and flags exactly the off-diagonal") {
    val out = Curation.splitLeakage(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val truthN = Dedup.prefixFilterJaccard(spark, Sf).count()
    assert(out.map(_._3).sum == truthN)
    out.foreach { case (a, b, _, leak) =>
      assert(leak == (if (a != b) 1 else 0))
      assert(a <= b) // unordered pair is canonically ordered
    }
  }

  test("selection gain equals the naive in-memory sorted recompute") {
    val docs = TextAnalysis.qualityScore(spark, Sf).collect()
      .map { r =>
        val q = if (r.isNullAt(4)) -1L else r.getLong(4)
        (r.getLong(0), r.getLong(1), q) // doc_id, n_tokens, quality_1e4
      }
    val n = docs.length.toLong
    val total = docs.map(_._2).sum
    val ranked = docs.sortBy { case (id, _, q) => (q, id) }.zipWithIndex
      .map { case ((id, tks, q), i) => (id, tks, q, i + 1L) }
    val byDecile = ranked.groupBy { case (_, _, _, rk) => (10 * (n - rk)) / n }
      .toSeq.sortBy(_._1)
    var cum = 0L
    val want = byDecile.map { case (d, g) =>
      cum += g.map(_._2).sum
      (d, g.length.toLong, g.map(_._2).sum, g.map(_._3).min, cum,
        (20000L * cum + total) / (2 * total))
    }
    val got = Curation.selectionGain(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // decile 0 (best) has the highest minimum quality; cumulative shares rise
    assert(got.map(_._4).zip(got.tail.map(_._4)).forall { case (a, b) => a >= b })
    assert(got.last._6 == 10000L) // all deciles together carry all tokens
  }

  test("dup rate trend conserves pairs and recomputes densities") {
    val rows = Dedup.dupRateTrend(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0L to 9L))
    val truth = Dedup.prefixFilterJaccard(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._3).sum == truth.length.toLong)
    val maxId = graft.sources.Tables.load(spark, Sf, "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    val wantPairs = truth.map { case (a, b) => (10 * math.max(a, b)) / (maxId + 1) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (d, nd, np, dens) =>
      assert(np == wantPairs.getOrElse(d, 0L))
      assert(dens == (2000000L * np + nd) / (2 * nd))
    }
  }

  test("pps sample draws exactly m points, proportional to token mass") {
    val rows = graft.operators.Sampling.ppsSample(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum == 100L) // the draw count is exact
    // in-memory recompute of the systematic grid
    val docs = graft.sources.Tables.load(spark, Sf, "documents")
      .selectExpr("doc_id",
        s"CAST(size(${graft.operators.TextAnalysis.TokensExpr}) AS BIGINT) AS w")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0).sortBy(_._1)
    val total = docs.map(_._2).sum
    val stride = math.max(total / 100, 1L)
    var cum = 0L
    val want = docs.flatMap { case (id, w) =>
      cum += w
      val np = math.min(cum / stride, 100L) - math.min((cum - w) / stride, 100L)
      if (np >= 1) Some((id, w, cum, np)) else None
    }.toSeq
    assert(rows.toSeq == want)
  }
}
