package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.TextAnalysis
import graft.streaming.HeavyHittersStream

/** The heavy-hitters QUERY surface (the sketch itself is property-tested
  * in FunctionsSpec): the registry query must equal the exact
  * GROUP BY ... HAVING count*k > n answer — sketch nondeterminism pruned
  * away by the exact rejoin — and the sketch's candidate set must contain
  * every emitted item (the MG guarantee the pruning correctness rests on).
  */
class HeavyHittersSpec extends SparkTestBase {

  private val k = SparkEntry.Heavy.k

  test("q_heavy_hitters equals the exact full-domain threshold answer") {
    val got = TextAnalysis.heavyTokens(spark, Sf, k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = spark.read.parquet(s"$Sf/documents.parquet")
      .select(explode(expr(TextAnalysis.TokensExpr)).as("tok"))
    val n = toks.count()
    val expected = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .orderBy(col("cnt").desc, col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "fixture must exercise a non-empty hitter set")
  }

  test("the sketch candidate set contains every emitted item (pruning is lossless)") {
    val emitted = TextAnalysis.heavyTokens(spark, Sf, k)
      .select("tok").collect().map(_.getString(0)).toSet
    val sketch = udaf(new graft.functions.HeavyHittersSketch(k),
      org.apache.spark.sql.Encoders.STRING)
    val cands = spark.read.parquet(s"$Sf/documents.parquet")
      .select(explode(expr(TextAnalysis.TokensExpr)).as("tok"))
      .agg(sketch(col("tok")).as("hh"))
      .selectExpr("inline(hh)").select("item")
      .collect().map(_.getString(0)).toSet
    assert(emitted.subsetOf(cands),
      s"emitted items missing from the sketch candidates: ${emitted -- cands}")
  }

  test("large domain >> capacity: planted hitters found, nothing else") {
    // 64-capacity sketch against a 5000-item cold domain with two planted
    // hot tokens — the regime the sketch exists for (domain >> k), unlike
    // the 31-word fixture vocabulary where MG degenerates to exact counts
    val dir = tmpDir("graft_hh_docs")
    val rnd = new scala.util.Random(11)
    val words = Seq.fill(20000)(s"w${rnd.nextInt(5000)}") ++
      Seq.fill(900)("alpha") ++ Seq.fill(700)("beta")
    val docs = rnd.shuffle(words).grouped(40).zipWithIndex.map {
      case (ws, i) => (i.toLong, ws.mkString(" "), "en", "src0", ws.mkString(" ").length)
    }.toSeq
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.heavyTokens(spark, dir, k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // n = 21600, n/k = 337.5; alpha(900) and beta(700) qualify, every
    // cold word has expectation ~4 — nowhere near the threshold
    assert(got === Seq(("alpha", 900L), ("beta", 700L)))
  }

  test("streaming summary keeps the MG guarantees across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = HeavyHittersStream.summary(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode(OutputMode.Complete()).start()
    val rnd = new scala.util.Random(3)
    val batch1 = rnd.shuffle(List.fill(300)("hot") ++
      List.fill(500)(s"cold${rnd.nextInt(100)}"))
    val batch2 = rnd.shuffle(List.fill(200)("hot") ++ List.fill(150)("warm") ++
      List.fill(450)(s"cold${rnd.nextInt(100)}"))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val all = batch1 ++ batch2
      val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = all.size.toLong
      val out = spark.table("hh_stream")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.nonEmpty && out.forall(_._4 == n), s"running n must be $n")
      assert(out.length <= 8, "summary exceeds sketch capacity")
      // every item with true freq > n/k survives; bounds hold for all
      assert(out.exists(_._1 == "hot"), "f > n/k item must be present")
      out.foreach { case (item, lb, err, _) =>
        val f = truth(item)
        assert(lb <= f && f <= lb + err,
          s"bounds violated for $item: lb=$lb err=$err true=$f")
        assert(err <= n / 8)
      }
    } finally q.stop()
  }
}
