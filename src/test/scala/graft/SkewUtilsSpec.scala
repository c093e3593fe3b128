package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewUtils

class SkewUtilsSpec extends SparkTestBase {

  test("saltedJoin result equals plain join (inner)") {
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$Sf/customer.parquet")
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "o_custkey", "c_name")
    val salted = SkewUtils.saltedJoin(orders, customer, "o_custkey", salts = 4)
      .select("o_orderkey", "o_custkey", "c_name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    import spark.implicits._
    // one hot key with 1000 rows + small right side
    val left = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val right = Seq((42L, "hot")).toDF("k", "name")
    val out = SkewUtils.saltedJoin(left, right, "k", salts = 8)
    assert(out.count() == 1000)
    // salts actually distribute: hash-of-row salt should hit several buckets
    val distinctSalts = left
      .withColumn("s", pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .select("s").distinct().count()
    assert(distinctSalts >= 4)
  }

  test("bloomSemiJoin equals the plain left-semi join") {
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
    val dim = spark.read.parquet(s"$Sf/customer.parquet")
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select("c_custkey")
    val plain = orders.join(dim, orders("o_custkey") === dim("c_custkey"),
      "left_semi")
    val bloomed = SkewUtils.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey")
    assert(plain.exceptAll(bloomed).count() == 0)
    assert(bloomed.exceptAll(plain).count() == 0)
  }

  test("bloomSemiJoin screen is a superset of the true matches (no false negatives)") {
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
    val dim = spark.read.parquet(s"$Sf/customer.parquet")
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select("c_custkey")
    // tiny filter (64 bits, 1 hash) -> false positives all but guaranteed,
    // yet the result must STILL be exact: the rejoin removes them
    val tiny = SkewUtils.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey",
      nBits = 64, hashes = 1)
    val plain = orders.join(dim, orders("o_custkey") === dim("c_custkey"),
      "left_semi")
    assert(tiny.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(tiny).count() == 0)
  }

  /** Deterministic synthetic embeddings: 4-dim, label-controlled, with the
    * same (vec_id, label, embedding, vnorm) shape nearestInLabelCore reads.
    */
  private def embFixture(rows: Seq[(Long, Int)]) = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    rows.map { case (id, label) =>
      val rnd = new java.util.Random(7700L + id)
      (id, label, Array.fill(4)(rnd.nextFloat()))
    }.toDF("vec_id", "label", "embedding")
      .withColumn("vnorm", expr("sqrt(dot_f(embedding, embedding))"))
  }

  test("nearestInLabel: packed max_by top-1 equals the window reference below the cap") {
    import graft.operators.Similarity
    val emb = embFixture((0L until 40L).map(i => (i, (i % 3).toInt)))
    val out = Similarity.nearestInLabelCore(emb, maxBlock = 1 << 16)
    // reference: the pre-r5 window shape (row_number over m DESC, b_vec_id)
    val a = emb.select(col("vec_id"), col("label"), col("embedding"), col("vnorm"))
    val b = emb.select(col("vec_id").as("b_vec_id"), col("label"),
      col("embedding").as("b_embedding"), col("vnorm").as("b_vnorm"))
    val pairs = a.join(b, Seq("label"))
      .filter(col("vec_id") =!= col("b_vec_id"))
      .withColumn("m", expr(Similarity.scoreMicrosFromNorms(
        "dot_f(embedding, b_embedding)", "vnorm", "b_vnorm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("m").desc, col("b_vec_id"))
    val ref = pairs.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("b_vec_id").as("nn_vec_id"),
        expr(Similarity.Micro4).as("nn_score"),
        (col("m") >= 950000).as("is_near_dup"))
    assert(out.exceptAll(ref).count() == 0 && ref.exceptAll(out).count() == 0)
  }

  test("nearestInLabel: whale labels sub-block (bounded work), small labels stay exact") {
    import graft.operators.Similarity
    // label 1 is a whale (120 members, cap 32 -> 4 hash sub-blocks);
    // label 2 fits the cap (8 members) and must be untouched by it
    val emb = embFixture(
      (0L until 120L).map(i => (i, 1)) ++ (200L until 208L).map(i => (i, 2)))
    val capped = Similarity.nearestInLabelCore(emb, maxBlock = 32)
    val exact = Similarity.nearestInLabelCore(emb, maxBlock = 1 << 16)

    val cappedSmall = capped.filter(col("label") === 2)
    val exactSmall = exact.filter(col("label") === 2)
    assert(cappedSmall.exceptAll(exactSmall).count() == 0 &&
      exactSmall.exceptAll(cappedSmall).count() == 0,
      "labels under the cap must be exact (n_sub = 1)")

    // whale label: every reported NN must come from one of the vector's
    // TWO probed sub-blocks (its own + the adjacent one)
    val nSubWhale = 4 // ceil(120 / 32)
    val subs = emb.filter(col("label") === 1)
      .select(col("vec_id"),
        pmod(xxhash64(col("vec_id")), lit(nSubWhale)).cast("int").as("sub"))
    val whale = capped.filter(col("label") === 1)
      .join(subs, "vec_id")
      .join(subs.withColumnRenamed("vec_id", "nn_vec_id")
        .withColumnRenamed("sub", "nn_sub"), "nn_vec_id")
    assert(whale.filter(col("nn_sub") =!= col("sub") &&
        col("nn_sub") =!= pmod(col("sub") + 1, lit(nSubWhale)).cast("int"))
      .count() == 0,
      "whale-label candidates must come from the vector's probed sub-blocks")
    // every whale vector emits a row (each probes 2 of the 4 sub-blocks,
    // and with 120 members every sub-block pair here is non-empty)
    assert(capped.filter(col("label") === 1).count() == 120)
    // multi-probe can only improve on single-probe: each vector's score
    // is the best over a SUPERSET of its own sub-block's candidates, so
    // within-own-sub pairs never score above the reported NN
    val ownSubBest = emb.filter(col("label") === 1).as("x")
      .join(subs.as("sx"), col("x.vec_id") === col("sx.vec_id"))
      .join(emb.filter(col("label") === 1).as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .join(subs.as("sy"), col("y.vec_id") === col("sy.vec_id"))
      .filter(col("sx.sub") === col("sy.sub"))
      .withColumn("m", expr(graft.operators.Similarity.scoreMicrosFromNorms(
        "dot_f(x.embedding, y.embedding)", "x.vnorm", "y.vnorm")))
      .groupBy(col("x.vec_id").as("vec_id"))
      .agg(max(col("m")).as("own_best"))
    // nn_score is half-up micro4 (= m/100), so rescale with a +-50 margin
    val joined = capped.filter(col("label") === 1)
      .withColumn("nn_m", col("nn_score") * 100)
      .join(ownSubBest, "vec_id")
    assert(joined.filter(col("own_best") > col("nn_m") + 50).count() == 0,
      "multi-probe must never score below the vector's own sub-block best")
  }
}
