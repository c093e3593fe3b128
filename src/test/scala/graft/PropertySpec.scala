package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TrafficTransform

/** Property-based invariants (SURVEY §5.3): row-count conservation through
  * the transform, timestamp parse/format round-trip. Uses raw ScalaCheck
  * generators with fixed seeds (scalatestplus bridge is not in this
  * offline dependency set).
  */
class PropertySpec extends SparkTestBase {

  private val runTs = Timestamp.valueOf("2026-01-01 00:00:00")

  private val tsGen: Gen[Timestamp] = Gen.choose(
    Timestamp.valueOf("1995-01-01 00:00:00").getTime,
    Timestamp.valueOf("2030-12-31 23:59:59").getTime)
    .map(ms => new Timestamp((ms / 1000) * 1000)) // whole seconds

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("transform conserves rows and never nulls its outputs") {
    samples(Gen.nonEmptyListOf(Gen.zip(tsGen, Gen.choose(0.0, 100.0))), 10)
      .foreach { rows =>
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map { case (t, v) => Row(t, v) }, 2),
          StructType(Seq(StructField("time", TimestampType),
            StructField("traffic", DoubleType))))
        val out = TrafficTransform(df, runTs)
        assert(out.count() == rows.length)
        assert(out.filter("time IS NULL OR traffic IS NULL OR created_at IS NULL")
          .count() == 0)
      }
  }

  test("day-first string parse round-trips through canonical format") {
    val fmt = new java.text.SimpleDateFormat("dd/MM/yyyy HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    samples(tsGen, 25).foreach { t =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(fmt.format(t), 1.0)), 1),
        StructType(Seq(StructField("time", StringType),
          StructField("traffic", DoubleType))))
      val parsed = TrafficTransform.parseTimeColumn(df).head().getTimestamp(0)
      assert(parsed == t, s"parse mismatch for ${fmt.format(t)}")
    }
  }

  test("dotenv values round-trip through a written file") {
    // value alphabet excludes the characters the format itself consumes
    // (newlines, '#' comment starts, surrounding quotes) — those are
    // covered deterministically in ConfigSpec
    val valGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(':', '/', '.', '-', '_', ' ')))
      .map(_.mkString.trim).suchThat(_.nonEmpty)
    val cfgGen = Gen.zip(valGen, valGen, valGen, valGen)
    samples(cfgGen, 40).foreach { case (p, b, d, t) =>
      val f = java.nio.file.Files.createTempFile("graft_prop", ".env")
      java.nio.file.Files.writeString(f,
        s"PROJECT_ID=$p\nGCS_BUCKET=$b\nBQ_DATASET=$d\nBQ_TABLE=$t\n")
      val c = graft.config.EtlConfig.fromEnvFile(f.toString, env = Map.empty)
      assert(c.projectId == p.trim)
      assert(c.bucketUri == b.trim.stripSuffix("/"))
      assert(c.dataset == d.trim)
      assert(c.table == t.trim)
      java.nio.file.Files.delete(f)
    }
  }

  test("throttle dedup equals the greedy reference on random dense timelines") {
    import spark.implicits._
    // dense: ~72h of minute-resolution events over 3 users x 2 types
    // against a 24h window, so chains of drops and window hops both occur;
    // duplicate offsets exercise the (ts, event_id) tiebreak
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 3L), Gen.oneOf("a", "b"), Gen.choose(0L, 4320L)))
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    samples(evGen, 4).foreach { raw =>
      val evs = raw.zipWithIndex.map { case ((u, t, offMin), i) =>
        (i.toLong, new Timestamp(base + offMin * 60000L), u, t, 1.0, "{}")
      }
      val dir = tmpDir("throttle-prop")
      evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = graft.operators.Analytics.throttleDedup(spark, dir)
        .select("event_id").collect().map(_.getLong(0)).toSet
      val winUs = SparkEntry.Throttle.windowUs
      val expected = evs.groupBy(e => (e._3, e._4)).values.flatMap { g =>
        var lastKept = Long.MinValue
        g.sortBy(e => (e._2.getTime, e._1)).filter { e =>
          val us = e._2.getTime * 1000L
          val keep = lastKept == Long.MinValue || us > lastKept + winUs
          if (keep) lastKept = us
          keep
        }
      }.map(_._1).toSet
      assert(out == expected, s"greedy mismatch on ${evs.length}-event timeline")
    }
  }

  test("cusum recurrence equals the naive reference on random daily series") {
    import spark.implicits._
    val serGen = Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)).map(_.take(60))
    samples(serGen, 6).filter(_.nonEmpty).foreach { cents =>
      val daily = cents.zipWithIndex
        .map { case (c, i) => (f"2024-01-${i % 28 + 1}%02dT${i / 28}%02d", c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .map { case (d, c) => (d, c) }
      val df = daily.toDF("day", "cents")
      val got = graft.operators.Analytics.cusumFromDaily(df).collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
      val sorted = daily.sortBy(_._1)
      val n = sorted.length.toLong
      val total = sorted.map(_._2).sum
      var hi = 0L; var lo = 0L
      val want = sorted.map { case (d, c) =>
        hi = math.max(0L, hi + 2L * n * c - 3L * total)
        lo = math.max(0L, lo + total - 2L * n * c)
        (d, hi, lo)
      }
      assert(got == want)
      assert(got.forall(r => r._2 >= 0 && r._3 >= 0))
    }
  }

  test("bloom semi join equals plain semi on random key sets at any filter size") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(0L, 500L)), // left keys (with dups)
      Gen.nonEmptyListOf(Gen.choose(0L, 500L)), // right keys
      Gen.oneOf(64, 256, 1 << 12))              // deliberately tiny filters
    samples(gen, 5).foreach { case (lk, rk, nBits) =>
      val left = lk.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "payload")
      val right = rk.distinct.toDF("rk")
      val plain = left.join(right, left("k") === right("rk"), "left_semi")
      val bloomed = graft.operators.SkewUtils
        .bloomSemiJoin(left, right, "k", "rk", nBits = nBits, hashes = 2)
      assert(plain.exceptAll(bloomed).count() == 0)
      assert(bloomed.exceptAll(plain).count() == 0)
    }
  }

  test("interleave stride keys respect the per-source phase bound on random sizes") {
    // pure-math property of the schedule: with stride = 2^40 DIV (2 n),
    // the r-th key sits within one stride of the ideal phase
    // (2r-1)/(2n) * 2^40 — the drift bound that keeps deciles proportional
    val gen = Gen.choose(1L, 100000L)
    samples(gen, 40).foreach { n =>
      val stride = 1099511627776L / (2L * n)
      Seq(1L, n / 2 + 1, n).distinct.filter(_ >= 1).foreach { r =>
        val key = (2L * r - 1L) * stride
        val ideal = (2.0 * r - 1.0) / (2.0 * n) * 1099511627776.0
        assert(key <= ideal + 1)
        assert(key >= ideal - (2.0 * n) * 1.0 - stride,
          s"key $key drifted below ideal $ideal for n=$n r=$r")
      }
    }
  }
}
