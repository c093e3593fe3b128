package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default in GraftSession), which splits oversized shuffle
  * partitions at runtime. `saltedJoin` is the explicit fallback for the
  * cases AQE can't fix — e.g. one hot key that exceeds a single task's
  * memory even after splitting, or a skewed aggregation upstream of the
  * join.
  *
  * Mechanics: the left (large, skewed) side gets a deterministic salt in
  * [0, salts) derived by hashing its whole row (xxhash64 over all columns
  * — no RNG, so retried tasks produce identical output, which matters for
  * exactly-once sinks); the right side is replicated `salts` times. The
  * join key becomes (key, salt), spreading each hot key over `salts`
  * shuffle partitions at the cost of a `salts`-times-larger right side —
  * use for large-skewed x small-right joins.
  */
object SkewUtils {

  private val SafeJoinTypes = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit each unmatched RIGHT row `salts` times
    // (the right side is replicated); only left-preserving types are sound
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports left-preserving join types only, got '$joinType'")
    val leftCols = left.columns
    val salted = left.withColumn("__salt",
      pmod(xxhash64(leftCols.map(col): _*), lit(salts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt").drop(replicated(key))
  }

  /** Bloom-screened semi join: `left` rows whose `leftKey` appears in
    * `right.rightKey` — same result as a plain left-semi join, reached by
    * first dropping the left rows a broadcast Bloom filter of the right
    * keys PROVABLY cannot match. The screen is result-invisible: false
    * negatives are impossible (every inserted key's bits are set), and
    * the false positives the filter lets through are removed by the exact
    * semi join that follows.
    *
    * This is the explicit form of Spark's runtime row-level filtering
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), for when the
    * planner can't inject it (non-equi pre-transforms, reused builds) or
    * the build side needs to be pinned. The 100 TB story is shuffle
    * avoidance on the FACT side: when `right` is too big to broadcast,
    * the plain semi join shuffles every left row; the bitset (nBits/8
    * bytes, fixed) always broadcasts, and only screen survivors — the
    * matching fraction plus the quantified false-positive rate
    * (~(1 - e^(-k·n/m))^k) — enter the exchange.
    *
    * Probe tests are pure codegen'd expressions (element_at + shiftleft
    * over the packed words — no UDF in the hot path); the build is the
    * map-side-combining [[graft.functions.BloomBitset]] aggregate, one
    * nBits/8-byte partial per upstream partition.
    */
  def bloomSemiJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    nBits: Int = 1 << 17, hashes: Int = 3): DataFrame = {
    require(hashes > 0, "need at least one hash function")
    // `__bits` / `__rk` are reserved helper names injected mid-plan; a
    // colliding input column would corrupt the probe or the final join.
    require(!left.columns.contains("__bits") && !left.columns.contains("__rk"),
      "bloomSemiJoin reserves column names __bits and __rk on the left frame")
    val nb = nBits.toLong
    val buildPos = (0 until hashes).map(i =>
      pmod(xxhash64(col(rightKey), lit(i)), lit(nb)))
    val bloomAgg = udaf(new graft.functions.BloomBitset(nBits),
      org.apache.spark.sql.Encoders.scalaLong)
    val bits = right
      .select(explode(array(buildPos: _*)).as("pos"))
      .agg(bloomAgg(col("pos")).as("__bits"))
    // identical (value, seed-literal) hash inputs on both sides: xxhash64
    // over (key, i) with the same INT seed literal. Column API throughout
    // (no SQL-string interpolation), so arbitrary key names are safe;
    // pmod is non-negative, so >>6 and &63 are exact div/mod by 64.
    val mightContain = (0 until hashes).map { i =>
      val p = pmod(xxhash64(col(leftKey), lit(i)), lit(nb))
      val word = element_at(col("__bits"), shiftright(p, 6).cast("int") + lit(1))
      // functions.shiftleft only accepts an Int amount; call_function
      // reaches the (col, col) builtin form
      val mask = call_function("shiftleft", lit(1L),
        p.bitwiseAND(lit(63L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
    left.crossJoin(broadcast(bits))
      .filter(mightContain)
      .drop("__bits")
      .join(right.select(col(rightKey).as("__rk")),
        col(leftKey) === col("__rk"), "left_semi")
  }
}
