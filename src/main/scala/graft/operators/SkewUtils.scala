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
}
