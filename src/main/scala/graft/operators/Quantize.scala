package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding quantization: float32 -> int8 codes (the 4x storage /
  * bandwidth lever for vector corpora; at 100 TB of embeddings the scan
  * time of an ANN pass is storage-bound, so codes are what you keep hot
  * and the float vectors become the cold re-rank tier).
  *
  * Symmetric scalar quantization with the fixed scale 127 (embeddings are
  * unit-norm, so components live in [-1, 1]): code = floor(x*127 + 0.5).
  * Everything emitted is fixed-point/integer per the repo's cross-engine
  * exactness discipline; the reconstruction-error fold is pinned
  * left-to-right like every other dot product here.
  */
object Quantize {

  private val CodesExpr =
    """transform(embedding,
       x -> CAST(floor(CAST(x AS DOUBLE) * CAST(127 AS DOUBLE)
                       + CAST(0.5 AS DOUBLE)) AS BIGINT))"""

  /** Per-vector quantization summary: code checksum/min/max + the
    * reconstruction MSE in integer micro-units.
    */
  def int8Summary(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "embeddings")
      .withColumn("q", expr(CodesExpr))
      .select(col("vec_id"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, v) -> a + v)").as("q_sum"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"),
        expr(
          """CAST(floor(
               aggregate(
                 zip_with(embedding, q,
                   (x, c) -> (CAST(x AS DOUBLE) - CAST(c AS DOUBLE) / CAST(127 AS DOUBLE))
                           * (CAST(x AS DOUBLE) - CAST(c AS DOUBLE) / CAST(127 AS DOUBLE))),
                 CAST(0.0 AS DOUBLE), (a, v) -> a + v)
               * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)""").as("mse_micro"))
      .orderBy(col("vec_id"))
}
