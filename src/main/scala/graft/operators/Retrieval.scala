package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Hybrid lexical + vector retrieval — the two-channel search shape a
  * training-data pipeline uses for eval-set mining and RAG corpus
  * construction: a rarity-weighted lexical channel (shared distinct
  * tokens through an inverted index) and an exact-cosine vector channel
  * (the existing brute-force top-k), fused by reciprocal-rank fusion.
  *
  * Everything is integer-exact so the DuckDB oracle matches cell for
  * cell: lexical weights are 1e6 div df (monotone in idf, no floating
  * log), rank contributions are 1e6 div (rrfK + rank), and every rank
  * breaks ties on doc_id.
  */
object Retrieval {

  /** Hybrid top-k: for each query document (doc_id < nQueries), fuse the
    * candK best lexical matches and the candK nearest embedding
    * neighbors by RRF and keep the top k.
    *
    * Scale shape: the lexical channel is the dedup-family inverted-index
    * discipline — candidates come from a token equi-join (query tokens
    * BROADCAST: nQueries documents' distinct tokens), with the df cap
    * dropping degenerate buckets (a token in half the corpus is not a
    * retrieval signal, and it would fan out O(corpus) candidate rows);
    * per-query candidate volume is bounded by Σ_t min(df(t), maxDf).
    * The vector channel is the zero-corpus-shuffle map-side top-k
    * aggregator. The rank windows run over candidate sets (≤ bounded
    * candidates per query), never the corpus.
    */
  def hybridTopK(s: SparkSession, dir: String, nQueries: Int = 10,
                 candK: Int = 20, k: Int = 10, rrfK: Int = 60,
                 maxDf: Int = 100): DataFrame = {
    val docToks = Tables.spread(s, dir, "documents")
      .select(col("doc_id"),
        explode(expr(TextAnalysis.TokensExpr)).as("tok"))
      .distinct()
    val weights = docToks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .withColumn("w", expr("CAST(1000000 div df AS BIGINT)"))
    val indexed = docToks.join(weights.hint("shuffle_hash"), Seq("tok"))
      .select(col("doc_id"), col("tok"), col("w"))
    val queryToks = indexed.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("tok"))
    val lexTop = indexed.join(broadcast(queryToks), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("lex_score"))
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("lex_score").desc, col("doc_id"))).cast("long"))
      .filter(col("lex_rank") <= candK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))
    val vecTop = Similarity.bruteForceTopK(s, dir, nQueries, candK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    lexTop.join(vecTop, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"CAST(1000000 div ($rrfK + lex_rank) AS BIGINT)"), lit(0L))
          + coalesce(expr(s"CAST(1000000 div ($rrfK + vec_rank) AS BIGINT)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_micro"),
        col("lex_rank"), col("vec_rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
