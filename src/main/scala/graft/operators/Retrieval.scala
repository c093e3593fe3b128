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

  /** BM25 ranking (Robertson/Sparck-Jones Okapi weighting) with every
    * factor in exact integer micros, so the DuckDB oracle matches cell
    * for cell:
    *
    *   - idf is the Robertson ratio without the log — `(2(N-df)+1)·1e6
    *     div (2df+1)` = 1e6·(N-df+0.5)/(df+0.5). The log is monotone, so
    *     ranking by the ratio ranks identically per-term; summing ratios
    *     instead of log-ratios is a documented variant (it sharpens the
    *     rarity weighting) and keeps the arithmetic in int64.
    *   - the tf saturation term tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))
    *     uses milli-scaled k1/b and one `div` per factor, with dl/avgdl
    *     expanded to (dl·N) div Σdl so there is no fractional average.
    *
    * Terms in more than maxDfPermille/1000 of the corpus are pruned from
    * BOTH scoring and candidate generation (relative stop-term pruning:
    * a term in most of the corpus carries no rarity signal). The cap is
    * relative, not an absolute df, so it does not silently empty the
    * result as the corpus grows; the default is permissive (80%) because
    * the synthetic fixture draws from a ~31-word vocabulary — a
    * production corpus with a Zipfian vocabulary would run 100-300‰,
    * where per-query candidate volume Σ_t min(df(t), cap·N) stays a
    * small corpus fraction.
    *
    * Scale shape: same inverted-index discipline as [[hybridTopK]] — the
    * per-(doc,term) tf table is one map-side-combined shuffle of the
    * token stream, df one more over distinct terms; query terms (a few
    * hundred rows) BROADCAST against the capped index, and the rank
    * window runs over candidates, never the corpus. int64 stays exact to
    * ~1e9 docs per index shard (idf_micro·tf_micro < 2^63);
    * shard-and-merge beyond.
    */
  def bm25TopK(s: SparkSession, dir: String, nQueries: Int = 10,
               k: Int = 10, maxDfPermille: Int = 800,
               k1Milli: Int = 1200, bMilli: Int = 750): DataFrame = {
    val docs = Tables.spread(s, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(expr(TextAnalysis.TokensExpr)).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"),
      expr(s"CAST(size(${TextAnalysis.TokensExpr}) AS BIGINT)").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .filter(expr(s"df * 1000 <= n_docs * $maxDfPermille"))
      .select(col("tok"), col("df"))
    val idx = tf.join(dfTab.hint("shuffle_hash"), Seq("tok"))
    val qterms = idx.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("tok"))
    val scored = idx.join(broadcast(qterms), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(dl.hint("shuffle_hash"), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro", expr(
        "CAST((2 * (n_docs - df) + 1) * CAST(1000000 AS BIGINT) div (2 * df + 1) AS BIGINT)"))
      .withColumn("norm_milli", expr(
        s"CAST(1000 - $bMilli + ($bMilli * dl * n_docs) div total_tokens AS BIGINT)"))
      .withColumn("tf_micro", expr(
        s"""CAST((tf * (${k1Milli + 1000}) * CAST(1000000000 AS BIGINT))
             div (tf * 1000000 + $k1Milli * norm_milli) AS BIGINT)"""))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr("(idf_micro * tf_micro) div 1000000")).as("score_micro"),
        count(lit(1)).as("n_terms"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
      .orderBy(col("query_id"), col("rank"))
  }

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

  /** Exact phrase search through a positional inverted index: documents
    * containing the token sequence `phrase` contiguously, with occurrence
    * count and first match position — the IR primitive BM25's bag-of-words
    * scoring cannot express ("new york" is not "york new"). Matching is
    * the classic positional-postings alignment: each phrase term's
    * postings shift left by its offset, and a start position surviving
    * the n-way (doc_id, start_pos) equi-join is a contiguous match.
    *
    * 100 TB shape: per-term postings are filtered to the phrase's tokens
    * BEFORE any join, so join volume is bounded by the rarest term's df
    * (the join chain intersects monotonically — each step can only
    * shrink). All joins are equi-joins on (doc_id, start_pos); no window
    * or self-join ever sees the full token stream, and the final
    * aggregate is map-side combined. A production index would persist
    * the (tok, doc_id, pos) table bucketed by tok to skip the tokenize
    * pass per query; the alignment plan is unchanged.
    */
  def phraseSearch(s: SparkSession, dir: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val tok = Tables.spread(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr(TextAnalysis.TokensExpr)).as(Seq("pos", "tok")))
    val anchors = phrase.zipWithIndex.map { case (t, i) =>
      tok.filter(col("tok") === lit(t))
        .select(col("doc_id"), (col("pos") - i).as("start_pos"))
    }
    anchors.reduce((a, b) => a.join(b, Seq("doc_id", "start_pos")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("start_pos")).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }
}
