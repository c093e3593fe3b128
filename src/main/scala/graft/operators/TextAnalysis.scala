package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * All logic is pure Catalyst expressions (higher-order functions on
  * arrays — codegen-friendly, no UDFs), so it runs distributed with
  * map-side-only cost: no shuffle in any per-document operator.
  *
  * Engine-parity conventions (these expressions have DuckDB twins in
  * SparkEntry.oracleSql — keep them in lockstep):
  *  - tokens = regexp_extract_all(lower(text), '[a-z0-9]+')
  *  - hashes via md5 (identical hex output in every engine)
  *  - left-fold aggregates (Spark `aggregate` == DuckDB list_reduce)
  */
object TextAnalysis {

  /** Tokenizer expression shared by every operator. */
  val TokensExpr = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  /** Per-document token statistics. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents")
      .withColumn("toks", expr(TokensExpr))
      .select(
        col("doc_id"),
        col("n_chars"),
        expr("CAST(size(toks) AS BIGINT)").as("n_tokens"),
        expr("CAST(size(array_distinct(toks)) AS BIGINT)").as("n_distinct"),
        // half-up 4-decimal mean token length as BIGINT ten-thousandths —
        // pure integer arithmetic (see Similarity.Micro4 for why ratios of
        // small ints must not go through engine round())
        expr("""CAST((20000 * aggregate(transform(toks, t -> CAST(length(t) AS BIGINT)),
                      CAST(0 AS BIGINT), (a, b) -> a + b)
                + CAST(size(toks) AS BIGINT))
               div (2 * CAST(size(toks) AS BIGINT)) AS BIGINT)""").as("avg_token_len_1e4"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length/stopword/punctuation heuristics composited
    * into one [0,1] score (the standard cheap pre-filter before expensive
    * dedup/model-based scoring at 100 TB).
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents")
      .withColumn("toks", expr(TokensExpr))
      .withColumn("n_tokens", expr("CAST(size(toks) AS BIGINT)"))
      .withColumn("stop_hits", expr(
        "CAST(size(filter(toks, t -> array_contains(array('the','a','of','and','to','in','is','it'), t))) AS BIGINT)"))
      .withColumn("punct_chars", expr(
        "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '')) AS BIGINT)"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        // ratios and the composite score as BIGINT ten-thousandths: the
        // ratio ints are exact, the composite is floor(product*1e4 + 0.5)
        // of bit-identical double factors — no engine round() anywhere
        expr("CAST((20000 * stop_hits + n_tokens) div (2 * n_tokens) AS BIGINT)")
          .as("stop_ratio_1e4"),
        expr("""CAST((20000 * punct_chars + CAST(length(text) AS BIGINT))
               div (2 * CAST(length(text) AS BIGINT)) AS BIGINT)""").as("punct_ratio_1e4"),
        expr("""CAST(floor(
                  least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
                  * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(length(text) AS DOUBLE))
                  * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                  * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)""").as("quality_1e4"))
      .orderBy(col("doc_id"))

  /** Text cleaning / normalization: strip markup-ish tags, drop control
    * characters, collapse whitespace, trim — the canonicalization pass
    * that runs before fingerprinting and dedup in a training pipeline.
    * Patterns are restricted to the regex subset Java regex and RE2
    * interpret identically (no backrefs, no lookaround), so the oracle
    * reproduces the cleaning byte-for-byte.
    */
  def cleanText(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents")
      .withColumn("cleaned", expr(
        """trim(regexp_replace(regexp_replace(regexp_replace(text,
           '<[^>]*>', ' '), '[\\x00-\\x1f]', ' '), '\\s+', ' '))"""))
      .select(
        col("doc_id"),
        expr("md5(cleaned)").as("clean_fp"),
        expr("CAST(length(cleaned) AS BIGINT)").as("clean_chars"),
        expr("CAST(length(text) - length(cleaned) AS BIGINT)").as("removed_chars"))
      .orderBy(col("doc_id"))

  /** Language identification by stopword-marker voting (n-gram-free
    * heuristic: count hits from per-language marker sets, argmax with a
    * fixed precedence for ties). Deterministic and engine-portable.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val markers = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is"),
      "de" -> Seq("der", "die", "und", "ist", "nicht", "das"),
      "fr" -> Seq("le", "la", "et", "les", "des", "est"),
      "es" -> Seq("el", "los", "que", "una", "por", "como"))
    val scored = markers.foldLeft(
      Tables.spread(s, dir, "documents").withColumn("toks", expr(TokensExpr))) {
      case (df, (lang, words)) =>
        val arr = words.map(w => s"'$w'").mkString(",")
        df.withColumn(s"s_$lang", expr(
          s"CAST(size(filter(toks, t -> array_contains(array($arr), t))) AS BIGINT)"))
    }
    scored.select(
      col("doc_id"), col("s_en"), col("s_de"), col("s_fr"), col("s_es"),
      expr("""CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                   WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                   WHEN s_fr >= s_es THEN 'fr'
                   ELSE 'es' END""").as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Top-5 tokens per source (explode → count → rank): the
    * generator-then-aggregate shape. Shuffle volume is (source, token)
    * pairs after map-side combine, never the raw token stream.
    */
  def topTokensPerSource(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n").desc, col("token"))
    Tables.spread(s, dir, "documents")
      .select(col("source"), explode(expr(TokensExpr)).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("token"), col("n"))
      .orderBy(col("source"), col("rk"))
  }

  /** Document fingerprints: md5 of the token-normalized text (exact-dedup
    * key) + a 31-radix rolling hash over token codes (order-sensitive,
    * cheap to compare/shard on).
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents")
      .withColumn("toks", expr(TokensExpr))
      .select(
        col("doc_id"),
        expr("md5(array_join(toks, ' '))").as("fp_md5"),
        expr("""aggregate(
                  transform(toks, t -> CAST(length(t) * 131 + ascii(substr(t, 1, 1)) AS BIGINT)),
                  CAST(7 AS BIGINT),
                  (a, b) -> (a * 31 + b) % 1000000007)""").as("fp_rolling"))
      .orderBy(col("doc_id"))
}
