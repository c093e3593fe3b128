package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** The SQL front door: a `spark.sql`-runnable statement for EVERY query in
  * `SparkEntry.queries`, so a SQL-speaking consumer (the reference's users
  * talk to their warehouse in SQL — `/root/reference/src/etl/load.py:67-110`,
  * `README.md:150-170`) can run the whole registry without touching the
  * DataFrame API.
  *
  * Two sources of SQL text:
  *  - queries whose DuckDB oracle is already valid Spark SQL pass the
  *    oracle text through verbatim (`portable`), so the two surfaces can
  *    never drift;
  *  - queries whose oracle leans on DuckDB dialect (list_* functions,
  *    1-based `arr[i]`, `unnest`, `//`, `epoch_us`, `strftime`, ASOF JOIN,
  *    unbounded recursion) get a hand-written Spark-dialect twin built from
  *    the same helper builders, structurally mirroring the oracle so the
  *    translation is reviewable side by side.
  *
  * Twins use ONLY built-in Spark SQL — no graft-registered functions — so
  * the front door works on a stock SparkSession. SqlFrontDoorSpec iterates
  * the registry and asserts twin-vs-DataFrame equality for every entry.
  *
  * Dialect map used throughout (DuckDB -> Spark):
  *   len(a)->size(a)  a[i]->element_at(a,i)  list_transform->transform
  *   list_filter->filter  list_distinct->array_distinct
  *   list_contains(l,x)->array_contains  list_intersect->array_intersect
  *   list_aggregate(l,'min'|'max')->array_min|array_max
  *   list_aggregate(l,'sum')/list_reduce->aggregate(l, init, +)
  *   list_slice(a,s,e)->slice(a,s,e-s+1)  l1||l2->concat  [x,y]->array(x,y)
  *   range(a,b[,s])->sequence(a,b-1[,s])  unnest->explode/posexplode
  *   x//y->x DIV y (identical trunc semantics, verified)  xor(a,b)->a^b
  *   (1<<p)->shiftleft  epoch_us->unix_micros  strftime->date_format
  *   quantile_cont->percentile  json_extract_string->get_json_object
  *   array_to_string->array_join  VARCHAR->STRING  DOUBLE[]->ARRAY<DOUBLE>
  *   regexp_extract_all(s,re)->regexp_extract_all(s,re,0) + \\-escaping
  *   regexp_replace(s,re,r,'g')->regexp_replace(s,re,r)
  *   dayofweek (Sun=0) -> dayofweek - 1 (Sun=1)
  *   strpos->instr  trim(x,c)->trim(BOTH c FROM x)
  */
object SqlFrontDoor {

  // ---------------------------------------------------------------- helpers

  /** Pinned left-to-right double dot of two DOUBLE-array columns; empty ->
    * 0. Same fold order as the oracle's list_reduce (init 0.0 + v1 == v1
    * bitwise), so micro-rounded scores agree with both the oracle and the
    * operator.
    */
  private def dotSql(a: String, b: String): String =
    s"CASE WHEN size($a) = 0 THEN CAST(0 AS DOUBLE) ELSE " +
      s"aggregate(zip_with($a, $b, (p, q) -> p * q), CAST(0 AS DOUBLE), (x, y) -> x + y) END"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  private def cosMicrosSql(a: String, b: String): String =
    s"CAST(floor((${cosSql(a, b)}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"

  private val micro4Sql =
    "CAST(CASE WHEN m >= 0 THEN (m + 50) DIV 100 ELSE -((-m + 50) DIV 100) END AS BIGINT)"

  /** Tokenizer shared by every documents-table twin. */
  private val toksSql =
    "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+', 0)"

  /** d (tokens) + shd (distinct word-trigram shingles) CTE prefix. */
  private val shingleCtes =
    s"""d AS (SELECT doc_id, $toksSql AS ws FROM documents),
        shd AS (SELECT doc_id, array_distinct(transform(sequence(1, size(ws) - 2),
                i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ', element_at(ws, i + 2)))) AS sh
                FROM d WHERE size(ws) >= 3)"""

  /** Same shingle chain carrying `source` — for the feed-level queries
    * (source overlap, decontamination).
    */
  private val shingleSrcCtes =
    s"""d AS (SELECT doc_id, source, $toksSql AS ws FROM documents),
        shd AS (SELECT doc_id, source, array_distinct(transform(sequence(1, size(ws) - 2),
                i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ', element_at(ws, i + 2)))) AS sh
                FROM d WHERE size(ws) >= 3)"""

  private val minhashSigs = (0 until Dedup.NumHashes).map(j =>
    s"array_min(transform(sh, t -> substr(md5(t || ':${j / 4}'), ${(j % 4) * 8 + 1}, 8))) AS sig_$j")
    .mkString(", ")
  private val minhashBands = (0 until Dedup.Bands).map { b =>
    val parts = (0 until Dedup.RowsPerBand).map(r => s"sig_${b * Dedup.RowsPerBand + r}")
    s"md5(${parts.mkString(" || ")}) AS band_$b"
  }.mkString(", ")
  private val minhashBandRows = (0 until Dedup.Bands).map(b =>
    s"SELECT doc_id, $b AS band_idx, band_$b AS band_val FROM bands").mkString(" UNION ALL ")

  /** Shingles -> signatures -> bands -> LSH candidates -> verified jaccard
    * pairs (mirror of SparkEntry.minhashVerifyCtes).
    */
  private val minhashVerifyCtes =
    s"""$shingleCtes,
       sigs AS (SELECT doc_id, sh, $minhashSigs FROM shd),
       bands AS (SELECT doc_id, $minhashBands FROM sigs),
       br AS ($minhashBandRows),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM br a JOIN br b
                  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                     AND a.doc_id < b.doc_id),
       verify AS (
         SELECT doc_a, doc_b,
                (20000 * size(array_intersect(sa.sh, sb.sh))
                 + size(array_distinct(concat(sa.sh, sb.sh))))
                DIV (2 * size(array_distinct(concat(sa.sh, sb.sh)))) AS jaccard_1e4
         FROM cand
         JOIN shd sa ON sa.doc_id = cand.doc_a
         JOIN shd sb ON sb.doc_id = cand.doc_b)"""

  /** Shingles -> 32-bit SimHash per doc (mirror of the oracle chain). */
  private val simhashCtes =
    s"""$shingleCtes,
       ex AS (SELECT doc_id, md5(s) AS hh FROM (SELECT doc_id, explode(sh) AS s FROM shd)),
       votes AS (SELECT doc_id, p,
                 sum(CASE WHEN substr(hh, p + 1, 1) IN ('8','9','a','b','c','d','e','f')
                     THEN 1 ELSE -1 END) AS v
                 FROM ex CROSS JOIN (SELECT explode(sequence(0, 31)) AS p) r GROUP BY doc_id, p),
       sims AS (SELECT doc_id,
                CAST(sum(CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(p AS INTEGER))
                         ELSE 0 END) AS BIGINT) AS simhash
                FROM votes GROUP BY doc_id)"""

  /** Chunking CTE prefix: 30-token stride, 40-token window. */
  private val chunkCtes =
    s"""d AS (SELECT doc_id, $toksSql AS ws FROM documents),
       st AS (SELECT doc_id, ws, start
              FROM d LATERAL VIEW explode(sequence(0, size(ws) - 1, 30)) t AS start
              WHERE size(ws) >= 1),
       ch AS (SELECT doc_id, CAST(start DIV 30 AS BIGINT) AS chunk_idx,
              slice(ws, start + 1, least(start + 40, size(ws)) - start) AS chunk
              FROM st)"""

  /** The LSH hyperplanes as a Spark VALUES literal (same Double.toString
    * round-trip as the oracle's literal).
    */
  private val planesValuesSql: String =
    Similarity.planeData().map { case (p, arr) =>
      s"($p, CAST(array(${arr.mkString(", ")}) AS ARRAY<DOUBLE>))"
    }.mkString(", ")

  /** Per-doc language-ID stopword scores (mirror of the oracle's sc CTE
    * body; expects a frame aliased with tokens column named `toks`).
    */
  private def langScores(toks: String): String =
    s"""CAST(size(filter($toks, t -> array_contains(array('the','and','of','to','in','is'), t))) AS BIGINT) AS s_en,
        CAST(size(filter($toks, t -> array_contains(array('der','die','und','ist','nicht','das'), t))) AS BIGINT) AS s_de,
        CAST(size(filter($toks, t -> array_contains(array('le','la','et','les','des','est'), t))) AS BIGINT) AS s_fr,
        CAST(size(filter($toks, t -> array_contains(array('el','los','que','una','por','como'), t))) AS BIGINT) AS s_es"""

  /** Quality-metric columns over (text, toks) (mirror of the oracle). */
  private def qualityMetrics(toks: String): String =
    s"""CAST(size($toks) AS BIGINT) AS n_tokens,
        CAST(size(filter($toks, t -> array_contains(
          array('the','a','of','and','to','in','is','it'), t))) AS BIGINT) AS stop_hits,
        CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '')) AS BIGINT) AS punct_chars,
        CAST(length(text) AS BIGINT) AS text_len"""

  private val qualityScoreSql =
    """CASE WHEN n_tokens = 0 OR text_len = 0 THEN NULL ELSE
       CAST(floor(
         least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
         * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(text_len AS DOUBLE))
         * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END"""

  // --------------------------------------------------- the ANN twin bodies

  private val hardNegativesSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v, label FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
               FROM e WHERE vec_id < 10),
         scored AS (SELECT query_id, vec_id, ${cosMicrosSql("qv", "v")} AS m
                    FROM e CROSS JOIN q
                    WHERE vec_id <> query_id AND label <> qlabel),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  private val annBruteforceSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         scored AS (SELECT query_id, vec_id, ${cosMicrosSql("qv", "v")} AS m
                    FROM e CROSS JOIN q WHERE vec_id <> query_id),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  private val annIvfSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
         scored_c AS (SELECT e.vec_id, c.centroid_id,
                      ${cosMicrosSql("e.v", "c.cv")} AS cm
                      FROM e CROSS JOIN c),
         assign AS (SELECT vec_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scored_c) t WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scored_c WHERE vec_id < 10) t WHERE rn <= 3),
         cand AS (SELECT DISTINCT p.query_id, a.vec_id
                  FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
                  WHERE a.vec_id <> p.query_id),
         rr AS (SELECT cand.query_id, cand.vec_id,
                ${cosMicrosSql("q.qv", "e.v")} AS m
                FROM cand
                JOIN e ON e.vec_id = cand.vec_id
                JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10) q
                  ON q.qid = cand.query_id),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM rr)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  private val annLshSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         planes AS (SELECT * FROM (VALUES $planesValuesSql) AS t(plane_id, plane)),
         dots AS (SELECT vec_id, plane_id, ${dotSql("v", "plane")} AS d
                  FROM e CROSS JOIN planes),
         sigs AS (SELECT vec_id,
                  CAST(sum(CASE WHEN d >= 0
                           THEN shiftleft(CAST(1 AS BIGINT), CAST(plane_id AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS sig
                  FROM dots GROUP BY vec_id),
         br AS (SELECT vec_id, 0 AS band_idx, sig & 255 AS band_val FROM sigs
                UNION ALL
                SELECT vec_id, 1, shiftright(sig, 8) & 255 FROM sigs),
         qb AS (SELECT vec_id AS query_id, band_idx, band_val FROM br WHERE vec_id < 10),
         cand AS (SELECT DISTINCT qb.query_id, br.vec_id
                  FROM br JOIN qb ON br.band_idx = qb.band_idx
                                 AND br.band_val = qb.band_val
                  WHERE br.vec_id <> qb.query_id),
         scored AS (SELECT c.query_id, c.vec_id,
                    ${cosMicrosSql("q.qv", "e.v")} AS m
                    FROM cand c
                    JOIN e ON e.vec_id = c.vec_id
                    JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10) q
                      ON q.qid = c.query_id),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Spark-dialect left-to-right double dot of two BIGINT arrays (shared
    * by the trained-quantizer twins).
    */
  private def dotCodesSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (x, y) -> x + y)"

  /** Shared trained-quantizer CTE chain in Spark dialect (codes →
    * fixed-iteration k-means → scoredF/assignF) — the twin-side mirror of
    * SparkEntry.trainedAssignCtes, reused by the trained-IVF and
    * semantic-dedup twins. Component positions are 0-based here
    * (posexplode) vs the oracle's 1-based — positions only ever join/sort
    * against themselves, so the numbering is internal.
    */
  /** The WITH header shared by every trained-quantizer twin. */
  private def codesHeaderCtes: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         codes AS (SELECT vec_id,
           transform(v, x -> CAST(floor(x * CAST(1048576 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS code FROM e),
         codes_n AS (SELECT vec_id, code, sqrt(${dotCodesSpark("code", "code")}) AS vqn
                     FROM codes)"""

  private def trainedAssignCtes(iters: Int, nLists: Int,
                                trainFilterSql: String = ""): String = {
    def dotc(a: String, b: String): String = dotCodesSpark(a, b)
    def cmOf(a: String, b: String, na: String, nb: String): String =
      s"CAST(floor((${dotc(a, b)} / ($na * $nb)) " +
        "* CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val trainSrc = if (trainFilterSql.isEmpty) "codes_n" else "codes_t"
    val sb = new StringBuilder
    sb.append(codesHeaderCtes)
    if (trainFilterSql.nonEmpty) sb.append(
      s""",
         codes_t AS (SELECT * FROM codes_n WHERE $trainFilterSql)""")
    sb.append(
      s""",
         cent0 AS (SELECT vec_id AS centroid_id, code AS csum
                   FROM codes WHERE vec_id < $nLists),""")
    for (t <- 1 to iters) {
      val p = t - 1
      sb.append(
        s"""
         cn$p AS (SELECT centroid_id, csum, sqrt(${dotc("csum", "csum")}) AS cqn
                  FROM cent$p),
         scored$t AS (SELECT c.vec_id, c.code, k.centroid_id,
                      ${cmOf("c.code", "k.csum", "c.vqn", "k.cqn")} AS cm
                      FROM $trainSrc c CROSS JOIN cn$p k),
         assign$t AS (SELECT vec_id, code, centroid_id FROM (
                      SELECT vec_id, code, centroid_id,
                             row_number() OVER (PARTITION BY vec_id
                                                ORDER BY cm DESC, centroid_id) AS rn
                      FROM scored$t) s WHERE rn = 1),
         sums$t AS (SELECT centroid_id, i, SUM(c) AS s FROM (
                      SELECT centroid_id, posexplode(code) AS (i, c)
                      FROM assign$t) z$t
                    GROUP BY centroid_id, i),
         cent$t AS (SELECT centroid_id,
                    transform(array_sort(collect_list(struct(i, s))), x -> x.s) AS csum
                    FROM sums$t GROUP BY centroid_id),""")
    }
    sb.append(
      s"""
         cnF AS (SELECT centroid_id, csum, sqrt(${dotc("csum", "csum")}) AS cqn
                 FROM cent$iters),
         scoredF AS (SELECT c.vec_id, k.centroid_id,
                     ${cmOf("c.code", "k.csum", "c.vqn", "k.cqn")} AS cm
                     FROM codes_n c CROSS JOIN cnF k),
         assignF AS (SELECT vec_id, centroid_id FROM (
                     SELECT vec_id, centroid_id,
                            row_number() OVER (PARTITION BY vec_id
                                               ORDER BY cm DESC, centroid_id) AS rn
                     FROM scoredF) s WHERE rn = 1)""")
    sb.toString
  }

  /** Twin of the trained-IVF oracle: the shared trained chain plus the
    * probe/candidate/re-rank tail.
    */
  private def trainedIvfSql(iters: Int, nLists: Int, nQueries: Int,
                            nProbe: Int, k: Int): String = {
    val sb = new StringBuilder
    sb.append(trainedAssignCtes(iters, nLists))
    sb.append(
      s""",
         probes AS (SELECT vec_id AS query_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scoredF WHERE vec_id < $nQueries) s WHERE rn <= $nProbe),
         cand AS (SELECT DISTINCT p.query_id, a.vec_id
                  FROM assignF a JOIN probes p ON a.centroid_id = p.centroid_id
                  WHERE a.vec_id <> p.query_id),
         rr AS (SELECT cand.query_id, cand.vec_id,
                ${cosMicrosSql("q.qv", "e.v")} AS m
                FROM cand
                JOIN e ON e.vec_id = cand.vec_id
                JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries) q
                  ON q.qid = cand.query_id),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM rr)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= $k ORDER BY query_id, rank""")
    sb.toString
  }

  /** Twin of the recall-report oracle: trained-IVF top-k and exhaustive
    * top-k from the shared chain, overlap counted per query.
    */
  private def recallReportSql(iters: Int, nLists: Int, nQueries: Int,
                              nProbe: Int, k: Int): String =
    trainedAssignCtes(iters, nLists) +
      s""",
         probes AS (SELECT vec_id AS query_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scoredF WHERE vec_id < $nQueries) s WHERE rn <= $nProbe),
         cand AS (SELECT DISTINCT p.query_id, a.vec_id
                  FROM assignF a JOIN probes p ON a.centroid_id = p.centroid_id
                  WHERE a.vec_id <> p.query_id),
         rr AS (SELECT cand.query_id, cand.vec_id,
                ${cosMicrosSql("q.qv", "e.v")} AS m
                FROM cand
                JOIN e ON e.vec_id = cand.vec_id
                JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries) q
                  ON q.qid = cand.query_id),
         approx AS (SELECT query_id, vec_id FROM (
                    SELECT query_id, vec_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY m DESC, vec_id) AS rank
                    FROM rr) r WHERE rank <= $k),
         scoredX AS (SELECT q.qid AS query_id, e.vec_id,
                     ${cosMicrosSql("q.qv", "e.v")} AS m
                     FROM e CROSS JOIN (SELECT vec_id AS qid, v AS qv FROM e
                                        WHERE vec_id < $nQueries) q
                     WHERE e.vec_id <> q.qid),
         exact AS (SELECT query_id, vec_id FROM (
                   SELECT query_id, vec_id,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY m DESC, vec_id) AS rank
                   FROM scoredX) r WHERE rank <= $k),
         mt AS (SELECT x.query_id, count(a.vec_id) AS n_match
                FROM exact x LEFT JOIN approx a
                  ON a.query_id = x.query_id AND a.vec_id = x.vec_id
                GROUP BY x.query_id)
         SELECT query_id, n_match,
                (20000 * n_match + $k) DIV (2 * $k) AS recall_1e4
         FROM mt ORDER BY query_id"""

  /** Twin of the semantic-dedup oracle: the shared trained chain, then a
    * vector is dropped iff a smaller-id same-cluster vector clears the
    * exact float cosine threshold.
    */
  private def semanticDedupSql(iters: Int, nLists: Int,
                               thresholdMicros: Long,
                               trainFilterSql: String = ""): String =
    trainedAssignCtes(iters, nLists, trainFilterSql) +
      s""",
         drops AS (SELECT DISTINCT a.vec_id
                   FROM assignF a
                   JOIN assignF b ON a.centroid_id = b.centroid_id
                                 AND b.vec_id < a.vec_id
                   JOIN e ea ON ea.vec_id = a.vec_id
                   JOIN e eb ON eb.vec_id = b.vec_id
                   WHERE ${cosMicrosSql("ea.v", "eb.v")} >= $thresholdMicros)
         SELECT a.vec_id, a.centroid_id AS cluster_id,
                d.vec_id IS NULL AS kept
         FROM assignF a LEFT JOIN drops d ON d.vec_id = a.vec_id
         ORDER BY a.vec_id"""

  /** Twin of the PQ oracle: per-subspace k-means (sub_id as an extra key
    * throughout), then ADC scoring with the m lut values folded in pinned
    * sub order (array_sort over (sub_id, lv) structs — Spark's collect_list
    * has no ORDER BY).
    */
  /** The PQ codebook CTE chain (Spark dialect), composable after any block
    * defining codes/codes_n; ends at plut, names p-prefixed.
    */
  private def pqCodebookCtes(m: Int, subDim: Int, ksub: Int, iters: Int,
                             nQueries: Int): String = {
    def dotc(a: String, b: String): String = dotCodesSpark(a, b)
    def cmOf(a: String, b: String, na: String, nb: String): String =
      s"CAST(floor((${dotc(a, b)} / ($na * $nb)) " +
        "* CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val sb = new StringBuilder
    sb.append(
      s"""subc AS (SELECT vec_id,
                  posexplode(transform(sequence(0, ${m - 1}),
                    s -> slice(code, s * $subDim + 1, $subDim))) AS (sub_id, scode)
                  FROM codes),
         subc_n AS (SELECT vec_id, sub_id, scode, sqrt(${dotc("scode", "scode")}) AS sqn
                    FROM subc),
         pcent0 AS (SELECT sub_id, vec_id AS centroid_id, scode AS csum,
                    CAST(1 AS BIGINT) AS cnt
                    FROM subc WHERE vec_id < $ksub),""")
    for (t <- 1 to iters) {
      val p = t - 1
      sb.append(
        s"""
         pcn$p AS (SELECT sub_id, centroid_id, csum,
                   sqrt(${dotc("csum", "csum")}) AS cqn
                   FROM pcent$p),
         pscored$t AS (SELECT c.vec_id, c.sub_id, c.scode, k.centroid_id,
                       ${cmOf("c.scode", "k.csum", "c.sqn", "k.cqn")} AS cm
                       FROM subc_n c JOIN pcn$p k ON c.sub_id = k.sub_id),
         passign$t AS (SELECT vec_id, sub_id, scode, centroid_id FROM (
                       SELECT vec_id, sub_id, scode, centroid_id,
                              row_number() OVER (PARTITION BY vec_id, sub_id
                                                 ORDER BY cm DESC, centroid_id) AS rn
                       FROM pscored$t) s WHERE rn = 1),
         psums$t AS (SELECT sub_id, centroid_id, i, SUM(c) AS s, COUNT(*) AS n FROM (
                       SELECT sub_id, centroid_id, posexplode(scode) AS (i, c)
                       FROM passign$t) z$t
                     GROUP BY sub_id, centroid_id, i),
         pcent$t AS (SELECT sub_id, centroid_id,
                     transform(array_sort(collect_list(struct(i, s))), x -> x.s) AS csum,
                     MAX(n) AS cnt
                     FROM psums$t GROUP BY sub_id, centroid_id),""")
    }
    sb.append(
      s"""
         pcnFn AS (SELECT sub_id, centroid_id, csum, cnt,
                   sqrt(${dotc("csum", "csum")}) AS cqn
                   FROM pcent$iters),
         pscoredF AS (SELECT c.vec_id, c.sub_id, k.centroid_id,
                      ${cmOf("c.scode", "k.csum", "c.sqn", "k.cqn")} AS cm
                      FROM subc_n c JOIN pcnFn k ON c.sub_id = k.sub_id),
         passignF AS (SELECT vec_id, sub_id, centroid_id FROM (
                      SELECT vec_id, sub_id, centroid_id,
                             row_number() OVER (PARTITION BY vec_id, sub_id
                                                ORDER BY cm DESC, centroid_id) AS rn
                      FROM pscoredF) s WHERE rn = 1),
         nsq AS (SELECT sub_id, centroid_id,
                 ${dotc("csum", "csum")} / (CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)) AS nsq
                 FROM pcnFn),
         xs AS (SELECT a.vec_id,
                sqrt(aggregate(transform(array_sort(collect_list(struct(a.sub_id, n.nsq))),
                  x -> x.nsq), CAST(0 AS DOUBLE), (x, y) -> x + y)) AS xn
                FROM passignF a
                JOIN nsq n ON n.sub_id = a.sub_id AND n.centroid_id = a.centroid_id
                GROUP BY a.vec_id),
         plut AS (SELECT q.vec_id AS query_id, c.sub_id, c.centroid_id,
                  ${dotc("q.scode", "c.csum")} / CAST(c.cnt AS DOUBLE) AS lv
                  FROM subc_n q JOIN pcnFn c ON q.sub_id = c.sub_id
                  WHERE q.vec_id < $nQueries)""")
    sb.toString
  }

  /** The ADC scoring tail (Spark dialect); `candidateCte` restricts
    * scoring to the IVF-routed (query, vec) pairs.
    */
  private def pqAdcTail(k: Int, candidateCte: String = ""): String = {
    val candJoin =
      if (candidateCte.isEmpty) ""
      else s"JOIN $candidateCte c ON c.query_id = p.query_id AND c.vec_id = a.vec_id"
    s""",
         padc AS (SELECT p.query_id, a.vec_id,
                  aggregate(transform(array_sort(collect_list(struct(a.sub_id, p.lv))),
                    x -> x.lv), CAST(0 AS DOUBLE), (x, y) -> x + y) AS adc
                  FROM passignF a
                  JOIN plut p ON p.sub_id = a.sub_id AND p.centroid_id = a.centroid_id
                  $candJoin
                  WHERE a.vec_id <> p.query_id
                  GROUP BY p.query_id, a.vec_id),
         pqscored AS (SELECT d.query_id, d.vec_id,
                    CAST(floor((d.adc / (q.vqn * x.xn)) * CAST(1000000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS m
                    FROM padc d
                    JOIN codes_n q ON q.vec_id = d.query_id
                    JOIN xs x ON x.vec_id = d.vec_id),
         pqranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM pqscored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM pqranked WHERE rank <= $k ORDER BY query_id, rank"""
  }

  private def pqSql(m: Int, subDim: Int, ksub: Int, iters: Int,
                    nQueries: Int, k: Int): String =
    codesHeaderCtes + ",\n         " +
      pqCodebookCtes(m, subDim, ksub, iters, nQueries) + pqAdcTail(k)

  /** Twin of the IVF-PQ oracle: coarse trained chain for routing + PQ
    * chain for compression + candidate-restricted ADC tail.
    */
  private def ivfPqSql(p: graft.SparkEntry.IvfPq.type): String =
    trainedAssignCtes(p.coarseIters, p.nLists) + ",\n         " +
      pqCodebookCtes(p.m, p.subDim, p.ksub, p.pqIters, p.nQueries) +
      s""",
         probes AS (SELECT vec_id AS query_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scoredF WHERE vec_id < ${p.nQueries}) s WHERE rn <= ${p.nProbe}),
         cand AS (SELECT DISTINCT pr.query_id, a.vec_id
                  FROM assignF a JOIN probes pr ON a.centroid_id = pr.centroid_id
                  WHERE a.vec_id <> pr.query_id)""" +
      pqAdcTail(p.k, candidateCte = "cand")

  // ------------------------------------------------------------- the twins

  /** Hand-written Spark-dialect SQL for every query whose DuckDB oracle is
    * not directly runnable by Spark. Keys must stay a subset of
    * SparkEntry.queries.
    */
  val twins: Map[String, String] = Map(

    // TPC-H classics — shared templates from Analytics, Spark dialect
    // (DIV integer division, date_format month key); the DuckDB oracle
    // uses the same text with "//" and strftime, so the three surfaces
    // cannot drift. The div-free classics (volume shipping, top supplier,
    // min-cost supplier) ride `portable` instead.
    "q_market_share" ->
      graft.operators.Analytics.marketShareSql("DIV", "NATION_15", "AFRICA", "ECONOMY"),
    "q_promotion_effect" ->
      graft.operators.Analytics.promotionEffectSql("DIV", "date_format(l_shipdate, 'yyyy-MM')"),
    "q_small_qty_revenue" ->
      graft.operators.Analytics.smallQtyRevenueSql("DIV", "Brand#1"),
    "q_traffic_kpi_report" ->
      graft.operators.Analytics.trafficKpiReportSql("DIV", "unix_micros", 30),

    "q_ann_bruteforce_topk" -> annBruteforceSql,
    "q_hard_negatives" -> hardNegativesSql,
    "q_ann_ivf_topk" -> annIvfSql,
    "q_ann_lsh_topk" -> annLshSql,
    // parameters come straight from SparkEntry.TrainedIvf so operator,
    // oracle, and twin share one source and cannot drift independently
    "q_kmeans_cluster_report" -> (trainedAssignCtes(
      graft.SparkEntry.TrainedIvf.iters, graft.SparkEntry.TrainedIvf.nLists) +
      s""",
         best AS (SELECT vec_id, centroid_id, cm FROM (
                  SELECT vec_id, centroid_id, cm,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY cm DESC, centroid_id) AS rn
                  FROM scoredF) s WHERE rn = 1),
         agg AS (SELECT centroid_id, count(*) AS n_vecs, sum(cm) AS cm_sum
                 FROM best GROUP BY 1)
         SELECT centroid_id, n_vecs,
                (cm_sum - cm_sum % n_vecs) DIV n_vecs AS mean_sim_micro
         FROM agg ORDER BY centroid_id"""),
    "q_ann_recall_report" -> recallReportSql(
      graft.SparkEntry.TrainedIvf.iters, graft.SparkEntry.TrainedIvf.nLists,
      graft.SparkEntry.TrainedIvf.nQueries, graft.SparkEntry.TrainedIvf.nProbe,
      graft.SparkEntry.TrainedIvf.k),
    "q_ann_ivf_trained_topk" -> trainedIvfSql(
      graft.SparkEntry.TrainedIvf.iters, graft.SparkEntry.TrainedIvf.nLists,
      graft.SparkEntry.TrainedIvf.nQueries, graft.SparkEntry.TrainedIvf.nProbe,
      graft.SparkEntry.TrainedIvf.k),
    "q_ann_pq_topk" -> pqSql(
      graft.SparkEntry.PqAnn.m, graft.SparkEntry.PqAnn.subDim,
      graft.SparkEntry.PqAnn.ksub, graft.SparkEntry.PqAnn.iters,
      graft.SparkEntry.PqAnn.nQueries, graft.SparkEntry.PqAnn.k),
    "q_ann_ivfpq_topk" -> ivfPqSql(graft.SparkEntry.IvfPq),
    "q_semantic_dedup" -> semanticDedupSql(
      graft.SparkEntry.SemDedup.iters, graft.SparkEntry.SemDedup.nLists,
      graft.SparkEntry.SemDedup.thresholdMicros),
    "q_semantic_dedup_incremental" -> semanticDedupSql(
      graft.SparkEntry.SemDedup.iters, graft.SparkEntry.SemDedup.nLists,
      graft.SparkEntry.SemDedup.thresholdMicros,
      trainFilterSql = "vec_id < (SELECT max(vec_id) * 4 div 5 FROM embeddings)"),

    "q_hybrid_search" -> {
      val H = graft.SparkEntry.Hybrid
      s"""WITH toks AS (SELECT DISTINCT doc_id, tok FROM
                        (SELECT doc_id, explode($toksSql) AS tok FROM documents)),
         w AS (SELECT tok, CAST(1000000 DIV count(*) AS BIGINT) AS w
               FROM toks GROUP BY tok HAVING count(*) <= ${H.maxDf}),
         idx AS (SELECT t.doc_id, t.tok, w.w FROM toks t JOIN w USING (tok)),
         qt AS (SELECT doc_id AS query_id, tok FROM idx
                WHERE doc_id < ${H.nQueries}),
         lex AS (SELECT q.query_id, i.doc_id, sum(i.w) AS lex_score
                 FROM idx i JOIN qt q USING (tok)
                 WHERE i.doc_id <> q.query_id
                 GROUP BY q.query_id, i.doc_id),
         lexr AS (SELECT query_id, doc_id, lex_rank FROM (
                  SELECT query_id, doc_id,
                         CAST(row_number() OVER (PARTITION BY query_id
                           ORDER BY lex_score DESC, doc_id) AS BIGINT) AS lex_rank
                  FROM lex) WHERE lex_rank <= ${H.candK}),
         e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id < ${H.nQueries}),
         vs AS (SELECT query_id, vec_id AS doc_id,
                ${cosMicrosSql("qv", "v")} AS m
                FROM e CROSS JOIN q WHERE vec_id <> query_id),
         vr AS (SELECT query_id, doc_id, vec_rank FROM (
                SELECT query_id, doc_id,
                       CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY m DESC, doc_id) AS BIGINT) AS vec_rank
                FROM vs) WHERE vec_rank <= ${H.candK}),
         f AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
                      coalesce(l.doc_id, v.doc_id) AS doc_id,
                      l.lex_rank, v.vec_rank,
                      coalesce(CAST(1000000 DIV (${H.rrfK} + l.lex_rank) AS BIGINT), 0L)
                        + coalesce(CAST(1000000 DIV (${H.rrfK} + v.vec_rank) AS BIGINT), 0L)
                        AS rrf_micro
               FROM lexr l FULL OUTER JOIN vr v
                 ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
         SELECT query_id, rank, doc_id, rrf_micro, lex_rank, vec_rank FROM (
           SELECT query_id, doc_id, rrf_micro, lex_rank, vec_rank,
                  CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
           FROM f) WHERE rank <= ${H.k}
         ORDER BY query_id, rank"""
    },

    "q_bm25_search" -> {
      val B = graft.SparkEntry.Bm25
      s"""WITH tf AS (SELECT doc_id, tok, count(*) AS tf FROM
                      (SELECT doc_id, explode($toksSql) AS tok FROM documents)
                      GROUP BY doc_id, tok),
         dl AS (SELECT doc_id, CAST(size($toksSql) AS BIGINT) AS dl FROM documents),
         st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
         dfb AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok
                 HAVING count(*) * 1000 <= (SELECT n_docs FROM st) * ${B.maxDfPermille}),
         idx AS (SELECT t.doc_id, t.tok, t.tf, d.df FROM tf t JOIN dfb d USING (tok)),
         qt AS (SELECT doc_id AS query_id, tok FROM idx
                WHERE doc_id < ${B.nQueries}),
         sc AS (SELECT q.query_id, i.doc_id,
                CAST(sum(
                  (((2 * (st.n_docs - i.df) + 1) * CAST(1000000 AS BIGINT) DIV (2 * i.df + 1))
                   * ((i.tf * ${B.k1Milli + 1000} * CAST(1000000000 AS BIGINT))
                      DIV (i.tf * 1000000 + ${B.k1Milli} *
                         (1000 - ${B.bMilli} + (${B.bMilli} * dl.dl * st.n_docs) DIV st.total_tokens))))
                  DIV 1000000) AS BIGINT) AS score_micro,
                count(*) AS n_terms
                FROM idx i JOIN qt q USING (tok)
                JOIN dl ON dl.doc_id = i.doc_id CROSS JOIN st
                WHERE i.doc_id <> q.query_id
                GROUP BY q.query_id, i.doc_id)
         SELECT query_id, rank, doc_id, score_micro, n_terms FROM (
           SELECT query_id, doc_id, score_micro, n_terms,
                  CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
           FROM sc) WHERE rank <= ${B.k}
         ORDER BY query_id, rank"""
    },

    // unnest(range(...)) -> explode(sequence(...)); ws[i] -> element_at
    "q_phrase_search" -> {
      val toks = graft.SparkEntry.Phrase.tokens
      val anchorCtes = toks.zipWithIndex.map { case (t, i) =>
        s"a$i AS (SELECT doc_id, pos - $i AS start_pos FROM p WHERE tok = '$t')"
      }.mkString(",\n         ")
      val joinChain = toks.indices.tail
        .map(i => s"JOIN a$i USING (doc_id, start_pos)").mkString(" ")
      s"""WITH d AS (SELECT doc_id, $toksSql AS ws FROM documents),
         p AS (SELECT doc_id, i - 1 AS pos, element_at(ws, i) AS tok
               FROM (SELECT doc_id, ws, explode(sequence(1, size(ws))) AS i
                     FROM d WHERE size(ws) >= 1)),
         $anchorCtes,
         m AS (SELECT a0.doc_id, a0.start_pos FROM a0 $joinChain)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
                CAST(min(start_pos) AS BIGINT) AS first_pos
         FROM m GROUP BY doc_id ORDER BY doc_id"""
    },

    // list_slice -> slice; // -> DIV; prefix norms recomputed per dim
    "q_ann_dim_ablation" -> {
      val A = graft.SparkEntry.Ablation
      def rankedSql(d: Int): String =
        s"""ab$d AS (SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY ${cosMicrosSql(s"slice(q.qv, 1, $d)", s"slice(e.v, 1, $d)")} DESC, e.vec_id) AS rank
             FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
           WHERE rank <= ${A.k})"""
      val dimBlocks = A.dims.map(rankedSql).mkString(",\n         ")
      val unioned = A.dims.map(d =>
        s"SELECT $d AS dim, query_id, vec_id FROM ab$d").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id < ${A.nQueries}),
         truth AS (SELECT query_id, vec_id FROM (
           SELECT q.query_id, e.vec_id,
                  row_number() OVER (PARTITION BY q.query_id
                    ORDER BY ${cosMicrosSql("q.qv", "e.v")} DESC, e.vec_id) AS rank
           FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
           WHERE rank <= ${A.k}),
         $dimBlocks,
         ab AS ($unioned)
         SELECT CAST(ab.dim AS BIGINT) AS dim,
                CAST(count(*) AS BIGINT) AS n_retrieved,
                CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                CAST((20000 * sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) + count(*))
                     DIV (2 * count(*)) AS BIGINT) AS recall_1e4
         FROM ab LEFT JOIN truth t
           ON t.query_id = ab.query_id AND t.vec_id = ab.vec_id
         GROUP BY ab.dim ORDER BY dim"""
    },

    "q_cluster_sample" ->
      (trainedAssignCtes(graft.SparkEntry.SemDedup.iters,
        graft.SparkEntry.SemDedup.nLists) +
        s""",
           ranked AS (SELECT vec_id, centroid_id,
                      row_number() OVER (PARTITION BY centroid_id
                        ORDER BY md5(CAST(vec_id AS STRING)), vec_id) AS rn
                      FROM assignF)
           SELECT vec_id, centroid_id AS cluster_id, CAST(rn AS BIGINT) AS sample_rank
           FROM ranked WHERE rn <= ${graft.SparkEntry.ClusterSample.perCluster}
           ORDER BY vec_id"""),

    // ASOF JOIN has no Spark SQL surface; same semantics via the latest
    // order at-or-before each event (dedup makes (custkey, orderdate)
    // unique, so the DESC pick is deterministic).
    "q_asof_join_events_orders" ->
      """WITH dedup AS (
           SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
           FROM orders GROUP BY o_custkey, o_orderdate),
         o2 AS (
           SELECT dedup.o_custkey, dedup.o_orderdate, dedup.o_orderkey,
                  orders.o_totalprice
           FROM dedup JOIN orders ON orders.o_orderkey = dedup.o_orderkey),
         j AS (SELECT e.event_id, e.user_id, o2.o_orderkey, o2.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o2.o_orderdate DESC) AS rn
               FROM events e JOIN o2
                 ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate)
         SELECT event_id, user_id, o_orderkey, o_totalprice
         FROM j WHERE rn = 1 ORDER BY event_id""",

    "q_centroid_affinity" ->
      """WITH codes AS (SELECT vec_id, label, pos, code
           FROM (SELECT vec_id, label,
                 posexplode(transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)
                                   + CAST(0.5 AS DOUBLE)) AS BIGINT))) AS (pos, code)
                 FROM embeddings)),
         cent AS (SELECT label, pos, CAST(sum(code) AS BIGINT) AS csum,
                  count(*) AS n_label
                  FROM codes GROUP BY label, pos)
         SELECT c.vec_id, CAST(c.label AS BIGINT) AS label,
                CAST(max(t.n_label) AS BIGINT) AS n_label,
                CAST(sum(c.code * t.csum) AS BIGINT) AS affinity_q
         FROM codes c JOIN cent t ON c.label = t.label AND c.pos = t.pos
         GROUP BY c.vec_id, c.label ORDER BY c.vec_id""",

    // parallel unnest(range)/list_transform -> one posexplode (0-based pos)
    "q_embed_dim_stats" ->
      """WITH codes AS (SELECT
           posexplode(transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)
                             + CAST(0.5 AS DOUBLE)) AS BIGINT))) AS (dim, code)
           FROM embeddings)
         SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
                CAST(sum(CASE WHEN code > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                CAST(sum(CASE WHEN code < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
                CAST(min(code) AS BIGINT) AS min_code,
                CAST(max(code) AS BIGINT) AS max_code,
                CAST(sum(code) AS BIGINT) AS sum_code
         FROM codes GROUP BY dim ORDER BY dim""",

    // parallel unnests -> one posexplode over the flattened product grid
    "q_embed_gram" ->
      """WITH c AS (SELECT transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)
                             + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS c
           FROM embeddings),
         ex AS (SELECT d, k, p
                FROM (SELECT size(c) AS d,
                        posexplode(flatten(transform(c, x -> transform(c, y -> x * y)))) AS (k, p)
                      FROM c))
         SELECT CAST(k DIV d AS BIGINT) AS dim_i, CAST(k % d AS BIGINT) AS dim_j,
                count(*) AS n, sum(p) AS sum_ij
         FROM ex GROUP BY 1, 2 ORDER BY dim_i, dim_j""",

    "q_chunk_docs" ->
      s"""WITH $chunkCtes
         SELECT doc_id, chunk_idx, CAST(size(chunk) AS BIGINT) AS chunk_tokens,
                md5(array_join(chunk, ' ')) AS chunk_md5
         FROM ch ORDER BY doc_id, chunk_idx""",

    "q_chunk_dedup" ->
      s"""WITH $chunkCtes
         SELECT md5(array_join(chunk, ' ')) AS chunk_md5,
                count(DISTINCT doc_id) AS n_docs,
                count(*) AS n_occurrences,
                min(doc_id) AS keeper_doc_id
         FROM ch
         GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         ORDER BY chunk_md5""",

    "q_cohort_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id,
           CAST(unix_micros(ts) DIV 1000000 DIV 86400 AS BIGINT) AS day_idx
           FROM events),
         c AS (SELECT user_id, min(day_idx) AS cohort_day FROM ud GROUP BY user_id)
         SELECT cohort_day, day_idx - cohort_day AS day_offset,
                count(DISTINCT ud.user_id) AS n_active
         FROM ud JOIN c ON ud.user_id = c.user_id
         GROUP BY cohort_day, day_offset
         ORDER BY cohort_day, day_offset""",

    "q_corpus_funnel" ->
      s"""WITH $minhashVerifyCtes,
         drops AS (SELECT DISTINCT doc_b AS doc_id FROM verify WHERE jaccard_1e4 >= 5000),
         qm AS (SELECT doc_id, ${qualityMetrics("ws")}
             FROM d JOIN documents USING (doc_id)),
         qs AS (SELECT doc_id, $qualityScoreSql AS quality_1e4
             FROM qm),
         ls AS (SELECT doc_id, ${langScores("ws")}
             FROM d),
         f AS (SELECT doc.doc_id, doc.n_chars,
             coalesce(qs.quality_1e4 >= 5000, FALSE) AS q_ok,
             coalesce(ls.s_en >= ls.s_de AND ls.s_en >= ls.s_fr AND ls.s_en >= ls.s_es, FALSE) AS l_ok,
             (dr.doc_id IS NOT NULL) AS dup
             FROM documents doc
             LEFT JOIN qs ON qs.doc_id = doc.doc_id
             LEFT JOIN ls ON ls.doc_id = doc.doc_id
             LEFT JOIN drops dr ON dr.doc_id = doc.doc_id),
         a AS (SELECT
             CAST(count(*) AS BIGINT) AS c0, CAST(sum(n_chars) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN q_ok THEN n_chars ELSE 0 END) AS BIGINT) AS h1,
             CAST(sum(CASE WHEN q_ok AND l_ok THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN q_ok AND l_ok THEN n_chars ELSE 0 END) AS BIGINT) AS h2,
             CAST(sum(CASE WHEN q_ok AND l_ok AND NOT dup THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(sum(CASE WHEN q_ok AND l_ok AND NOT dup THEN n_chars ELSE 0 END) AS BIGINT) AS h3
             FROM f)
         SELECT stage, docs_kept, chars_kept FROM (
           SELECT '0_all' AS stage, c0 AS docs_kept, h0 AS chars_kept FROM a
           UNION ALL SELECT '1_quality', c1, h1 FROM a
           UNION ALL SELECT '2_lang_en', c2, h2 FROM a
           UNION ALL SELECT '3_dedup', c3, h3 FROM a)
         ORDER BY stage""",

    "q_corpus_report" ->
      s"""WITH t AS (SELECT source, text, $toksSql AS toks FROM documents),
         m AS (SELECT source, ${qualityMetrics("toks")}, ${langScores("toks")}
             FROM t),
         q AS (SELECT source, n_tokens,
             CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                  THEN 1 ELSE 0 END AS is_en,
             coalesce($qualityScoreSql, 0) AS q4
             FROM m)
         SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(is_en) AS BIGINT) AS en_docs,
           CAST(sum(q4) AS BIGINT) AS quality_sum_1e4
         FROM q GROUP BY source ORDER BY source""",

    "q_cube_events" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
         coalesce(hour, 'ALL') AS hour,
         count(*) AS n_events, round(sum(value), 4) AS sum_value
         FROM (SELECT event_type, date_format(ts, 'HH') AS hour, value FROM events)
         GROUP BY CUBE(event_type, hour)
         ORDER BY event_type, hour""",

    "q_date_parts_orders" ->
      """WITH p AS (SELECT
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(dayofweek(o_orderdate) - 1 AS BIGINT) AS dow0,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS isoweek,
           date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS month_start,
           date_format(last_day(CAST(o_orderdate AS DATE)), 'yyyy-MM-dd') AS month_end
           FROM orders)
         SELECT yr, qtr, mon, month_start, month_end,
           count(*) AS n_orders,
           CAST(sum(dow0) AS BIGINT) AS sum_dow0,
           CAST(sum(doy) AS BIGINT) AS sum_doy,
           CAST(sum(dom) AS BIGINT) AS sum_dom,
           CAST(max(isoweek) AS BIGINT) AS max_isoweek,
           count(DISTINCT dom) AS distinct_days
         FROM p GROUP BY yr, qtr, mon, month_start, month_end
         ORDER BY yr, mon""",

    "q_dedup_apply" ->
      s"""WITH $minhashVerifyCtes,
         drops AS (SELECT DISTINCT doc_b AS doc_id FROM verify WHERE jaccard_1e4 >= 5000)
         SELECT source, count(*) AS kept_docs,
                CAST(sum(n_chars) AS BIGINT) AS kept_chars
         FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM drops)
         GROUP BY source ORDER BY source""",

    "q_dedup_exact" ->
      s"""WITH t AS (SELECT doc_id, md5(array_join($toksSql, ' ')) AS fp FROM documents)
         SELECT fp, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
         FROM t GROUP BY fp ORDER BY fp""",

    // LATERAL unnest(generate_series) -> posexplode over transform(sequence);
    // t[i:i+k-1] -> slice(t, i, k); len -> size; array_to_string -> array_join;
    // k interpolated from the one Dedup.SubstringK constant
    "q_substring_spans" -> {
      val k = graft.operators.Dedup.SubstringK
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         grams AS (
           SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos, g
           FROM (SELECT doc_id,
                        posexplode(transform(sequence(1, size(t) - ${k - 1}),
                                             i -> md5(array_join(slice(t, i, $k), ' ')))) AS (i, g)
                 FROM toks WHERE size(t) >= $k)),
         dup_pos AS (
           SELECT doc_id, pos FROM (
             SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS df FROM grams)
           WHERE df >= 2),
         ids AS (
           SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS island
           FROM (SELECT doc_id, pos,
                        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k
                             THEN 0 ELSE 1 END AS brk
                 FROM dup_pos))
         SELECT doc_id, min(pos) AS span_start, max(pos) + ${k - 1} AS span_end,
                count(*) AS n_windows
         FROM ids GROUP BY doc_id, island ORDER BY doc_id, span_start"""
    },

    "q_dedup_incremental" ->
      s"""WITH $minhashVerifyCtes,
         mx AS (SELECT max(doc_id) * 4 DIV 5 AS split FROM documents)
         SELECT doc_a, doc_b, jaccard_1e4 FROM verify, mx
         WHERE jaccard_1e4 >= 5000 AND doc_b >= split
         ORDER BY doc_a, doc_b""",

    "q_dedup_minhash_lsh" ->
      s"""WITH $minhashVerifyCtes
         SELECT doc_a, doc_b, jaccard_1e4 FROM verify
         WHERE jaccard_1e4 >= 5000 ORDER BY doc_a, doc_b""",

    // naive any-shared-shingle exact join (same algorithm as the oracle,
    // Spark dialect) — the operator's prefix filter is an execution
    // strategy, not different semantics
    // LSH recall per true-Jaccard bucket (mirror of the oracle text)
    "q_dedup_recall_report" ->
      s"""WITH $minhashVerifyCtes,
         ex2 AS (SELECT doc_id, n_sh, shingle
                 FROM (SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_sh,
                              explode(sh) AS shingle FROM shd)),
         ep AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.n_sh AS na, b.n_sh AS nb, count(*) AS common
                FROM ex2 a JOIN ex2 b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh),
         exact AS (SELECT doc_a, doc_b,
                          (20000 * common + (na + nb - common))
                          DIV (2 * (na + nb - common)) AS j
                   FROM ep
                   WHERE (20000 * common + (na + nb - common))
                         DIV (2 * (na + nb - common)) >= 5000),
         f AS (SELECT doc_a, doc_b FROM verify WHERE jaccard_1e4 >= 5000),
         jj AS (SELECT e.j,
                       CASE WHEN f.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
                FROM exact e
                LEFT JOIN f ON f.doc_a = e.doc_a AND f.doc_b = e.doc_b),
         b AS (SELECT least((j - 5000) DIV 1000, CAST(4 AS BIGINT)) AS bucket,
                      CAST(count(*) AS BIGINT) AS n_pairs,
                      CAST(sum(hit) AS BIGINT) AS n_found
               FROM jj GROUP BY least((j - 5000) DIV 1000, CAST(4 AS BIGINT)))
         SELECT bucket, 5000 + 1000 * bucket AS lo_1e4, n_pairs, n_found,
                (20000 * n_found + n_pairs) DIV (2 * n_pairs) AS recall_1e4
         FROM b ORDER BY bucket""",

    "q_dedup_prefix_filter" ->
      s"""WITH $shingleCtes,
         ex AS (SELECT doc_id, n_sh, shingle
                FROM (SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_sh, explode(sh) AS shingle
                      FROM shd)),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, b.n_sh AS nb, count(*) AS common
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh)
         SELECT doc_a, doc_b,
                (20000 * common + (na + nb - common))
                DIV (2 * (na + nb - common)) AS jaccard_1e4
         FROM pairs
         WHERE (20000 * common + (na + nb - common))
               DIV (2 * (na + nb - common)) >= 5000
         ORDER BY doc_a, doc_b""",

    "q_dedup_ngram_jaccard" ->
      s"""WITH $shingleCtes,
         ex AS (SELECT doc_id, n_sh, shingle
                FROM (SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_sh, explode(sh) AS shingle
                      FROM shd)),
         flt AS (SELECT * FROM (
             SELECT doc_id, n_sh, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM ex) f
           WHERE df <= 100),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, b.n_sh AS nb, count(*) AS common
           FROM flt a JOIN flt b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT doc_a, doc_b,
                (20000 * common + (na + nb - common))
                DIV (2 * (na + nb - common)) AS jaccard_1e4
         FROM pairs
         WHERE (20000 * common + (na + nb - common))
               DIV (2 * (na + nb - common)) >= 5000
         ORDER BY doc_a, doc_b""",

    // directed containment: both directions of each candidate pair, each
    // normalized by its own contained-side shingle count
    "q_dedup_containment" ->
      s"""WITH $shingleCtes,
         ex AS (SELECT doc_id, n_sh, shingle
                FROM (SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_sh, explode(sh) AS shingle
                      FROM shd)),
         flt AS (SELECT * FROM (
             SELECT doc_id, n_sh, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM ex) f
           WHERE df <= 100),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, count(*) AS common
           FROM flt a JOIN flt b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
           GROUP BY 1, 2, 3)
         SELECT doc_a, doc_b,
                (20000 * common + na) DIV (2 * na) AS containment_1e4
         FROM pairs
         WHERE (20000 * common + na) DIV (2 * na) >= 7000
         ORDER BY doc_a, doc_b""",

    // source×source shingle-set Jaccard, every unordered pair incl. disjoint
    "q_source_overlap" ->
      s"""WITH $shingleSrcCtes,
         ss AS (SELECT DISTINCT source, shingle
                FROM (SELECT source, explode(sh) AS shingle FROM shd)),
         sz AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY source),
         inter AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS cm
                   FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
                   GROUP BY 1, 2),
         pairs AS (SELECT za.source AS source_a, zb.source AS source_b,
                          za.n_sh AS na, zb.n_sh AS nb
                   FROM sz za JOIN sz zb ON za.source < zb.source)
         SELECT p.source_a, p.source_b,
                coalesce(i.cm, CAST(0 AS BIGINT)) AS common,
                p.na + p.nb - coalesce(i.cm, CAST(0 AS BIGINT)) AS union_sh,
                (20000 * coalesce(i.cm, CAST(0 AS BIGINT))
                 + (p.na + p.nb - coalesce(i.cm, CAST(0 AS BIGINT))))
                DIV (2 * (p.na + p.nb - coalesce(i.cm, CAST(0 AS BIGINT)))) AS jaccard_1e4
         FROM pairs p LEFT JOIN inter i
           ON i.source_a = p.source_a AND i.source_b = p.source_b
         ORDER BY p.source_a, p.source_b""",

    // per-band bucket distribution + exact candidate-pair budget
    "q_lsh_band_stats" ->
      s"""WITH $shingleCtes,
         sigs AS (SELECT doc_id, sh, $minhashSigs FROM shd),
         bands AS (SELECT doc_id, $minhashBands FROM sigs),
         br AS ($minhashBandRows),
         bk AS (SELECT band_idx, band_val, count(*) AS sz FROM br GROUP BY 1, 2)
         SELECT CAST(band_idx AS BIGINT) AS band_idx,
                sum(sz) AS n_rows,
                count(*) AS n_buckets,
                max(sz) AS max_bucket,
                sum(CASE WHEN sz > 1 THEN 1L ELSE 0L END) AS n_colliding,
                sum(sz * (sz - 1) DIV 2) AS candidate_pairs
         FROM bk GROUP BY 1 ORDER BY 1""",

    // relational twin of the Bloom band screen: a band "hits" iff its 4
    // positions all join against the distinct inserted-position set; a
    // doc is flagged iff any of its bands hits
    "q_bloom_screen" ->
      s"""WITH $shingleCtes,
         sigs AS (SELECT doc_id, sh, $minhashSigs FROM shd),
         bands AS (SELECT doc_id, $minhashBands FROM sigs),
         br AS ($minhashBandRows),
         bk AS (SELECT doc_id, concat(CAST(band_idx AS STRING), band_val) AS bkey,
                       substring(md5(CAST(doc_id AS STRING)), 1, 8)
                         < '${graft.operators.Sampling.hexThreshold(0.8)}' AS seen
                FROM br),
         pos AS (SELECT doc_id, bkey, seen,
                        explode(array(${Dedup.bloomPositions("bkey").mkString(", ")})) AS pos
                 FROM bk),
         setbits AS (SELECT DISTINCT pos FROM pos WHERE seen),
         seenb AS (SELECT DISTINCT bkey FROM bk WHERE seen),
         bandhits AS (SELECT pp.doc_id, pp.bkey, count(*) AS nhit
                      FROM pos pp JOIN setbits sb ON pp.pos = sb.pos
                      WHERE NOT pp.seen GROUP BY 1, 2),
         probe AS (SELECT k.doc_id,
                          bool_or(coalesce(h.nhit, 0) = 4) AS bloom_hit,
                          bool_or(sb2.bkey IS NOT NULL) AS candidate
                   FROM bk k
                   LEFT JOIN bandhits h ON k.doc_id = h.doc_id AND k.bkey = h.bkey
                   LEFT JOIN seenb sb2 ON k.bkey = sb2.bkey
                   WHERE NOT k.seen GROUP BY 1)
         SELECT doc.source AS source, count(*) AS n_probe,
                CAST(sum(CASE WHEN p.bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hit,
                CAST(sum(CASE WHEN p.candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
                CAST(sum(CASE WHEN p.bloom_hit AND NOT p.candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
         FROM probe p JOIN documents doc ON doc.doc_id = p.doc_id
         GROUP BY 1 ORDER BY 1""",

    // DSIR-style data selection: smoothed df-lift toward the target feed;
    // DECIMAL(38,0) truncated quotient mirrors the operator
    "q_domain_affinity" ->
      s"""WITH $shingleSrcCtes,
         ex AS (SELECT doc_id, source, CAST(size(sh) AS BIGINT) AS n_sh, shingle
                FROM (SELECT doc_id, source, sh, explode(sh) AS shingle FROM shd)),
         df AS (SELECT shingle,
                       sum(CASE WHEN source = '${SparkEntry.Affinity.targetSource}' THEN 1L ELSE 0L END) AS t_df,
                       sum(CASE WHEN source <> '${SparkEntry.Affinity.targetSource}' THEN 1L ELSE 0L END) AS c_df
                FROM ex GROUP BY shingle),
         tot AS (SELECT sum(CASE WHEN source = '${SparkEntry.Affinity.targetSource}' THEN 1L ELSE 0L END) AS t_docs,
                        sum(CASE WHEN source <> '${SparkEntry.Affinity.targetSource}' THEN 1L ELSE 0L END) AS c_docs
                 FROM shd),
         w AS (SELECT e.doc_id, e.n_sh,
                      CAST(10000 AS DECIMAL(38,0)) * CAST(f.t_df + 1 AS DECIMAL(38,0))
                        * CAST(t.c_docs + 1 AS DECIMAL(38,0)) AS wnum,
                      CAST(f.c_df + 1 AS DECIMAL(38,0))
                        * CAST(t.t_docs + 1 AS DECIMAL(38,0)) AS wden
               FROM ex e JOIN df f ON e.shingle = f.shingle CROSS JOIN tot t
               WHERE e.source <> '${SparkEntry.Affinity.targetSource}'),
         ws AS (SELECT doc_id, n_sh,
                       sum(CAST((wnum - wnum % wden) / wden AS BIGINT)) AS w_sum
                FROM w GROUP BY doc_id, n_sh)
         SELECT doc_id, n_sh, w_sum DIV n_sh AS affinity_1e4
         FROM ws ORDER BY doc_id""",

    // BPE first-merge pair statistics over the word histogram
    "q_bpe_pair_counts" ->
      s"""WITH d AS (SELECT $toksSql AS ws FROM documents),
         wc AS (SELECT w, count(*) AS freq
                FROM (SELECT explode(ws) AS w FROM d) GROUP BY w),
         pr AS (SELECT substring(w, i, 1) AS left_sym, substring(w, i + 1, 1) AS right_sym, freq
                FROM (SELECT w, freq, explode(sequence(1, length(w) - 1)) AS i
                      FROM wc WHERE length(w) >= 2))
         SELECT left_sym, right_sym, sum(freq) AS n_pairs
         FROM pr GROUP BY 1, 2
         ORDER BY n_pairs DESC, left_sym, right_sym LIMIT 20""",

    // top bigram collocations by exact integer exp(PMI) lift; the
    // DECIMAL(38,0) truncated quotient mirrors the operator (c_ab * N
    // overflows BIGINT at warehouse-scale token counts)
    "q_collocations" ->
      s"""WITH d AS (SELECT $toksSql AS ws FROM documents),
         uc AS (SELECT w, count(*) AS c
                FROM (SELECT explode(ws) AS w FROM d) GROUP BY w),
         tot AS (SELECT sum(c) AS n_tokens FROM uc),
         bc AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c_ab
                FROM (SELECT explode(transform(sequence(0, size(ws) - 2),
                        i -> named_struct('w1', element_at(ws, i + 1),
                                          'w2', element_at(ws, i + 2)))) AS p
                      FROM d WHERE size(ws) >= 2)
                GROUP BY 1, 2 HAVING count(*) >= ${SparkEntry.Colloc.minCount}),
         j AS (SELECT b.w1, b.w2, b.c_ab, a.c AS c_a, c2.c AS c_b,
                      CAST(10000 AS DECIMAL(38,0)) * CAST(b.c_ab AS DECIMAL(38,0))
                        * CAST(t.n_tokens AS DECIMAL(38,0)) AS num,
                      CAST(a.c AS DECIMAL(38,0)) * CAST(c2.c AS DECIMAL(38,0)) AS den
               FROM bc b JOIN uc a ON b.w1 = a.w JOIN uc c2 ON b.w2 = c2.w
               CROSS JOIN tot t)
         SELECT w1, w2, c_ab, c_a, c_b,
                CAST((num - num % den) / den AS BIGINT) AS lift_1e4
         FROM j ORDER BY lift_1e4 DESC, w1, w2 LIMIT ${SparkEntry.Colloc.topK}""",

    // bigram-LM quality scoring: ws[i] 1-based -> element_at; // -> DIV
    "q_bigram_lm_score" ->
      s"""WITH d AS (SELECT doc_id, lang, $toksSql AS ws FROM documents),
         bg AS (SELECT doc_id, lang, p.w1 AS w1, p.w2 AS w2
                FROM (SELECT doc_id, lang,
                        explode(transform(sequence(0, size(ws) - 2),
                          i -> named_struct('w1', element_at(ws, i + 1),
                                            'w2', element_at(ws, i + 2)))) AS p
                      FROM d WHERE size(ws) >= 2)),
         model AS (SELECT w1, w2, count(*) AS c12 FROM bg
                   WHERE lang = '${SparkEntry.BigramLm.refLang}' GROUP BY 1, 2),
         heads AS (SELECT w1, count(*) AS c1 FROM bg
                   WHERE lang = '${SparkEntry.BigramLm.refLang}' GROUP BY 1),
         v AS (SELECT count(*) AS v FROM heads),
         terms AS (SELECT bg.doc_id,
                     ((coalesce(m.c12, CAST(0 AS BIGINT)) + 1) * 1000000)
                       DIV (coalesce(h.c1, CAST(0 AS BIGINT)) + v.v) AS term
                   FROM bg
                   LEFT JOIN model m ON bg.w1 = m.w1 AND bg.w2 = m.w2
                   LEFT JOIN heads h ON bg.w1 = h.w1
                   CROSS JOIN v)
         SELECT doc_id, count(*) AS n_bigrams,
                CAST(sum(term) DIV count(*) AS BIGINT) AS lm_score_1e6
         FROM terms GROUP BY doc_id ORDER BY doc_id""",

    // FastSS deletion-1 neighborhood candidates + exact levenshtein verify
    "q_fuzzy_join_names" ->
      """WITH v AS (SELECT DISTINCT c_custkey, c_name, variant
           FROM (SELECT c_custkey, c_name,
                 explode(transform(sequence(0, length(c_name)),
                   i -> concat(substring(c_name, 1, i), substring(c_name, i + 2)))) AS variant
                 FROM customer)),
         cand AS (SELECT DISTINCT a.c_custkey AS cust_a, a.c_name AS name_a,
                  b.c_custkey AS cust_b, b.c_name AS name_b
                  FROM v a JOIN v b
                    ON a.variant = b.variant AND a.c_custkey < b.c_custkey)
         SELECT cust_a, cust_b,
                CAST(levenshtein(name_a, name_b) AS BIGINT) AS distance
         FROM cand WHERE levenshtein(name_a, name_b) <= 1
         ORDER BY cust_a, cust_b""",

    "q_dedup_simhash" ->
      s"""WITH $simhashCtes
         SELECT doc_id, simhash FROM sims ORDER BY doc_id""",

    "q_dedup_simhash_pairs" ->
      s"""WITH $simhashCtes,
         br AS (SELECT doc_id, simhash, 0 AS band_idx, simhash & 255 AS band_val FROM sims
                UNION ALL SELECT doc_id, simhash, 1, shiftright(simhash, 8) & 255 FROM sims
                UNION ALL SELECT doc_id, simhash, 2, shiftright(simhash, 16) & 255 FROM sims
                UNION ALL SELECT doc_id, simhash, 3, shiftright(simhash, 24) & 255 FROM sims),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  bit_count(a.simhash ^ b.simhash) AS hamming
                  FROM br a JOIN br b
                    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                       AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming FROM cand
         WHERE hamming <= 3 ORDER BY doc_a, doc_b""",

    "q_dedup_sorted_neighborhood" ->
      s"""WITH $simhashCtes,
         b AS (SELECT doc_id, simhash,
               shiftright(simhash, 16) & 65535 AS block0,
               shiftright(simhash + 32768, 16) & 65535 AS block1 FROM sims),
         l0 AS (SELECT doc_id, simhash,
               lag(doc_id, 1) OVER w AS p1, lag(simhash, 1) OVER w AS s1,
               lag(doc_id, 2) OVER w AS p2, lag(simhash, 2) OVER w AS s2
               FROM b
               WINDOW w AS (PARTITION BY block0 ORDER BY simhash, doc_id)),
         l1 AS (SELECT doc_id, simhash,
               lag(doc_id, 1) OVER w AS p1, lag(simhash, 1) OVER w AS s1,
               lag(doc_id, 2) OVER w AS p2, lag(simhash, 2) OVER w AS s2
               FROM b
               WINDOW w AS (PARTITION BY block1 ORDER BY simhash, doc_id)),
         pr AS (
           SELECT least(doc_id, p1) AS doc_a, greatest(doc_id, p1) AS doc_b,
                  bit_count(simhash ^ s1) AS hamming
           FROM l0 WHERE p1 IS NOT NULL
           UNION
           SELECT least(doc_id, p2), greatest(doc_id, p2),
                  bit_count(simhash ^ s2)
           FROM l0 WHERE p2 IS NOT NULL
           UNION
           SELECT least(doc_id, p1), greatest(doc_id, p1),
                  bit_count(simhash ^ s1)
           FROM l1 WHERE p1 IS NOT NULL
           UNION
           SELECT least(doc_id, p2), greatest(doc_id, p2),
                  bit_count(simhash ^ s2)
           FROM l1 WHERE p2 IS NOT NULL)
         SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
         FROM pr WHERE hamming <= 3 ORDER BY doc_a, doc_b""",

    "q_dense_daily_counts" ->
      """WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
         days AS (SELECT explode(sequence(d0, d1, interval 1 day)) AS day FROM span),
         types AS (SELECT DISTINCT event_type AS etype FROM events),
         actual AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
                    FROM events GROUP BY 1, 2)
         SELECT date_format(CAST(days.day AS DATE), 'yyyy-MM-dd') AS day,
                types.etype AS event_type,
                CAST(coalesce(actual.n, 0) AS BIGINT) AS n_events
         FROM days CROSS JOIN types
         LEFT JOIN actual ON CAST(days.day AS DATE) = actual.day
                         AND types.etype = actual.event_type
         ORDER BY day, event_type""",

    // Spark's recursive CTE only supports UNION ALL, so full transitive
    // reach is depth-bounded (8 hops — dup clusters are near-cliques with
    // diameter 2-3; the spec proves equality with the operator's true
    // connected components on the fixture).
    "q_dup_clusters" ->
      s"""WITH RECURSIVE $minhashVerifyCtes,
         prs AS (SELECT doc_a, doc_b FROM verify WHERE jaccard_1e4 >= 5000),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                   UNION SELECT doc_b, doc_a FROM prs),
         reach(a, b, d) AS (
           SELECT src, src, 0 FROM edges
           UNION ALL
           SELECT e.src, r.b, r.d + 1 FROM edges e JOIN reach r ON r.a = e.dst
           WHERE r.d < 8),
         lab AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY a)
         SELECT doc_id, cluster_id,
                count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         FROM lab ORDER BY doc_id""",

    // near-dup clustering chain + quality scores: every doc clustered
    // (its label or itself), kept = per-cluster quality argmax
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashVerifyCtes,
         prs AS (SELECT doc_a, doc_b FROM verify WHERE jaccard_1e4 >= 5000),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                   UNION SELECT doc_b, doc_a FROM prs),
         reach(a, b, d) AS (
           SELECT src, src, 0 FROM edges
           UNION ALL
           SELECT e.src, r.b, r.d + 1 FROM edges e JOIN reach r ON r.a = e.dst
           WHERE r.d < 8),
         lab AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY a),
         qm AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         qv AS (SELECT doc_id, text, ${qualityMetrics("toks")} FROM qm),
         qs AS (SELECT doc_id, $qualityScoreSql AS quality_1e4 FROM qv),
         fullc AS (SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id,
                          q.quality_1e4
                   FROM qs q LEFT JOIN lab l ON l.doc_id = q.doc_id)
         SELECT doc_id, cluster_id,
                count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
                quality_1e4,
                (row_number() OVER (PARTITION BY cluster_id
                   ORDER BY quality_1e4 DESC NULLS LAST, doc_id) = 1) AS kept
         FROM fullc ORDER BY doc_id""",

    "q_embed_lsh_pairs" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         planes AS (SELECT * FROM (VALUES $planesValuesSql) AS t(plane_id, plane)),
         dots AS (SELECT vec_id, plane_id, ${dotSql("v", "plane")} AS d
                  FROM e CROSS JOIN planes),
         sigs AS (SELECT vec_id,
                  CAST(sum(CASE WHEN d >= 0
                           THEN shiftleft(CAST(1 AS BIGINT), CAST(plane_id AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS sig
                  FROM dots GROUP BY vec_id),
         br AS (SELECT vec_id, 0 AS band_idx, sig & 255 AS band_val FROM sigs
                UNION ALL
                SELECT vec_id, 1, shiftright(sig, 8) & 255 FROM sigs),
         cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                  FROM br a JOIN br b
                    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                       AND a.vec_id < b.vec_id),
         v AS (SELECT cand.vec_a, cand.vec_b,
               ${cosMicrosSql("ea.v", "eb.v")} AS m
               FROM cand
               JOIN e ea ON ea.vec_id = cand.vec_a
               JOIN e eb ON eb.vec_id = cand.vec_b)
         SELECT vec_a, vec_b, $micro4Sql AS score
         FROM v WHERE m >= 300000 ORDER BY vec_a, vec_b""",

    "q_embed_nearest_in_label" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         pairs AS (SELECT a.vec_id, a.label, b.vec_id AS b_vec_id,
                   ${cosMicrosSql("a.v", "b.v")} AS m
                   FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
         ranked AS (SELECT vec_id, label, b_vec_id, m,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY m DESC, b_vec_id) AS rk
                    FROM pairs)
         SELECT vec_id, CAST(label AS BIGINT) AS label, b_vec_id AS nn_vec_id,
                $micro4Sql AS nn_score, m >= 950000 AS is_near_dup
         FROM ranked WHERE rk = 1 ORDER BY vec_id""",

    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         q AS (SELECT vec_id, v,
               transform(v, x -> CAST(floor(x * CAST(127 AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS codes FROM e)
         SELECT vec_id,
           CAST(aggregate(codes, CAST(0 AS BIGINT), (a, b) -> a + b) AS BIGINT) AS q_sum,
           CAST(array_min(codes) AS BIGINT) AS q_min,
           CAST(array_max(codes) AS BIGINT) AS q_max,
           CAST(floor(
             aggregate(zip_with(v, codes,
               (x, c) -> (x - CAST(c AS DOUBLE) / CAST(127 AS DOUBLE))
                       * (x - CAST(c AS DOUBLE) / CAST(127 AS DOUBLE))),
               CAST(0 AS DOUBLE), (a, b) -> a + b)
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mse_micro
         FROM q ORDER BY vec_id""",

    "q_etl_transform" ->
      """SELECT event_id AS row_id, date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS time,
         value AS traffic, '2026-01-01 00:00:00' AS created_at
         FROM events ORDER BY row_id""",

    "q_event_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, unix_micros(ts) AS t_us FROM events),
         s1 AS (SELECT user_id, min(t_us) AS t_prev FROM ev
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT ev.user_id, min(t_us) AS t_prev FROM ev
                JOIN s1 ON ev.user_id = s1.user_id
                WHERE event_type = 'click' AND t_us > s1.t_prev
                GROUP BY ev.user_id),
         s3 AS (SELECT ev.user_id, min(t_us) AS t_prev FROM ev
                JOIN s2 ON ev.user_id = s2.user_id
                WHERE event_type = 'purchase' AND t_us > s2.t_prev
                GROUP BY ev.user_id)
         SELECT '1_view' AS step, count(*) AS n_users FROM s1
         UNION ALL SELECT '2_click', count(*) FROM s2
         UNION ALL SELECT '3_purchase', count(*) FROM s3
         ORDER BY step""",

    "q_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
         SELECT doc_id, md5(array_join(toks, ' ')) AS fp_md5,
         aggregate(transform(toks, t -> CAST(length(t) * 131 + ascii(substr(t, 1, 1)) AS BIGINT)),
           CAST(7 AS BIGINT), (a, b) -> (a * 31 + b) % 1000000007) AS fp_rolling
         FROM t ORDER BY doc_id""",

    // winnowing: per-window min gram-hash, rightmost tiebreak packed as
    // (md5 asc, pos desc) into one string so min() decides both
    "q_winnow_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, array_join($toksSql, ' ') AS txt FROM documents),
         f AS (SELECT doc_id, txt FROM t WHERE length(txt) >= 8),
         h AS (SELECT doc_id, pos,
               concat(md5(substring(txt, pos + 1, 8)),
                      CASE WHEN pos < 999999
                           THEN lpad(CAST(999999 - pos AS STRING), 6, '0')
                           ELSE raise_error('winnow: document exceeds the 1e6-gram packing range') END) AS pk
               FROM (SELECT doc_id,
                       posexplode(transform(sequence(0, length(txt) - 8),
                         i -> substring(txt, i + 1, 8))) AS (pos, gram),
                       txt
                     FROM f)),
         wm AS (SELECT doc_id, pos,
               min(pk) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
               count(*) OVER (PARTITION BY doc_id) AS n
               FROM h),
         sel AS (SELECT DISTINCT doc_id, n, wmin FROM wm
                 WHERE pos <= greatest(n - 4, 0))
         SELECT doc_id, CAST(max(n) AS BIGINT) AS n_grams,
                CAST(count(*) AS BIGINT) AS n_fps,
                CAST(count(DISTINCT substring(wmin, 1, 32)) AS BIGINT) AS n_uniq_hashes,
                min(substring(wmin, 1, 32)) AS min_fp
         FROM sel GROUP BY doc_id ORDER BY doc_id""",

    "q_dedup_winnow" ->
      graft.operators.Dedup.winnowPairsSql(duck = false, toksSql, "DIV"),

    "q_dedup_substring" ->
      graft.operators.Dedup.substringDedupSql(duck = false, toksSql),

    "q_dedup_substring_incremental" ->
      graft.operators.Dedup.substringDedupSql(duck = false, toksSql,
        incremental = true, div = "DIV"),

    "q_substring_dup_profile" ->
      graft.operators.Dedup.substringDupProfileSql(duck = false, toksSql,
        div = "DIV"),

    "q_dedup_substring_rewrite" ->
      graft.operators.Dedup.substringDedupRewriteSql(duck = false, toksSql),

    // datediff argument order is the one dialect knob
    "q_theil_sen_trend" ->
      graft.operators.Analytics.theilSenTrendSql("datediff(b.day, a.day)"),

    // explode-vs-unnest is the one dialect knob
    "q_bootstrap_ci_revenue" ->
      graft.operators.Quality.bootstrapRevenueCiSql(duck = false),

    "q_forward_fill" ->
      """WITH c AS (SELECT user_id, event_id, ts,
           CASE WHEN substr(md5(CAST(event_id AS STRING)), 1, 1) IN ('0','1','2')
           THEN CAST(NULL AS BIGINT)
           ELSE CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
           END AS cents
           FROM events),
         g AS (SELECT user_id, event_id, cents,
               count(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
               FROM c)
         SELECT user_id, event_id, cents,
                CAST(max(cents) OVER (PARTITION BY user_id, grp) AS BIGINT) AS filled_cents
         FROM g ORDER BY user_id, event_id""",

    "q_audio_features" ->
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
         p AS (SELECT doc_id,
                 8000 + (ascii(substr(hx, 1, 1)) % 8) * 1000 AS sample_rate,
                 256 + (ascii(substr(hx, 2, 1)) % 16) * 64 AS n_samples,
                 512 + (ascii(substr(hx, 3, 1)) % 32) * 1000 AS amp,
                 1 + (ascii(substr(hx, 4, 1)) % 4) AS hp
               FROM m)
         SELECT doc_id AS asset_id,
                CAST(sample_rate AS INT) AS sample_rate,
                CAST(n_samples AS BIGINT) AS n_samples,
                CAST(n_samples * 1000 DIV sample_rate AS BIGINT) AS duration_ms,
                CAST(amp AS BIGINT) AS peak,
                CAST(amp AS BIGINT) * n_samples AS abs_sum,
                CAST((n_samples - 1) DIV hp AS BIGINT) AS zero_crossings
         FROM p ORDER BY asset_id""",

    "q_token_estimate" ->
      """WITH b AS (SELECT doc_id, coalesce(text, '') AS t,
           regexp_extract_all(coalesce(text, ''),
             "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}']+|\\s+", 0) AS bpe
           FROM documents),
         c AS (SELECT doc_id, t,
           CAST(size(filter(bpe, x -> NOT (x RLIKE '^\\s+$'))) AS BIGINT) AS nb
           FROM b)
         SELECT doc_id,
           CAST(size(regexp_extract_all(t, '\\S+', 0)) AS BIGINT) AS n_ws_tokens,
           nb AS n_bpe_tokens,
           CASE WHEN nb > 0 THEN
             CAST((20000 * CAST(length(t) AS BIGINT) + nb) DIV (2 * nb) AS BIGINT)
           ELSE NULL END AS chars_per_bpe_1e4
         FROM c ORDER BY doc_id""",

    "q_frame_features" ->
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
         p AS (SELECT doc_id,
                 CAST(16 + (ascii(substr(hx, 1, 1)) % 8) * 4 AS INTEGER) AS width,
                 CAST(16 + (ascii(substr(hx, 2, 1)) % 8) * 4 AS INTEGER) AS height,
                 CAST((ascii(substr(hx, 3, 1)) % 50) * 4 AS BIGINT) AS base,
                 CAST(2 + (ascii(substr(hx, 4, 1)) % 3) AS INTEGER) AS n_frames
               FROM m),
         sampled AS (SELECT DISTINCT doc_id, width, height, base, n_frames,
                       CAST((n_frames * t.i) DIV 3 AS INTEGER) AS frame_idx
                     FROM p CROSS JOIN (SELECT explode(sequence(0, 2)) AS i) t)
         SELECT doc_id AS asset_id, frame_idx, n_frames, width, height,
                CAST(3 * (base + 8 * frame_idx) AS BIGINT) * width * height AS channel_sum,
                CAST(base + 8 * frame_idx AS BIGINT) AS gray_level
         FROM sampled ORDER BY asset_id, frame_idx""",

    "q_interp_residuals" ->
      """WITH e AS (SELECT event_id, user_id, value,
           CAST(unix_micros(ts) DIV 1000000 AS BIGINT) AS t FROM events),
         l AS (SELECT event_id, user_id, value, t,
           lag(value) OVER w AS pv, lead(value) OVER w AS nv,
           lag(t) OVER w AS pt, lead(t) OVER w AS nt
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
         SELECT event_id, user_id,
           CASE WHEN pt IS NULL OR nt IS NULL OR nt = pt THEN NULL
           ELSE CAST(floor((value - (pv + (nv - pv)
             * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))))
             * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
           END AS residual_cents
         FROM l ORDER BY event_id""",

    "q_interval_overlaps" ->
      """WITH e AS (SELECT user_id, event_id,
           CAST(unix_micros(ts) DIV 1000000 AS BIGINT) AS lo,
           CAST(unix_micros(ts) DIV 1000000 + 600 AS BIGINT) AS hi
           FROM events),
         p AS (SELECT a.user_id,
               least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_sec
               FROM e a JOIN e b ON a.user_id = b.user_id
                                AND a.event_id < b.event_id
               WHERE a.lo < b.hi AND b.lo < a.hi)
         SELECT user_id, count(*) AS n_pairs,
                CAST(sum(overlap_sec) AS BIGINT) AS overlap_sec_total
         FROM p GROUP BY user_id ORDER BY user_id""",

    "q_join_shipping_priority" ->
      """SELECT l_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
         o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
         GROUP BY l_orderkey, orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q_json_extract_props" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         round(avg(CAST(get_json_object(props, '$.k') AS BIGINT)), 4) AS avg_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         sc AS (SELECT doc_id, ${langScores("toks")}
           FROM t)
         SELECT doc_id, s_en, s_de, s_fr, s_es,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END AS pred_lang
         FROM sc ORDER BY doc_id""",

    "q_percentiles_order_price" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
         round(percentile(o_totalprice, 0.5), 4) AS p50,
         round(percentile(o_totalprice, 0.9), 4) AS p90,
         round(percentile(o_totalprice, 0.99), 4) AS p99
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_pii_redact" ->
      """WITH a AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS STRING) ||
           '@mail.example.com or call 555-' ||
           lpad(CAST(doc_id % 1000 AS STRING), 3, '0') || '-' ||
           lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ||
           ' from 10.' || CAST(doc_id % 256 AS STRING) || '.0.1' AS aug
           FROM documents)
         SELECT doc_id,
           CAST(size(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)) AS BIGINT) AS n_emails,
           CAST(size(regexp_extract_all(aug, '\\b\\d{3}-\\d{3}-\\d{4}\\b', 0)) AS BIGINT) AS n_phones,
           CAST(size(regexp_extract_all(aug, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', 0)) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
             '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>'),
             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>')) AS redacted_md5
         FROM a ORDER BY doc_id""",

    // the declarative plain-join form the salted operator reproduces
    "q_salted_join_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_purchases,
                sum(CAST(floor(value * CAST(100 AS DOUBLE)
                    + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS revenue_cents
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         WHERE e.event_type = 'purchase'
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // ('0x'||h)::BIGINT -> conv(h,16,10); % -> pmod on the bucket key
    "q_load_reconciliation" ->
      """WITH rows_h AS (SELECT pmod(o_orderkey, 16) AS bucket, o_orderkey,
             CAST(conv(substr(md5(concat_ws('|',
                CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING),
                CAST(CAST(floor(o_totalprice * CAST(100 AS DOUBLE)
                     + CAST(0.5 AS DOUBLE)) AS BIGINT) AS STRING),
                CAST(o_orderdate AS STRING))), 1, 15), 16, 10) AS BIGINT) AS h
           FROM orders),
         a AS (SELECT bucket, count(*) AS n_src, bit_xor(h) AS x_src
               FROM rows_h GROUP BY bucket),
         b AS (SELECT bucket, count(*) AS n_dst, bit_xor(h) AS x_dst
               FROM rows_h WHERE o_orderkey % 997 <> 0 GROUP BY bucket)
         SELECT a.bucket, n_src, coalesce(n_dst, CAST(0 AS BIGINT)) AS n_dst,
                n_src - coalesce(n_dst, CAST(0 AS BIGINT)) AS rows_missing,
                CAST(CASE WHEN n_dst IS NOT NULL AND n_src = n_dst
                           AND x_src = x_dst THEN 1 ELSE 0 END AS INT)
                  AS checksum_match
         FROM a LEFT JOIN b ON a.bucket = b.bucket
         ORDER BY a.bucket""",

    // // -> DIV; the twin states the one-window CDF form the operator's
    // two-level sum reproduces exactly (boundary-independent by algebra)
    "q_equal_freq_binning" ->
      """WITH o AS (SELECT CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
                    FROM orders),
         h AS (SELECT cents, count(*) AS cnt FROM o GROUP BY cents),
         t AS (SELECT count(*) AS n FROM o),
         c AS (SELECT cents, cnt,
                      coalesce(sum(cnt) OVER (ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        CAST(0 AS BIGINT)) AS p
               FROM h)
         SELECT (10 * p) DIV n + 1 AS bin, sum(cnt) AS n_orders,
                min(cents) AS lo_cents, max(cents) AS hi_cents
         FROM c CROSS JOIN t GROUP BY (10 * p) DIV n + 1 ORDER BY bin""",

    // moment sums in DECIMAL(38,0), mirroring the operator: the oracle's
    // bare BIGINT products silently promote to int128 in DuckDB but
    // overflow in Spark once n grows (caught by the sf0.01 probe)
    "q_regr_slope_price_qty" ->
      """WITH b AS (SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(floor(l_extendedprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS p
           FROM lineitem),
         m AS (SELECT l_returnflag, count(*) AS n,
           sum(CAST(q AS DECIMAL(38,0))) AS sq, sum(CAST(p AS DECIMAL(38,0))) AS sp,
           sum(CAST(q * p AS DECIMAL(38,0))) AS sqp,
           sum(CAST(q * q AS DECIMAL(38,0))) AS sqq
           FROM b GROUP BY l_returnflag),
         d AS (SELECT l_returnflag, n,
           (CAST(n AS DECIMAL(38,0)) * sqp - sq * sp)
             * CAST(1000000 AS DECIMAL(38,0)) AS num,
           (CAST(n AS DECIMAL(38,0)) * sqq - sq * sq) AS den
           FROM m)
         SELECT l_returnflag, n,
                CAST((num - num % den) / den AS BIGINT) AS slope_cents_1e6
         FROM d ORDER BY l_returnflag""",

    "q_repetition_stats" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS ws FROM documents),
         g AS (SELECT doc_id, gram
               FROM (SELECT doc_id,
                     explode(transform(sequence(1, size(ws) - 1),
                       i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))) AS gram
                     FROM d WHERE size(ws) >= 2)),
         c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram),
         a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
               count(*) AS n_distinct, CAST(max(n) AS BIGINT) AS top_n
               FROM c GROUP BY doc_id)
         SELECT doc_id, n_grams, n_distinct,
           CAST((20000 * (n_grams - n_distinct) + n_grams) DIV (2 * n_grams) AS BIGINT)
             AS dup_gram_ratio_1e4,
           CAST((20000 * top_n + n_grams) DIV (2 * n_grams) AS BIGINT)
             AS top_gram_frac_1e4
         FROM a ORDER BY doc_id""",

    "q_revenue_share" ->
      """WITH rev AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS revenue_cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_nationkey),
         t AS (SELECT nationkey, revenue_cents,
               CAST(sum(revenue_cents) OVER () AS BIGINT) AS total_cents FROM rev)
         SELECT nationkey, revenue_cents,
                CAST((20000 * revenue_cents + total_cents) DIV (2 * total_cents) AS BIGINT)
                  AS share_1e4
         FROM t ORDER BY nationkey""",

    "q_rolling_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id,
           CAST(unix_micros(ts) DIV 1000000 DIV 86400 AS BIGINT) AS uday
           FROM events),
         mx AS (SELECT max(uday) AS mx FROM ud),
         ex AS (SELECT user_id, uday, uday + o AS wend
                FROM ud CROSS JOIN (SELECT explode(sequence(0, 6)) AS o) os),
         f AS (SELECT user_id, uday, wend FROM ex, mx WHERE wend <= mx)
         SELECT wend AS day,
           CAST(count(DISTINCT CASE WHEN uday = wend THEN user_id END) AS BIGINT) AS dau,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
         FROM f GROUP BY wend ORDER BY day""",

    "q_sample_exact_n" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
           md5(CAST(doc_id AS STRING)) AS hkey,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS STRING))) AS rk
           FROM documents)
         SELECT doc_id, source, n_chars FROM t
         WHERE rk <= 20 ORDER BY doc_id""",

    "q_sample_hash_docs" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE substr(md5(CAST(doc_id AS STRING)), 1, 8) < '40000000'
         ORDER BY doc_id""",

    "q_sample_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
           CAST(size($toksSql) AS BIGINT) AS n_tokens,
           md5(CAST(doc_id AS STRING)) AS hkey
           FROM documents),
         c AS (SELECT source, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_tokens
               FROM t)
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS mixed_tokens
         FROM c WHERE cum_tokens <= 2000
         GROUP BY source ORDER BY source""",

    "q_sample_weighted_mix" ->
      """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
         FROM documents
         WHERE substr(md5(CAST(doc_id AS STRING)), 1, 8) <
               CASE source WHEN 'src0' THEN 'g' WHEN 'src1' THEN '80000000' WHEN 'src2' THEN '40000000' WHEN 'src3' THEN '1999999a' WHEN 'src4' THEN '1999999a' WHEN 'src5' THEN '1999999a' ELSE '00000000' END
         GROUP BY source ORDER BY source""",

    // top-K heaviest join keys with share and ratio-to-mean
    "q_key_skew_audit" ->
      """WITH k AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
         t AS (SELECT sum(n_events) AS total, count(*) AS n_keys FROM k),
         r AS (SELECT user_id, n_events,
               row_number() OVER (ORDER BY n_events DESC, user_id) AS rank FROM k),
         d AS (SELECT rank, user_id, n_events, total, n_keys,
                      CAST(20000 AS DECIMAL(38,0)) * n_events * n_keys
                        + total AS rnum,
                      CAST(2 AS DECIMAL(38,0)) * total AS rden
               FROM r CROSS JOIN t WHERE rank <= 5)
         SELECT CAST(rank AS BIGINT) AS rank, user_id, n_events,
                (20000 * n_events + total) DIV (2 * total) AS share_1e4,
                CAST((rnum - rnum % rden) / rden AS BIGINT) AS ratio_to_avg_1e4
         FROM d ORDER BY rank""",

    // per-source token coverage of the global top-N vocabulary
    "q_vocab_coverage" ->
      s"""WITH t AS (SELECT source, explode($toksSql) AS w FROM documents),
         vc AS (SELECT w FROM (SELECT w, count(*) AS c FROM t
                               GROUP BY 1 ORDER BY c DESC, w LIMIT 10)),
         j AS (SELECT t.source, CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END AS cov
               FROM t LEFT JOIN vc v ON t.w = v.w)
         SELECT source, count(*) AS n_tokens, CAST(sum(cov) AS BIGINT) AS n_covered,
                (20000 * CAST(sum(cov) AS BIGINT) + count(*))
                DIV (2 * count(*)) AS coverage_1e4
         FROM j GROUP BY 1 ORDER BY 1""",

    // token-ID encoding: posexplode + ordered struct-sort reassembly
    // BPE merge learning: same unrolled template as the oracle, Spark
    // list dialect
    "q_bpe_train" ->
      graft.operators.TextAnalysis.bpeTrainSql(duck = false,
        SparkEntry.Bpe.merges),

    "q_bpe_encode" ->
      graft.operators.TextAnalysis.bpeEncodeSql(duck = false,
        SparkEntry.Bpe.merges),

    // DSIR scoring from the shared template, Spark dialect
    "q_importance_weights" ->
      graft.operators.TextAnalysis.importanceWeightsSql(duck = false,
        SparkEntry.Dsir.target, SparkEntry.Dsir.k),

    "q_encode_docs" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS ws FROM documents),
         tok AS (SELECT doc_id, CAST(pos + 1 AS BIGINT) AS pos, w
                 FROM d LATERAL VIEW posexplode(ws) t AS pos, w),
         cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
         vocab AS (SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w)
                      AS BIGINT) AS vid
                   FROM (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 16) t),
         enc AS (SELECT t.doc_id, t.pos, coalesce(v.vid, CAST(0 AS BIGINT)) AS id
                 FROM tok t LEFT JOIN vocab v ON v.w = t.w)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_oov,
                md5(array_join(transform(
                  sort_array(collect_list(struct(pos, id))),
                  x -> CAST(x.id AS STRING)), ',')) AS ids_md5
         FROM enc GROUP BY doc_id ORDER BY doc_id""",

    // incremental encode (frozen vocab from the reference slice)
    "q_encode_docs_incremental" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS ws FROM documents),
         mx AS (SELECT max(doc_id) * 4 DIV 5 AS split FROM documents),
         tok AS (SELECT doc_id, CAST(pos + 1 AS BIGINT) AS pos, w
                 FROM d LATERAL VIEW posexplode(ws) t AS pos, w),
         cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                 FROM tok, mx WHERE tok.doc_id < mx.split GROUP BY w),
         vocab AS (SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w)
                      AS BIGINT) AS vid
                   FROM (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 16) t),
         enc AS (SELECT t.doc_id, t.pos, coalesce(v.vid, CAST(0 AS BIGINT)) AS id
                 FROM tok t CROSS JOIN mx
                 LEFT JOIN vocab v ON v.w = t.w
                 WHERE t.doc_id >= mx.split)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_oov,
                md5(array_join(transform(
                  sort_array(collect_list(struct(pos, id))),
                  x -> CAST(x.id AS STRING)), ',')) AS ids_md5
         FROM enc GROUP BY doc_id ORDER BY doc_id""",

    // Tukey-fence outliers over integerized values
    "q_value_outliers" ->
      """WITH ev AS (SELECT event_type,
              CAST(floor(value * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v4
              FROM events),
         th AS (SELECT event_type, percentile(v4, array(0.25, 0.75)) AS p
                FROM ev GROUP BY 1),
         j AS (SELECT e.event_type, e.v4, p[0] AS p25, p[1] AS p75
               FROM ev e JOIN th t ON e.event_type = t.event_type),
         f AS (SELECT event_type, count(*) AS n_events,
               CAST(sum(CASE WHEN CAST(v4 AS DOUBLE) < p25 - 1.5 * (p75 - p25)
                              OR CAST(v4 AS DOUBLE) > p75 + 1.5 * (p75 - p25)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
               FROM j GROUP BY 1)
         SELECT event_type, n_events, n_outliers,
                (20000 * n_outliers + n_events) DIV (2 * n_events) AS outlier_1e4
         FROM f ORDER BY event_type""",

    // RFM quartile-score segment matrix; Spark percentile == quantile_cont
    "q_rfm_segments" ->
      """WITH per AS (SELECT o_custkey,
              datediff(CAST(max(o_orderdate) AS DATE), DATE '1970-01-01') AS rec_days,
              count(*) AS freq,
              sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS cents
              FROM orders GROUP BY 1),
         th AS (SELECT percentile(rec_days, array(0.25, 0.5, 0.75)) AS tr,
                       percentile(freq, array(0.25, 0.5, 0.75)) AS tf,
                       percentile(cents, array(0.25, 0.5, 0.75)) AS tm FROM per),
         sc AS (SELECT p.cents,
                CAST(1 + CAST(p.rec_days > tr[0] AS INT) + CAST(p.rec_days > tr[1] AS INT)
                       + CAST(p.rec_days > tr[2] AS INT) AS BIGINT) AS r_score,
                CAST(1 + CAST(p.freq > tf[0] AS INT) + CAST(p.freq > tf[1] AS INT)
                       + CAST(p.freq > tf[2] AS INT) AS BIGINT) AS f_score,
                CAST(1 + CAST(p.cents > tm[0] AS INT) + CAST(p.cents > tm[1] AS INT)
                       + CAST(p.cents > tm[2] AS INT) AS BIGINT) AS m_score
                FROM per p CROSS JOIN th)
         SELECT r_score, f_score, m_score, count(*) AS n_customers,
                sum(cents) AS cell_cents
         FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // first-order Markov transition matrix of per-user event flows
    "q_event_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
              lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
              FROM events),
         tr AS (SELECT event_type AS from_type, to_type, count(*) AS n_transitions
                FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
         wt AS (SELECT from_type, to_type, n_transitions,
                sum(n_transitions) OVER (PARTITION BY from_type) AS from_total
                FROM tr)
         SELECT from_type, to_type, n_transitions,
                (20000 * n_transitions + from_total) DIV (2 * from_total) AS share_1e4
         FROM wt ORDER BY from_type, to_type""",

    // string_agg(... ORDER BY) -> array_join over a struct-sorted
    // collect_list (rn is unique in the group, so the sort is total)
    "q_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, unix_micros(ts) AS ts_us FROM events),
         flagged AS (SELECT user_id, event_id, event_type, ts_us,
           CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     > 1800000000
                     OR lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
           FROM e),
         sessions AS (SELECT user_id, event_id, event_type, ts_us,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged),
         numbered AS (SELECT user_id, session_id, event_type, ts_us, event_id,
           row_number() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts_us, event_id) AS rn
           FROM sessions),
         paths AS (SELECT user_id, session_id,
           array_join(transform(array_sort(collect_list(struct(rn, event_type))),
                                x -> x.event_type), '>') AS path
           FROM numbered WHERE rn <= 5 GROUP BY user_id, session_id),
         counts AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY path),
         tot AS (SELECT sum(n_sessions) AS t FROM counts),
         ranked AS (SELECT path, n_sessions,
           (20000 * n_sessions + t) DIV (2 * t) AS share_1e4,
           row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
           FROM counts CROSS JOIN tot)
         SELECT CAST(rk AS BIGINT) AS rk, path, n_sessions, share_1e4
         FROM ranked WHERE rk <= 20 ORDER BY rk""",

    // epoch_us -> unix_micros; // -> DIV; window frames are shared syntax
    "q_interval_union_time" ->
      """WITH e AS (SELECT user_id, event_id, unix_micros(ts) AS ts_us,
                    unix_micros(ts) + 300000000 AS end_us FROM events),
         flagged AS (SELECT user_id, event_id, ts_us, end_us,
           CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                     OR ts_us > max(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_block
           FROM e),
         blocks AS (SELECT user_id, ts_us, end_us,
           sum(new_block) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block_id
           FROM flagged),
         merged AS (SELECT user_id, block_id, min(ts_us) AS b_start, max(end_us) AS b_end
                    FROM blocks GROUP BY user_id, block_id),
         per_user AS (SELECT user_id, count(*) AS n_blocks,
                      sum(b_end - b_start) AS covered_us,
                      max(b_end) - min(b_start) AS span_us
                      FROM merged GROUP BY user_id)
         SELECT user_id, n_blocks, covered_us, span_us,
                (20000 * covered_us + span_us) DIV (2 * span_us) AS density_1e4
         FROM per_user ORDER BY user_id""",

    // quantile_cont -> percentile; // -> DIV
    "q_mad_outliers" ->
      """WITH ev AS (SELECT event_type,
             CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
             FROM events),
         med AS (SELECT event_type,
                 CAST(percentile(2 * cents, CAST(0.5 AS DOUBLE)) AS BIGINT) AS med_x2
                 FROM ev GROUP BY event_type),
         dev AS (SELECT ev.event_type, cents, med_x2,
                 abs(2 * cents - med_x2) AS d2
                 FROM ev JOIN med USING (event_type)),
         mad AS (SELECT event_type,
                 CAST(percentile(2 * d2, CAST(0.5 AS DOUBLE)) AS BIGINT) AS mad_x4
                 FROM dev GROUP BY event_type),
         agg AS (SELECT dev.event_type, count(*) AS n_events,
                 max(med_x2) AS med_x2,
                 max(mad_x4) AS mad_x4,
                 sum(CASE WHEN 2 * d2 > 3 * mad_x4 THEN 1L ELSE 0L END) AS n_outliers
                 FROM dev JOIN mad USING (event_type) GROUP BY dev.event_type)
         SELECT event_type, n_events, med_x2, mad_x4, n_outliers,
                (20000 * n_outliers + n_events) DIV (2 * n_events) AS outlier_1e4
         FROM agg ORDER BY event_type""",

    // // -> DIV; the join chain itself is shared syntax
    "q_behavior_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         per AS (SELECT event_type, count(*) AS n_users
                 FROM ut GROUP BY event_type),
         pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_both
                   FROM ut a JOIN ut b ON a.user_id = b.user_id
                   WHERE a.event_type < b.event_type
                   GROUP BY 1, 2)
         SELECT p.type_a, p.type_b, p.n_both,
                pa.n_users AS n_a, pb.n_users AS n_b,
                (20000 * p.n_both + (pa.n_users + pb.n_users - p.n_both))
                     DIV (2 * (pa.n_users + pb.n_users - p.n_both)) AS jaccard_1e4
         FROM pairs p
         JOIN per pa ON pa.event_type = p.type_a
         JOIN per pb ON pb.event_type = p.type_b
         ORDER BY type_a, type_b""",

    // strftime -> date_format; // -> DIV
    "q_new_vs_returning" ->
      """WITH ud AS (SELECT DISTINCT user_id, date_format(ts, 'yyyy-MM-dd') AS day FROM events),
         f AS (SELECT user_id, day,
               min(day) OVER (PARTITION BY user_id) AS first_day FROM ud),
         agg AS (SELECT day, count(*) AS n_active,
                 sum(CASE WHEN day = first_day THEN 1L ELSE 0L END) AS n_new
                 FROM f GROUP BY day)
         SELECT day, n_active, n_new, n_active - n_new AS n_returning,
                (20000 * n_new + n_active) DIV (2 * n_active) AS new_share_1e4
         FROM agg ORDER BY day""",

    // dayofweek: Spark is 1-based (Sun=1), DuckDB 0-based -> subtract 1
    "q_dow_profile" ->
      """WITH e AS (SELECT event_type, CAST(dayofweek(ts) - 1 AS BIGINT) AS dow,
                    CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
                    FROM events),
         cell AS (SELECT event_type, dow, count(*) AS n_events,
                  sum(cents) AS cents_sum
                  FROM e GROUP BY event_type, dow),
         wt AS (SELECT event_type, dow, n_events, cents_sum,
                sum(n_events) OVER (PARTITION BY event_type) AS type_n,
                sum(cents_sum) OVER (PARTITION BY event_type) AS type_cents
                FROM cell)
         SELECT event_type, dow, n_events, cents_sum,
                (20000 * n_events + type_n) DIV (2 * type_n) AS traffic_share_1e4,
                (20000 * cents_sum + type_cents) DIV (2 * type_cents) AS value_share_1e4
         FROM wt ORDER BY event_type, dow""",

    // epoch_us -> unix_micros; WINDOW clause is shared Spark/DuckDB syntax
    "q_scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_id, event_type, unix_micros(ts) AS t_us FROM events),
         runs AS (SELECT user_id, event_id, event_type, t_us,
                  lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_type
                  FROM e),
         heads AS (SELECT user_id, event_id, event_type, t_us FROM runs
                   WHERE prev_type IS NULL OR prev_type <> event_type)
         SELECT user_id, event_type, t_us AS valid_from_us,
                lead(t_us) OVER w AS valid_to_us,
                CAST(row_number() OVER w AS BIGINT) AS version,
                (lead(t_us) OVER w IS NULL) AS is_current
         FROM heads
         WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
         ORDER BY user_id, version""",

    // epoch_us -> unix_micros, make_timestamp -> timestamp_micros, // -> DIV
    "q_conversion_window" ->
      """WITH e AS (SELECT user_id, event_id, event_type, unix_micros(ts) AS t_us FROM events),
         n AS (SELECT user_id, event_type, t_us,
               min(CASE WHEN event_type = 'purchase' THEN t_us END) OVER
                 (PARTITION BY user_id ORDER BY t_us, event_id
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_us
               FROM e),
         s AS (SELECT date_format(timestamp_micros(t_us), 'yyyy-MM-dd') AS day,
                      count(*) AS n_signups,
                      sum(CASE WHEN next_purchase_us IS NOT NULL
                                AND next_purchase_us - t_us <= 604800000000L
                          THEN 1L ELSE 0L END) AS n_converted
               FROM n WHERE event_type = 'signup' GROUP BY day)
         SELECT day, n_signups, n_converted,
                (20000 * n_converted + n_signups) DIV (2 * n_signups) AS conv_1e4
         FROM s ORDER BY day""",

    // epoch_us -> unix_micros; otherwise the oracle's BETWEEN form verbatim
    "q_scd2_point_lookup" ->
      """WITH e AS (SELECT user_id, event_id, event_type, unix_micros(ts) AS t_us FROM events),
         d AS (SELECT user_id, event_id, event_type, t_us,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_type
               FROM e WHERE event_type <> 'purchase'),
         heads AS (SELECT user_id, event_id, event_type, t_us FROM d
                   WHERE prev_type IS NULL OR prev_type <> event_type),
         dim AS (SELECT user_id, event_type AS state, t_us AS valid_from_us,
                        lead(t_us) OVER w AS valid_to_us,
                        CAST(row_number() OVER w AS BIGINT) AS state_version
                 FROM heads WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
         f AS (SELECT user_id, event_id, t_us FROM e WHERE event_type = 'purchase')
         SELECT f.event_id, f.user_id,
                coalesce(dim.state, '(none)') AS state,
                CAST(coalesce(dim.state_version, 0) AS BIGINT) AS state_version
         FROM f LEFT JOIN dim
           ON f.user_id = dim.user_id AND f.t_us >= dim.valid_from_us
           AND (dim.valid_to_us IS NULL OR f.t_us < dim.valid_to_us)
         ORDER BY f.event_id""",

    // epoch_us -> unix_micros; the count-group carry is already portable
    "q_attribution_last_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, unix_micros(ts) AS t_us,
             CASE WHEN event_type <> 'purchase' THEN event_type END AS chan
           FROM events),
         g AS (SELECT *,
             count(chan) OVER (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp_incl,
             count(chan) OVER (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS grp_excl
           FROM e),
         touches AS (SELECT user_id, grp_incl AS grp, chan FROM g WHERE chan IS NOT NULL),
         p AS (SELECT g.user_id, g.value, t.chan
               FROM g LEFT JOIN touches t ON g.user_id = t.user_id AND g.grp_excl = t.grp
               WHERE g.event_type = 'purchase')
         SELECT coalesce(chan, '(none)') AS channel,
                count(*) AS n_purchases,
                sum(CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS revenue_cents
         FROM p GROUP BY 1 ORDER BY channel""",

    // first-touch mirror (epoch_us -> unix_micros)
    "q_attribution_first_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, unix_micros(ts) AS t_us,
             CASE WHEN event_type <> 'purchase' THEN event_type END AS chan
           FROM events),
         g AS (SELECT *,
             count(chan) OVER (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp_incl,
             count(chan) OVER (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS grp_excl
           FROM e),
         touches AS (SELECT user_id, grp_incl AS grp, chan FROM g WHERE chan IS NOT NULL),
         p AS (SELECT g.user_id, g.value,
                      CASE WHEN g.grp_excl >= 1 THEN t.chan END AS chan
               FROM g LEFT JOIN touches t ON g.user_id = t.user_id AND t.grp = 1
               WHERE g.event_type = 'purchase')
         SELECT coalesce(chan, '(none)') AS channel,
                count(*) AS n_purchases,
                sum(CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS revenue_cents
         FROM p GROUP BY 1 ORDER BY channel""",

    // same generated text as the oracle with DIV and unix_micros
    "q_cohort_ltv" ->
      graft.operators.Analytics.cohortLtvSql("DIV", "unix_micros(ts)"),

    // same generated text as the oracle with DIV and unix_micros
    "q_time_weighted_value" ->
      graft.operators.Analytics.timeWeightedValueSql("DIV", "unix_micros(ts)"),

    // epoch_us -> unix_micros; // -> DIV
    "q_ewma_user_value" ->
      """WITH c AS (SELECT user_id, event_id, unix_micros(ts) AS t_us,
             CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
           FROM events),
         l AS (SELECT user_id, event_id, cents,
             lag(cents, 1) OVER w AS c1, lag(cents, 2) OVER w AS c2,
             lag(cents, 3) OVER w AS c3, lag(cents, 4) OVER w AS c4,
             lag(cents, 5) OVER w AS c5
           FROM c WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
         t AS (SELECT user_id, event_id, cents,
             32 * cents + coalesce(16 * c1, 0) + coalesce(8 * c2, 0)
               + coalesce(4 * c3, 0) + coalesce(2 * c4, 0) + coalesce(c5, 0) AS num,
             32 + CASE WHEN c1 IS NULL THEN 0 ELSE 16 END
                + CASE WHEN c2 IS NULL THEN 0 ELSE 8 END
                + CASE WHEN c3 IS NULL THEN 0 ELSE 4 END
                + CASE WHEN c4 IS NULL THEN 0 ELSE 2 END
                + CASE WHEN c5 IS NULL THEN 0 ELSE 1 END AS den
           FROM l)
         SELECT user_id, event_id, cents,
                CAST((20000 * num + den) DIV (2 * den) AS BIGINT) AS ewma_1e4
         FROM t ORDER BY user_id, event_id""",

    // epoch_us -> unix_micros; the bounded recursive CTE is shared shape
    // (Spark 4 WITH RECURSIVE; depth <= ~31 under the 24h window vs the
    // default 100-level limit)
    "q_throttle_dedup" ->
      s"""WITH RECURSIVE e AS (
           SELECT user_id, event_type, event_id, unix_micros(ts) AS t_us,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY unix_micros(ts), event_id) AS rn
           FROM events),
         nxt AS (SELECT a.user_id, a.event_type, a.rn, min(b.rn) AS next_rn
                 FROM e a JOIN e b ON b.user_id = a.user_id AND b.event_type = a.event_type
                   AND b.t_us > a.t_us + ${SparkEntry.Throttle.windowUs}
                 GROUP BY a.user_id, a.event_type, a.rn),
         kept AS (
           SELECT user_id, event_type, rn FROM e WHERE rn = 1
           UNION ALL
           SELECT n.user_id, n.event_type, n.next_rn
           FROM kept k JOIN nxt n ON n.user_id = k.user_id
             AND n.event_type = k.event_type AND n.rn = k.rn)
         SELECT e.user_id, e.event_type, e.event_id, e.t_us
         FROM e JOIN kept ON e.user_id = kept.user_id
           AND e.event_type = kept.event_type AND e.rn = kept.rn
         ORDER BY e.user_id, e.event_type, e.t_us, e.event_id""",

    // epoch_us -> unix_micros; VARCHAR -> STRING
    "q_profile_columns" ->
      """SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
                count(*) - count(o_custkey) AS n_nulls,
                count(DISTINCT o_custkey) AS n_distinct,
                CAST(min(o_custkey) AS STRING) AS min_repr,
                CAST(max(o_custkey) AS STRING) AS max_repr FROM orders
         UNION ALL
         SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
                count(DISTINCT o_orderdate),
                CAST(min(unix_micros(CAST(o_orderdate AS TIMESTAMP))) AS STRING),
                CAST(max(unix_micros(CAST(o_orderdate AS TIMESTAMP))) AS STRING) FROM orders
         UNION ALL
         SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
                count(DISTINCT o_orderkey),
                CAST(min(o_orderkey) AS STRING),
                CAST(max(o_orderkey) AS STRING) FROM orders
         UNION ALL
         SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
                count(DISTINCT o_orderpriority),
                min(o_orderpriority), max(o_orderpriority) FROM orders
         UNION ALL
         SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
                count(DISTINCT o_orderstatus),
                min(o_orderstatus), max(o_orderstatus) FROM orders
         UNION ALL
         SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
                count(DISTINCT o_totalprice),
                CAST(min(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS STRING),
                CAST(max(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS STRING) FROM orders
         ORDER BY column_name""",

    "q_sessionize_batch" ->
      """WITH e AS (SELECT user_id, event_id, ts, value, unix_micros(ts) AS ts_us FROM events),
         flagged AS (SELECT user_id, event_id, ts_us, value,
           CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     > 1800000000
                     OR lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
           FROM e),
         sessions AS (SELECT user_id, event_id, ts_us, value,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
                min(ts_us) AS start_us, max(ts_us) AS end_us,
                round(sum(value), 4) AS sum_value
         FROM sessions GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    // make_timestamp -> timestamp_micros + date_format; // -> DIV
    "q_session_quality" ->
      """WITH e AS (SELECT user_id, event_id, unix_micros(ts) AS ts_us FROM events),
         flagged AS (SELECT user_id, event_id, ts_us,
           CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     > 1800000000
                     OR lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
           FROM e),
         sessions AS (SELECT user_id, ts_us,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged),
         sess AS (SELECT user_id, session_id, count(*) AS n_events,
                         min(ts_us) AS start_us, max(ts_us) AS end_us
                  FROM sessions GROUP BY user_id, session_id),
         byday AS (SELECT date_format(timestamp_micros(start_us), 'yyyy-MM-dd') AS day,
                          count(*) AS n_sessions,
                          sum(CASE WHEN n_events = 1 THEN 1L ELSE 0L END) AS n_bounces,
                          sum(end_us - start_us) AS dur_sum
                   FROM sess GROUP BY day)
         SELECT day, n_sessions, n_bounces,
                (20000 * n_bounces + n_sessions) DIV (2 * n_sessions) AS bounce_1e4,
                (2 * dur_sum + n_sessions) DIV (2 * n_sessions) AS mean_dur_us
         FROM byday ORDER BY day""",

    "q_string_funcs" ->
      """SELECT c_custkey,
         upper(c_mktsegment) AS seg_upper,
         lower(c_name) AS name_lower,
         CAST(length(c_name) AS BIGINT) AS name_len,
         substr(c_name, 1, 8) AS name_prefix,
         replace(c_name, 'Customer', 'C') AS name_short,
         lpad(CAST(c_custkey AS STRING), 12, '0') AS key_padded,
         split_part(c_name, '#', 2) AS name_num,
         CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
         translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
         reverse(c_name) AS name_rev,
         concat_ws('|', c_mktsegment, c_name) AS seg_name,
         trim(BOTH '0' FROM split_part(c_name, '#', 2)) AS num_trimmed
         FROM customer ORDER BY c_custkey""",

    "q_text_clean" ->
      """WITH c AS (SELECT doc_id, text,
           trim(regexp_replace(regexp_replace(regexp_replace(text,
             '<[^>]*>', ' '), '[\\x00-\\x1f]', ' '), '\\s+', ' ')) AS cleaned
           FROM documents)
         SELECT doc_id, md5(cleaned) AS clean_fp,
                CAST(length(cleaned) AS BIGINT) AS clean_chars,
                CAST(length(text) - length(cleaned) AS BIGINT) AS removed_chars
         FROM c ORDER BY doc_id""",

    "q_text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         m AS (SELECT doc_id, text, ${qualityMetrics("toks")}
           FROM t)
         SELECT doc_id, n_tokens,
         CAST((20000 * stop_hits + n_tokens) DIV (2 * n_tokens) AS BIGINT) AS stop_ratio_1e4,
         CAST((20000 * punct_chars + text_len)
              DIV (2 * text_len) AS BIGINT) AS punct_ratio_1e4,
         $qualityScoreSql AS quality_1e4
         FROM m ORDER BY doc_id""",

    "q_text_stats" ->
      s"""WITH t AS (SELECT doc_id, n_chars, $toksSql AS toks FROM documents)
         SELECT doc_id, n_chars,
         CAST(size(toks) AS BIGINT) AS n_tokens,
         CAST(size(array_distinct(toks)) AS BIGINT) AS n_distinct,
         CAST((20000 * aggregate(transform(toks, t -> CAST(length(t) AS BIGINT)),
                                 CAST(0 AS BIGINT), (a, b) -> a + b)
               + CAST(size(toks) AS BIGINT))
              DIV (2 * CAST(size(toks) AS BIGINT)) AS BIGINT) AS avg_token_len_1e4
         FROM t ORDER BY doc_id""",

    "q_tfidf_top_terms" ->
      s"""WITH tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, explode($toksSql) AS term FROM documents)
             GROUP BY doc_id, term),
         s AS (SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf),
         r AS (SELECT doc_id, term, tf, df,
               CAST((tf * 1000000) DIV df AS BIGINT) AS score_1e6,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY CAST((tf * 1000000) DIV df AS BIGINT) DESC, term) AS rk
               FROM s)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, term,
                CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score_1e6
         FROM r WHERE rk <= 3 ORDER BY doc_id, rk""",

    "q_time_bucket_events" ->
      """SELECT date_format(ts, 'yyyy-MM-dd HH:00:00') AS bucket,
         count(*) AS n_events, round(sum(value), 4) AS sum_value,
         round(avg(value), 4) AS avg_value
         FROM events GROUP BY bucket ORDER BY bucket""",

    "q_top_tokens_per_source" ->
      """WITH tok AS (SELECT source, token
                      FROM (SELECT source,
                            explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
                            FROM documents)),
         counts AS (SELECT source, token, count(*) AS n FROM tok GROUP BY source, token),
         ranked AS (SELECT source, token, n,
                    row_number() OVER (PARTITION BY source ORDER BY n DESC, token) AS rk
                    FROM counts)
         SELECT source, CAST(rk AS BIGINT) AS rk, token, n
         FROM ranked WHERE rk <= 5 ORDER BY source, rk""",

    // the sketch quantile + its rank audit, entirely in Spark SQL
    "q_heavy_values_approx" ->
      s"""WITH v AS (SELECT o_totalprice AS v FROM orders),
         a AS (SELECT count(*) AS n,
                      approx_percentile(v, array(0.5, 0.9, 0.99), ${SparkEntry.ApproxPct.accuracy}) AS apx,
                      percentile(v, array(0.5, 0.9, 0.99)) AS exact
               FROM v),
         b AS (SELECT n, CAST(array(0.5, 0.9, 0.99)[i] AS DOUBLE) AS pct,
                      z.apx AS apx, z.exact AS exact
               FROM a LATERAL VIEW posexplode(arrays_zip(apx, exact)) t AS i, z),
         r AS (SELECT pct, n, exact,
                      sum(CASE WHEN v.v <= b.apx THEN 1L ELSE 0L END) AS rank_le
               FROM v CROSS JOIN b GROUP BY pct, n, apx, exact)
         SELECT pct, round(exact, 4) AS exact_px,
                CAST(abs(rank_le - pct * n) <=
                     CAST(2 AS DOUBLE) * n / ${SparkEntry.ApproxPct.accuracy}
                     + CAST(1 AS DOUBLE) AS INT) AS within_bound
         FROM r ORDER BY pct""",

    // inclusion-exclusion over real sketches — |types|-row frames, the
    // non-equi pair join is catalog-sized by construction
    "q_hll_overlap" ->
      s"""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
         sk AS (SELECT event_type, hll_sketch_agg(user_id, ${SparkEntry.Sketch.lgK}) AS sk,
                       count(DISTINCT user_id) AS card
                FROM events GROUP BY event_type),
         pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                          a.card AS card_a, b.card AS card_b,
                          hll_sketch_estimate(a.sk) + hll_sketch_estimate(b.sk)
                          - hll_sketch_estimate(hll_union(a.sk, b.sk)) AS est_overlap
                   FROM sk a JOIN sk b ON a.event_type < b.event_type),
         exact AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                          count(*) AS exact_overlap
                   FROM tu a JOIN tu b
                     ON a.user_id = b.user_id AND a.event_type < b.event_type
                   GROUP BY a.event_type, b.event_type)
         SELECT e.type_a, e.type_b, e.exact_overlap,
                CAST(abs(p.est_overlap - e.exact_overlap) <=
                     ${3.0 * 1.04 / math.sqrt((1L << SparkEntry.Sketch.lgK).toDouble)}
                     * (p.card_a + p.card_b) + CAST(24 AS DOUBLE) AS INT) AS within_bound
         FROM exact e JOIN pairs p
           ON e.type_a = p.type_a AND e.type_b = p.type_b
         ORDER BY e.type_a, e.type_b""",

    // real HLL++ aggregate + its 3-sigma audit, entirely in Spark SQL
    "q_distinct_users_approx" ->
      s"""SELECT event_type,
                 count(DISTINCT user_id) AS exact_users,
                 CAST(abs(approx_count_distinct(user_id, ${SparkEntry.Sketch.rsd})
                          - count(DISTINCT user_id)) <=
                      ${3.0 * SparkEntry.Sketch.rsd} * count(DISTINCT user_id)
                      + CAST(8 AS DOUBLE) AS INT) AS within_bound
         FROM events GROUP BY event_type ORDER BY event_type""",

    // the DataSketches cube rollup: per-day sketches unioned to per-type,
    // estimate audited against the exact distinct — all built-in SQL
    "q_hll_sketch_rollup" ->
      s"""WITH daily AS (SELECT event_type, to_date(ts) AS day,
                                hll_sketch_agg(user_id, ${SparkEntry.Sketch.lgK}) AS sk
                         FROM events GROUP BY event_type, to_date(ts)),
         rolled AS (SELECT event_type, count(*) AS n_days,
                           hll_sketch_estimate(hll_union_agg(sk)) AS est
                    FROM daily GROUP BY event_type),
         exact AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
                   FROM events GROUP BY event_type)
         SELECT exact.event_type, n_days, exact_users,
                CAST(abs(est - exact_users) <=
                     ${3.0 * 1.04 / math.sqrt((1L << SparkEntry.Sketch.lgK).toDouble)}
                     * exact_users + CAST(8 AS DOUBLE) AS INT) AS within_bound
         FROM exact JOIN rolled ON exact.event_type = rolled.event_type
         ORDER BY exact.event_type""",

    // the KLL build/merge aggregates are registered SQL functions, but
    // the quantile reader is a Scala closure (no SQL-side KLL reader
    // ships with Spark) — like CMS, the surface states the deterministic
    // contract the rank audit reproduces
    "q_quantile_rollup" ->
      """WITH e AS (SELECT event_type,
              CAST(count(DISTINCT date_format(ts, 'yyyy-MM-dd')) AS BIGINT)
                AS n_days,
              CAST(count(value) AS BIGINT) AS n
            FROM events GROUP BY event_type)
         SELECT event_type, pct, n_days, n, CAST(1 AS INT) AS within_bound
         FROM e LATERAL VIEW explode(array(0.5D, 0.9D, 0.99D)) t AS pct
         ORDER BY event_type, pct""",

    // count_min_sketch builds in SQL, but Spark ships no SQL-side reader
    // for the grid — the surface states the deterministic contract the
    // probe audit reproduces (CMS never undercounts; overcount <= eps*N)
    "q_cms_point_queries" ->
      """SELECT event_type, count(*) AS exact_n,
                CAST(1 AS INT) AS ge_exact, CAST(1 AS INT) AS within_eps
         FROM events GROUP BY event_type ORDER BY event_type""",

    // the sketch is a pruning screen only — the SQL surface states the
    // exact threshold the pruned-and-recounted operator reproduces
    "q_heavy_hitters" ->
      s"""WITH tok AS (SELECT explode(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+', 0)) AS tok
                       FROM documents),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
         SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         FROM tok CROSS JOIN t GROUP BY tok, t.n
         HAVING count(*) * ${SparkEntry.Heavy.k} > t.n
         ORDER BY cnt DESC, tok""",

    "q_upsert_orders" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
         u AS (SELECT o_orderkey, o_orderpriority,
                      o_totalprice + CAST(1 AS DOUBLE) AS o_totalprice
               FROM o
               WHERE substr(md5(CAST(o_orderkey AS STRING)), 1, 8) < '1999999a'),
         m AS (SELECT * FROM u
               UNION ALL
               SELECT * FROM o
               WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u))
         SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
             AS total_cents
         FROM m GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_window_event_gaps" ->
      """SELECT user_id, event_id,
         unix_micros(ts) - lag(unix_micros(ts), 1) OVER (PARTITION BY user_id
                                                         ORDER BY ts, event_id) AS gap_us
         FROM events ORDER BY user_id, event_id""",

    "q_window_moving_avg" ->
      """WITH c AS (SELECT user_id, event_id, ts, value,
                    CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
                    FROM events),
         f AS (SELECT user_id, event_id, value,
               CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv_cents,
               count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS mv_n
               FROM c)
         SELECT user_id, event_id, value,
                CAST(CASE WHEN mv_cents >= 0 THEN (200 * mv_cents + mv_n) DIV (2 * mv_n)
                     ELSE -((200 * -mv_cents + mv_n) DIV (2 * mv_n)) END AS BIGINT) AS moving_avg_1e4
         FROM f ORDER BY user_id, event_id""",

    "q_window_rolling_hour" ->
      """WITH c AS (SELECT user_id, event_id,
             CAST(unix_micros(ts) DIV 1000000 AS BIGINT) AS ts_sec,
             CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
             FROM events)
         SELECT user_id, event_id, ts_sec,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_sec
                RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_cents
         FROM c ORDER BY user_id, event_id""",

    "q_quality_calibrated" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
         m AS (SELECT doc_id, source, text,
           CAST(size(toks) AS BIGINT) AS n_tokens,
           CAST(size(filter(toks, t -> array_contains(
             array('the','a','of','and','to','in','is','it'), t))) AS BIGINT) AS stop_hits,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '')) AS BIGINT) AS punct_chars
           FROM t),
         sc AS (SELECT doc_id, source,
           CASE WHEN n_tokens = 0 OR length(text) = 0 THEN NULL ELSE
           CAST(floor(
             least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
             * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(length(text) AS DOUBLE))
             * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS quality_1e4
           FROM m),
         f AS (SELECT * FROM sc WHERE quality_1e4 IS NOT NULL),
         rk AS (SELECT doc_id, source, quality_1e4,
                rank() OVER (PARTITION BY source ORDER BY quality_1e4) AS rk,
                count(*) OVER (PARTITION BY source) AS n FROM f)
         SELECT doc_id, source, quality_1e4,
                CAST(CASE WHEN n = 1 THEN 0
                     ELSE (20000 * (rk - 1) + (n - 1)) DIV (2 * (n - 1)) END AS BIGINT) AS pct_rank_1e4
         FROM rk ORDER BY doc_id""",

    // same naive statement as the oracle, Spark dialect (array lambdas,
    // DIV); the default-RANGE window frame includes ties in both engines
    "q_quantile_normalize" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
         m AS (SELECT doc_id, source, text,
           CAST(size(toks) AS BIGINT) AS n_tokens,
           CAST(size(filter(toks, t -> array_contains(
             array('the','a','of','and','to','in','is','it'), t))) AS BIGINT) AS stop_hits,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '')) AS BIGINT) AS punct_chars
           FROM t),
         sc AS (SELECT doc_id, source,
           CASE WHEN n_tokens = 0 OR length(text) = 0 THEN NULL ELSE
           CAST(floor(
             least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
             * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(length(text) AS DOUBLE))
             * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS quality_1e4
           FROM m),
         f AS (SELECT * FROM sc WHERE quality_1e4 IS NOT NULL),
         r AS (SELECT doc_id, source, quality_1e4,
                CAST(sum(1) OVER (PARTITION BY source ORDER BY quality_1e4) AS BIGINT) AS cum_s,
                CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s,
                CAST(count(*) OVER () AS BIGINT) AS n_total FROM f),
         p AS (SELECT quality_1e4 AS pq,
                CAST(row_number() OVER (ORDER BY quality_1e4, doc_id) AS BIGINT) AS idx
               FROM f)
         SELECT r.doc_id, r.source, r.quality_1e4, p.pq AS pooled_1e4
         FROM r JOIN p ON p.idx = (r.cum_s * r.n_total + r.n_s - 1) DIV r.n_s
         ORDER BY r.doc_id""",

    "q_dedup_threshold_sweep" ->
      s"""WITH $minhashVerifyCtes,
         pass AS (SELECT doc_a, doc_b, jaccard_1e4 FROM verify WHERE jaccard_1e4 >= 5000),
         gridded AS (SELECT doc_a, doc_b,
             explode(sequence(CAST(5000 AS BIGINT), jaccard_1e4 - jaccard_1e4 % 500, 500)) AS threshold_1e4
             FROM pass)
         SELECT threshold_1e4, count(*) AS n_pairs,
                CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_dropped
         FROM gridded GROUP BY 1 ORDER BY 1""",

    "q_mix_apportion" ->
      s"""WITH perSrc AS (SELECT source, CAST(sum(size($toksSql)) AS BIGINT) AS n_tokens
                          FROM documents GROUP BY source),
         tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
                        CAST((sum(n_tokens) - sum(n_tokens) % 3) DIV 3 AS BIGINT) AS budget
                 FROM perSrc),
         quota AS (SELECT source, n_tokens, t, budget,
                   CAST((CAST(budget AS DECIMAL(38,0)) * n_tokens
                         - (CAST(budget AS DECIMAL(38,0)) * n_tokens) % t) / t AS BIGINT) AS base_tokens,
                   CAST((CAST(budget AS DECIMAL(38,0)) * n_tokens) % t AS BIGINT) AS remainder
                   FROM perSrc CROSS JOIN tot),
         ranked AS (SELECT *, budget - sum(base_tokens) OVER () AS extra,
                    row_number() OVER (ORDER BY remainder DESC, source) AS rk
                    FROM quota)
         SELECT source, n_tokens, base_tokens, remainder,
                CAST(base_tokens + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
         FROM ranked ORDER BY source""",

    "q_boilerplate" ->
      s"""WITH $shingleCtes,
         ex AS (SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_sh, explode(sh) AS shingle FROM shd),
         n AS (SELECT count(*) AS n_docs FROM shd),
         df AS (SELECT shingle, count(*) AS df FROM ex GROUP BY 1),
         boiler AS (SELECT shingle FROM df CROSS JOIN n WHERE df * 100 >= n_docs),
         j AS (SELECT e.doc_id, e.n_sh, CAST(count(b.shingle) AS BIGINT) AS n_boiler
               FROM ex e LEFT JOIN boiler b ON e.shingle = b.shingle GROUP BY 1, 2)
         SELECT doc_id, n_sh, n_boiler,
                CAST((20000 * n_boiler + n_sh) DIV (2 * n_sh) AS BIGINT) AS boiler_1e4
         FROM j ORDER BY doc_id""",

    "q_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS ws FROM documents),
         g AS (SELECT doc_id, explode(array_distinct(transform(sequence(1, size(ws) - 3),
               i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
                              element_at(ws, i + 2), element_at(ws, i + 3))))) AS g
               FROM d WHERE size(ws) >= 4),
         ev AS (SELECT DISTINCT g, doc_id AS eval_doc FROM g WHERE doc_id % 97 = 0),
         tr AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0)
         SELECT tr.doc_id, CAST(count(DISTINCT tr.g) AS BIGINT) AS n_overlap_ngrams,
                CAST(count(DISTINCT ev.eval_doc) AS BIGINT) AS n_eval_docs
         FROM tr JOIN ev ON tr.g = ev.g
         GROUP BY tr.doc_id ORDER BY tr.doc_id""",

    "q_length_filter_impact" ->
      s"""WITH d AS (SELECT CAST(size($toksSql) AS BIGINT) AS n_tokens FROM documents),
         g AS (SELECT n_tokens,
               explode(filter(array(CAST(1 AS BIGINT), 5, 10, 25, 50),
                 t -> t <= n_tokens)) AS min_tokens FROM d)
         SELECT min_tokens, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         FROM g GROUP BY 1 ORDER BY 1""",

    "q_dup_cluster_sizes" ->
      s"""WITH RECURSIVE $minhashVerifyCtes,
         prs AS (SELECT doc_a, doc_b FROM verify WHERE jaccard_1e4 >= 5000),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                   UNION SELECT doc_b, doc_a FROM prs),
         reach(a, b, d) AS (
           SELECT src, src, 0 FROM edges
           UNION ALL
           SELECT e.src, r.b, r.d + 1 FROM edges e JOIN reach r ON r.a = e.dst
           WHERE r.d < 8),
         lab AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY a),
         sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters
         FROM sz GROUP BY 1 ORDER BY 1""",

    "q_contamination_report" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS ws FROM documents),
         g AS (SELECT doc_id, explode(array_distinct(transform(sequence(1, size(ws) - 3),
               i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
                              element_at(ws, i + 2), element_at(ws, i + 3))))) AS g
               FROM d WHERE size(ws) >= 4),
         ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
         hits AS (SELECT DISTINCT t.doc_id FROM g t JOIN ev ON t.g = ev.g
                  WHERE t.doc_id % 97 <> 0),
         docs AS (SELECT doc_id, source FROM documents WHERE doc_id % 97 <> 0)
         SELECT source, count(*) AS n_docs,
                CAST(count(h.doc_id) AS BIGINT) AS n_contaminated,
                CAST((20000 * count(h.doc_id) + count(*))
                     DIV (2 * count(*)) AS BIGINT) AS contaminated_1e4
         FROM docs LEFT JOIN hits h ON docs.doc_id = h.doc_id
         GROUP BY source ORDER BY source""",

    "q_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(size($toksSql) AS BIGINT) AS n_tokens
                     FROM documents),
         st AS (SELECT doc_id, source, n_tokens,
                COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt FROM d)
         SELECT source, CAST(strt DIV 512 AS BIGINT) AS seq_id, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM st GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_split_stratified" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(size($toksSql) AS BIGINT) AS n_tokens,
               CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 8) < '${graft.operators.Sampling.hexThreshold(0.8)}' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS STRING)), 1, 8) < '${graft.operators.Sampling.hexThreshold(0.9)}' THEN 'valid'
                    ELSE 'test' END AS split FROM documents),
         g AS (SELECT source, split, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM d GROUP BY 1, 2),
         t AS (SELECT *, sum(n_docs) OVER (PARTITION BY source) AS src_total FROM g)
         SELECT source, split, n_docs, n_tokens,
                CAST((20000 * n_docs + src_total) DIV (2 * src_total) AS BIGINT) AS share_1e4
         FROM t ORDER BY source, split""",

    // same generated text as the oracle with DIV for //
    "q_zone_prune_audit" -> graft.operators.Layout.zonePruneSql("DIV"),

    "q_zorder_layout" -> {
      def bit(e: String, i: Int) = s"(($e DIV ${1L << i}) % 2)"
      val morton = (0 until 16).map { i =>
        s"${bit("xn", i)} * ${1L << (2 * i)} + ${bit("yn", i)} * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH b AS (SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
                     min(l_suppkey) AS mns, max(l_suppkey) AS mxs FROM lineitem),
         n AS (SELECT l_partkey, l_suppkey, mnp, mxp, mns, mxs,
               ((CAST(l_partkey AS BIGINT) - mnp) * 65535) DIV greatest(mxp - mnp, 1) AS xn,
               ((CAST(l_suppkey AS BIGINT) - mns) * 65535) DIV greatest(mxs - mns, 1) AS yn
               FROM lineitem CROSS JOIN b),
         zed AS (SELECT *, ($morton) AS z FROM n),
         cells AS (SELECT z DIV ${1L << 28} AS z_cell, count(*) AS n_rows,
                   min(l_partkey) AS min_part, max(l_partkey) AS max_part,
                   min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
                   min(mnp) AS mnp, min(mxp) AS mxp, min(mns) AS mns, min(mxs) AS mxs
                   FROM zed GROUP BY 1)
         SELECT CAST(z_cell AS BIGINT) AS z_cell, n_rows,
                min_part, max_part, min_supp, max_supp,
                CAST((20000 * (max_part - min_part) + greatest(mxp - mnp, 1))
                     DIV (2 * greatest(mxp - mnp, 1)) AS BIGINT) AS part_span_1e4,
                CAST((20000 * (max_supp - min_supp) + greatest(mxs - mns, 1))
                     DIV (2 * greatest(mxs - mns, 1)) AS BIGINT) AS supp_span_1e4
         FROM cells ORDER BY z_cell"""
    },

    // oracle's // -> DIV; otherwise structurally identical
    "q_chi2_source_lang" ->
      """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
                        FROM documents GROUP BY source, lang),
         rt AS (SELECT source, CAST(sum(obs) AS BIGINT) AS row_tot
                FROM cells GROUP BY source),
         ct AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS col_tot
                FROM cells GROUP BY lang),
         t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
         e AS (SELECT c.source, c.lang, c.obs, rt.row_tot, ct.col_tot,
                      (rt.row_tot * ct.col_tot * 10000) DIV t.n AS expected_1e4
               FROM cells c JOIN rt USING (source) JOIN ct USING (lang)
               CROSS JOIN t)
         SELECT source, lang, obs, row_tot, col_tot, expected_1e4,
                (abs(obs * 10000 - expected_1e4) * abs(obs * 10000 - expected_1e4))
                DIV (greatest(expected_1e4, 1) * 10000) AS chi2c_1e4
         FROM e ORDER BY source, lang""",

    // oracle's strftime -> date_format, // -> DIV
    "q_mom_revenue" ->
      """WITH m AS (SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                  AS rev_cents
           FROM orders GROUP BY 1),
         l AS (SELECT month, rev_cents,
                      lag(rev_cents) OVER (ORDER BY month) AS prev_cents
               FROM m)
         SELECT month, rev_cents, prev_cents,
                rev_cents - prev_cents AS delta_cents,
                ((rev_cents - prev_cents) * 10000) DIV prev_cents AS pct_1e4
         FROM l ORDER BY month""",

    // oracle's len -> size, << -> shiftleft, // -> DIV; bin() exists in
    // both dialects (bit-length bucket, no floating log2)
    "q_token_log2_hist" ->
      s"""WITH d AS (SELECT CAST(size($toksSql) AS BIGINT) AS nt FROM documents),
         b AS (SELECT CASE WHEN nt = 0 THEN CAST(-1 AS BIGINT)
                           ELSE CAST(length(bin(nt)) - 1 AS BIGINT) END AS bucket,
                      nt FROM d),
         g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(nt) AS BIGINT) AS n_tokens
               FROM b GROUP BY bucket),
         t AS (SELECT CAST(count(*) AS BIGINT) AS tot_docs,
                      CAST(coalesce(sum(nt), 0) AS BIGINT) AS tot_tokens FROM d)
         SELECT bucket,
                CASE WHEN bucket < 0 THEN CAST(0 AS BIGINT)
                     ELSE shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) END AS lo,
                n_docs, n_tokens,
                (CAST(sum(n_docs) OVER w AS BIGINT) * 10000) DIV tot_docs
                  AS cum_docs_1e4,
                (CAST(sum(n_tokens) OVER w AS BIGINT) * 10000)
                  DIV greatest(tot_tokens, 1) AS cum_tokens_1e4
         FROM g CROSS JOIN t
         WINDOW w AS (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY bucket""",

    // oracle's len -> size, list_* -> higher-order built-ins, 1-based
    // v[i] -> element_at, // -> DIV; same pinned-order folds
    "q_array_funcs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
                    FROM embeddings)
         SELECT vec_id,
           CAST(size(v) AS BIGINT) AS n_dims,
           CAST(size(filter(v, x -> x > CAST(0 AS DOUBLE))) AS BIGINT)
             AS n_pos,
           CAST(floor(aggregate(transform(v, x -> abs(x)),
                  CAST(0 AS DOUBLE), (a, b) -> a + b)
                * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS l1_1e4,
           CAST(floor(array_max(v) * CAST(10000 AS DOUBLE)
                + CAST(0.5 AS DOUBLE)) AS BIGINT) AS max_1e4,
           CASE WHEN size(v) = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(floor(element_at(array_sort(v),
                       CAST(size(v) DIV 2 + 1 AS INT))
                     * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
                END AS med_1e4,
           CAST(floor(aggregate(zip_with(v, reverse(v), (p, q) -> p * q),
                  CAST(0 AS DOUBLE), (a, b) -> a + b)
                * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS revdot_1e4,
           CAST(floor(aggregate(slice(v, 1, 3),
                  CAST(0 AS DOUBLE), (a, b) -> a + b)
                * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS head3_sum_1e4
         FROM e ORDER BY vec_id""",

    // oracle's strftime -> date_format, // -> DIV
    "q_type_drift_hourly" ->
      """WITH cells AS (SELECT date_format(ts, 'yyyy-MM-dd HH:00') AS hour,
                               event_type, CAST(count(*) AS BIGINT) AS obs
                        FROM events GROUP BY 1, 2),
         rt AS (SELECT hour, CAST(sum(obs) AS BIGINT) AS row_tot
                FROM cells GROUP BY hour),
         ct AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS col_tot
                FROM cells GROUP BY event_type),
         t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
         e AS (SELECT c.hour, c.event_type, c.obs, rt.row_tot, ct.col_tot,
                      (rt.row_tot * ct.col_tot * 10000) DIV t.n AS expected_1e4
               FROM cells c JOIN rt USING (hour) JOIN ct USING (event_type)
               CROSS JOIN t)
         SELECT hour, event_type, obs, row_tot, col_tot, expected_1e4,
                (abs(obs * 10000 - expected_1e4) * abs(obs * 10000 - expected_1e4))
                DIV (greatest(expected_1e4, 1) * 10000) AS chi2c_1e4
         FROM e ORDER BY hour, event_type""",

    // same generated text as the oracle: // -> DIV, epoch_us -> unix_micros
    "q_survival_signup_purchase" ->
      graft.operators.Analytics.survivalSql("DIV", "unix_micros"),

    "q_funnel_ordered" ->
      graft.operators.Analytics.funnelSql("DIV", "unix_micros"),

    // same generated text as the oracle with DIV for //
    "q_item_neighbor_jaccard" ->
      graft.operators.Mining.itemNeighborJaccardSql("DIV",
        graft.SparkEntry.Basket.maxItems, graft.SparkEntry.Basket.jaccardMinCo,
        graft.SparkEntry.Basket.jaccardTopN),

    // same generated text as the oracle with DIV for //
    "q_k_anonymity" -> graft.operators.Quality.kAnonymitySql("DIV"),

    // vocab growth: dialect points are explode(array(...)) for
    // unnest([...]), size for len, DIV for //
    "q_vocab_growth" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS ws FROM documents),
         mx AS (SELECT max(doc_id) AS max_id FROM documents),
         cp AS (SELECT explode(array(13, 25, 50, 100)) AS pct),
         cpt AS (SELECT pct, (max_id * pct) DIV 100 AS thr
                 FROM cp CROSS JOIN mx),
         tok AS (SELECT doc_id, explode(ws) AS tok FROM d),
         fo AS (SELECT tok, min(doc_id) AS first_doc FROM tok GROUP BY tok),
         dv AS (SELECT pct, CAST(count(*) AS BIGINT) AS distinct_tokens
                FROM fo JOIN cpt ON first_doc <= thr GROUP BY pct),
         dc AS (SELECT pct, CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(size(ws)) AS BIGINT) AS total_tokens
                FROM d JOIN cpt ON doc_id <= thr GROUP BY pct)
         SELECT pct, n_docs, total_tokens, distinct_tokens
         FROM dc JOIN dv USING (pct) ORDER BY pct""",

    // per-doc novelty via the same first-occurrence aggregate
    "q_novelty_scores" ->
      s"""WITH $shingleCtes,
         ex AS (SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_sh,
                       explode(sh) AS shingle FROM shd),
         fo AS (SELECT shingle, min(doc_id) AS first_doc
                FROM ex GROUP BY shingle),
         j AS (SELECT e.doc_id, e.n_sh,
                      CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END AS nv
               FROM ex e JOIN fo f ON f.shingle = e.shingle)
         SELECT doc_id, n_sh, CAST(sum(nv) AS BIGINT) AS n_novel,
                CAST((20000 * sum(nv) + n_sh) DIV (2 * n_sh) AS BIGINT)
                  AS novelty_1e4
         FROM j GROUP BY doc_id, n_sh ORDER BY doc_id""",

    // same generated text as the oracle with DIV for //
    "q_shortest_paths" ->
      graft.operators.Mining.shortestPathsSql("DIV",
        graft.SparkEntry.Basket.maxItems, graft.SparkEntry.Basket.spRounds,
        graft.SparkEntry.Basket.topK),

    // same generated text as the oracle with DIV, unix_micros, shiftright
    "q_attribution_time_decay" ->
      graft.operators.Analytics.timeDecayAttributionSql("DIV",
        "unix_micros(ts)", (a, b) => s"shiftright($a, $b)", 9),

    // same generated text as the oracle with DIV for // and unix_micros
    // for epoch_us (value iteration unrolled, the pagerank pattern)
    "q_markov_attribution" ->
      graft.operators.Analytics.markovAttributionSql("DIV", "unix_micros(ts)",
        graft.SparkEntry.Markov.rounds),

    // same generated text as the oracle with DIV for //
    "q_pagerank_copurchase" ->
      graft.operators.Mining.pagerankSql("DIV",
        graft.SparkEntry.Basket.maxItems, graft.SparkEntry.Basket.pagerankIters),

    // same generated text as the oracle with DIV for //
    "q_clustering_coeff" ->
      graft.operators.Mining.clusteringCoeffSql("DIV",
        graft.SparkEntry.Basket.maxItems, graft.SparkEntry.Basket.coeffMinDeg,
        graft.SparkEntry.Basket.topK),

    // explode-vs-unnest tokenizer + DIV are the only dialect points
    "q_zipf_profile" ->
      graft.operators.TextAnalysis.zipfProfileSql(duck = false,
        Seq(1, 2, 4, 8, 16, 32, 64)),

    // same generated text as the oracle with DIV for //
    "q_winsorized_stats" ->
      graft.operators.Analytics.winsorizedStatsSql("DIV"),

    // shared template; dialect points are unnest/explode, len/size,
    // list/array shingling, and // vs DIV
    "q_retrieval_eval" ->
      graft.operators.Retrieval.retrievalEvalSql(duck = false, Seq(1, 5, 10),
        graft.SparkEntry.Bm25.maxDfPermille, graft.SparkEntry.Bm25.k1Milli,
        graft.SparkEntry.Bm25.bMilli),

    // exact near-dup pairs per unordered source pair
    "q_dup_flow" ->
      s"""WITH $shingleCtes,
         ex AS (SELECT doc_id, n_sh, shingle
                FROM (SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_sh, explode(sh) AS shingle
                      FROM shd)),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, b.n_sh AS nb, count(*) AS common
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh),
         tp AS (SELECT doc_a, doc_b FROM pairs
                WHERE (20000 * common + (na + nb - common))
                      DIV (2 * (na + nb - common)) >= 5000)
         SELECT least(da.source, db.source) AS source_a,
                greatest(da.source, db.source) AS source_b,
                CAST(count(*) AS BIGINT) AS n_pairs
         FROM tp JOIN documents da ON da.doc_id = tp.doc_a
                 JOIN documents db ON db.doc_id = tp.doc_b
         GROUP BY least(da.source, db.source), greatest(da.source, db.source)
         ORDER BY source_a, source_b""",

    // near-dup pairs by the md5 split of their endpoints
    "q_split_leakage" ->
      s"""WITH $shingleCtes,
         ex AS (SELECT doc_id, n_sh, shingle
                FROM (SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_sh, explode(sh) AS shingle
                      FROM shd)),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, b.n_sh AS nb, count(*) AS common
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh),
         tp AS (SELECT doc_a, doc_b FROM pairs
                WHERE (20000 * common + (na + nb - common))
                      DIV (2 * (na + nb - common)) >= 5000),
         lab AS (SELECT
           CASE WHEN substring(md5(CAST(doc_a AS STRING)), 1, 8)
                     < '${graft.operators.Sampling.hexThreshold(0.8)}' THEN 'train'
                WHEN substring(md5(CAST(doc_a AS STRING)), 1, 8)
                     < '${graft.operators.Sampling.hexThreshold(0.9)}' THEN 'valid'
                ELSE 'test' END AS sa,
           CASE WHEN substring(md5(CAST(doc_b AS STRING)), 1, 8)
                     < '${graft.operators.Sampling.hexThreshold(0.8)}' THEN 'train'
                WHEN substring(md5(CAST(doc_b AS STRING)), 1, 8)
                     < '${graft.operators.Sampling.hexThreshold(0.9)}' THEN 'valid'
                ELSE 'test' END AS sb
           FROM tp)
         SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(CASE WHEN least(sa, sb) <> greatest(sa, sb)
                          THEN 1 ELSE 0 END AS INT) AS leak
         FROM lab GROUP BY least(sa, sb), greatest(sa, sb)
         ORDER BY split_a, split_b""",

    // dialect points: list/array filter + // vs DIV
    "q_lang_confusion" ->
      graft.operators.TextAnalysis.langConfusionSql(duck = false),

    // same generated text as the oracle with DIV and unix_micros
    "q_freshness_audit" ->
      graft.operators.Quality.freshnessAuditSql("DIV", "unix_micros(ts)"),

    // same generated text as the oracle with DIV for //
    "q_shrunken_rates" ->
      graft.operators.Quality.shrunkenRatesSql("DIV", 20, 50),

    // same generated text as the oracle with DIV for //
    "q_lang_diversity" ->
      graft.operators.TextAnalysis.langDiversitySql("DIV"),

    // dialect point: unnest vs posexplode only
    "q_label_separability" ->
      graft.operators.Similarity.labelSeparabilitySql(duck = false, 0, 1),

    // dialect points: tokenizer regex + DIV
    "q_source_mix_diversity" ->
      graft.operators.TextAnalysis.sourceMixDiversitySql(duck = false, "DIV"),

    // dialect point: the tokenizer regex spelling only
    "q_weighted_len_pctl" ->
      graft.operators.TextAnalysis.weightedLengthPercentilesSql(duck = false),

    // dialect points: unnest/explode + // vs DIV
    "q_vocab_drift" ->
      graft.operators.TextAnalysis.vocabDriftSql(duck = false, 20, 25),

    // dialect points: unnest/explode + // vs DIV
    "q_token_burstiness" ->
      graft.operators.TextAnalysis.tokenBurstinessSql(duck = false, 50, 25),

    // same generated text as the oracle with the Spark dialect knobs
    "q_dup_rate_trend" ->
      graft.operators.Dedup.dupRateTrendSql("DIV", shingleCtes, "size",
        "explode"),

    // same generated text as the oracle with the Spark dialect knobs
    "q_sample_pps" ->
      graft.operators.Sampling.ppsSampleSql("DIV", "size", ", 0", 100),

    // shiftleft spelling is the only dialect point
    "q_degree_histogram" ->
      graft.operators.Mining.degreeHistogramSql(graft.SparkEntry.Basket.maxItems,
        "shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"),

    // the q_token_estimate piece regex, aggregated by language
    "q_tokenizer_fertility" ->
      """WITH b AS (SELECT lang, coalesce(text, '') AS t,
           regexp_extract_all(coalesce(text, ''),
             "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}']+|\\s+", 0) AS bpe
           FROM documents),
         c AS (SELECT lang,
                 CAST(size(regexp_extract_all(t, '\\S+', 0)) AS BIGINT) AS words,
                 CAST(size(filter(bpe, p -> NOT (p RLIKE '^\\s+$'))) AS BIGINT) AS pieces
               FROM b),
         g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(words) AS BIGINT) AS n_words,
                      CAST(sum(pieces) AS BIGINT) AS n_pieces
               FROM c GROUP BY lang)
         SELECT lang, n_docs, n_words, n_pieces,
                CAST((20000 * n_pieces + n_words) DIV (2 * n_words) AS BIGINT)
                  AS fertility_1e4
         FROM g ORDER BY lang""",

    // same generation-formula prediction as the oracle; range -> sequence
    "q_shot_boundaries" ->
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
         p AS (SELECT doc_id,
                 CAST((ascii(substr(hx, 3, 1)) % 50) * 4 AS BIGINT) AS base,
                 CAST(2 + (ascii(substr(hx, 4, 1)) % 3) AS INTEGER) AS n_frames
               FROM m),
         sampled AS (SELECT DISTINCT doc_id, base, n_frames,
                       CAST((n_frames * t.i) DIV 3 AS INTEGER) AS frame_idx
                     FROM p CROSS JOIN (SELECT explode(sequence(0, 2)) AS i) t),
         f AS (SELECT doc_id, frame_idx,
                      CAST(base + 8 * frame_idx AS BIGINT) AS gray_level
               FROM sampled),
         lagged AS (SELECT doc_id, frame_idx, gray_level,
                      lag(gray_level) OVER (PARTITION BY doc_id
                        ORDER BY frame_idx) AS prev
                    FROM f),
         cuts AS (SELECT doc_id, frame_idx,
                    CASE WHEN prev IS NOT NULL
                              AND abs(gray_level - prev) * 16 >= prev
                         THEN 1 ELSE 0 END AS cut
                  FROM lagged)
         SELECT doc_id AS asset_id,
                CAST(count(*) AS BIGINT) AS n_sampled,
                CAST(sum(cut) AS BIGINT) AS n_boundaries,
                CAST(coalesce(min(CASE WHEN cut = 1 THEN frame_idx END), -1)
                     AS BIGINT) AS first_cut_idx
         FROM cuts GROUP BY doc_id ORDER BY asset_id""",

    // naive global rank form (the operator's distributed rank must be
    // result-invisible — the revenueLorenz contract)
    "q_selection_gain" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         m AS (SELECT doc_id, text, ${qualityMetrics("toks")}
           FROM t),
         d AS (SELECT doc_id, n_tokens,
           coalesce($qualityScoreSql, CAST(-1 AS BIGINT)) AS q
           FROM m),
         r AS (SELECT doc_id, n_tokens, q,
                      CAST(row_number() OVER (ORDER BY q, doc_id) AS BIGINT) AS rank,
                      CAST(count(*) OVER () AS BIGINT) AS n,
                      CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens
               FROM d),
         g AS (SELECT (10 * (n - rank)) DIV n AS decile,
                      CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_tokens) AS BIGINT) AS tokens_sum,
                      CAST(min(q) AS BIGINT) AS min_quality_1e4,
                      CAST(max(total_tokens) AS BIGINT) AS total_tokens
               FROM r GROUP BY (10 * (n - rank)) DIV n)
         SELECT CAST(decile AS BIGINT) AS decile, n_docs, tokens_sum,
                min_quality_1e4,
                CAST(sum(tokens_sum) OVER (ORDER BY decile) AS BIGINT)
                  AS cum_tokens,
                CAST((20000 * sum(tokens_sum) OVER (ORDER BY decile)
                      + total_tokens) DIV (2 * total_tokens) AS BIGINT)
                  AS cum_share_1e4
         FROM g ORDER BY decile""",

    // same generated text as the oracle; dialect points are
    // date_format/dayofweek-1 and the hour grid (explode(sequence))
    "q_seasonal_anomaly" ->
      graft.operators.Quality.seasonalSql("date_format(ts, 'yyyy-MM-dd')",
        "dayofweek(ts) - 1",
        "(SELECT CAST(h0 AS BIGINT) AS hour FROM (SELECT explode(sequence(0, 23)) AS h0))"),

    // same generated recursive-CTE text as the oracle (date_format only)
    "q_cusum_changepoint" ->
      graft.operators.Analytics.cusumSql("date_format(ts, 'yyyy-MM-dd')"),

    "q_holt_forecast" ->
      graft.operators.Analytics.holtSql("date_format(ts, 'yyyy-MM-dd')", "DIV"),

    "q_trend_audit" ->
      graft.operators.Analytics.trendAuditSql("date_format(ts, 'yyyy-MM-dd')",
        "CAST(datediff(CAST(b.day AS DATE), CAST(a.day AS DATE)) AS BIGINT)",
        "DIV"),

    "q_seq_pair_support" ->
      graft.operators.Mining.seqPairSupportSql("DIV", 2),

    // same generated text as the oracle with DIV for //
    "q_interleave_mix" -> graft.operators.Curation.interleaveSql("DIV"),

    // same generated text as the oracle with DIV for //
    "q_assoc_rules" -> graft.operators.Mining.assocRulesSql("DIV",
      graft.SparkEntry.Basket.maxItems, 5, graft.SparkEntry.Basket.topK),

    // same generated MMR text as the oracle (cos fold + DIV dialect)
    "q_mmr_rerank" -> graft.operators.Similarity.mmrSql(cosMicrosSql,
      "CAST(embedding AS ARRAY<DOUBLE>)", "DIV"),

    // same generated bitext text (cos fold + array cast + DIV dialect)
    "q_bitext_margin" -> graft.operators.Similarity.bitextMarginSql(
      cosMicrosSql, "CAST(embedding AS ARRAY<DOUBLE>)", "DIV"),

    // same generated index-face bitext text (cos fold + cast + DIV)
    "q_bitext_margin_index" -> graft.operators.Similarity.bitextMarginIndexSql(
      cosMicrosSql, "CAST(embedding AS ARRAY<DOUBLE>)", "DIV"),

    // same generated embedding-decontamination text (cos fold + cast)
    "q_semantic_decontaminate" ->
      graft.operators.Similarity.semanticDecontaminateSql(
        cosMicrosSql, "CAST(embedding AS ARRAY<DOUBLE>)"),

    // same generated text with Spark's 1-based dayofweek knob
    "q_mann_kendall_seasonal" ->
      graft.operators.Analytics.mannKendallSeasonalSql("dayofweek(day) - 1"),

    // same generated text with Spark's datediff argument order
    "q_siegel_slope" ->
      graft.operators.Analytics.siegelSlopeSql("datediff(b.day, a.day)"),

    // same generated text with Spark's datediff argument order
    "q_wilcoxon_signed_rank" -> graft.operators.Quality.wilcoxonSignedRankSql(
      "datediff(day, DATE '1970-01-05')"),

    // same generated temperature-mix text with DIV for //
    "q_temperature_mix" ->
      graft.operators.Sampling.temperatureMixSql("DIV"),

    // same generated text with Spark's 1-based dayofweek and DIV
    "q_seasonal_decompose" -> graft.operators.Analytics
      .seasonalDecomposeSql("dayofweek(day) - 1", "DIV"),

    // same generated text with Spark's unix_micros and DIV
    "q_bot_likeness" ->
      graft.operators.Analytics.botLikenessSql("unix_micros", "DIV"),

    // same generated text with Spark's datediff order and DIV for //
    "q_mcnemar_conversion" -> graft.operators.Quality.mcnemarConversionSql(
      "datediff(day, DATE '1970-01-05')", "DIV"),

    // same generated panel-BFS text with DIV for //
    "q_closeness_centrality" -> graft.operators.Mining.closenessCentralitySql(
      "DIV", graft.SparkEntry.Basket.maxItems,
      graft.SparkEntry.Basket.closenessSources,
      graft.SparkEntry.Basket.bfsHops),

    // same generated text as the oracle with DIV for //
    "q_ab_test_readout" -> graft.operators.Quality.abTestSql("DIV"),

    // same generated bands text (date_format + percentile + DIV dialect)
    "q_daily_value_bands" ->
      graft.operators.Analytics.dailyBandsSql("date_format(ts, 'yyyy-MM-dd')",
        "percentile(2 * cents, CAST(0.5 AS DOUBLE))", "DIV"),

    // same generated Lorenz text as the oracle with DIV for //
    "q_revenue_lorenz" -> graft.operators.Analytics.lorenzSql("DIV"),

    // same generated packing-efficiency text (size() + DIV dialect)
    "q_pack_efficiency" ->
      graft.operators.Curation.packEfficiencySql(s"size($toksSql)", "DIV"),

    // same generated drift text (transform/posexplode + DIV dialect)
    "q_embed_drift" ->
      graft.operators.Similarity.embedDriftSql(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))",
        """SELECT label, is_ref, CAST(pos + 1 AS BIGINT) AS dim, c
           FROM e LATERAL VIEW posexplode(code) t AS pos, c""",
        "DIV", graft.operators.Sampling.hexThreshold(0.8)),

    // same generated KS text as the oracle with DIV for //
    "q_ks_drift" -> graft.operators.Quality.ksDriftSql("DIV"),

    // same generated Benford text as the oracle with DIV for //
    "q_benford_audit" -> graft.operators.Quality.benfordAuditSql("DIV"),

    // same generated HHI text as the oracle with DIV for //
    "q_column_hhi" -> graft.operators.Quality.columnHhiSql("DIV"),

    // same generated attribution text as the oracle with DIV for //
    "q_attribution_position" ->
      graft.operators.Analytics.positionAttributionSql("DIV"),

    // same generated readability text, Spark dialect knobs
    "q_readability" -> graft.operators.TextAnalysis.readabilitySql(duck = false),

    // same generated round-trip text, Spark dialect knobs
    "q_decode_roundtrip" ->
      graft.operators.TextAnalysis.decodeRoundtripSql(duck = false)
  )

  /** The incremental-curation queries' SQL surface is the from-scratch
    * recompute (exactly like their oracles): SQL consumers see the same
    * totals; the incremental merge is a DataFrame-API execution strategy,
    * not different semantics.
    */
  private[graft] val incrementalTwins: Map[String, String] = Map(
    "q_corpus_report_incremental" -> twins("q_corpus_report"),
    "q_corpus_funnel_incremental" -> twins("q_corpus_funnel"),
    "q_dup_clusters_incremental" -> twins("q_dup_clusters"),
    "q_pack_sequences_incremental" -> twins("q_pack_sequences"),
    "q_scd2_incremental" -> twins("q_scd2_intervals"),
    "q_hll_rollup_incremental" -> twins("q_hll_sketch_rollup"),
    "q_quantile_rollup_incremental" -> twins("q_quantile_rollup"),
    // the parents are portable (no twin): alias their oracle texts
    "q_moment_profile_incremental" ->
      graft.operators.Quality.momentProfileSql,
    "q_corr_matrix_incremental" ->
      graft.operators.Quality.corrMatrixSql,
    "q_bootstrap_ci_incremental" -> twins("q_bootstrap_ci_revenue"),
    "q_semantic_decontaminate_incremental" ->
      twins("q_semantic_decontaminate"))

  /** Queries whose oracle text runs under Spark verbatim (classified by
    * tools/SqlTwinProbe and re-proven by SqlFrontDoorSpec every run).
    */
  val portable: Set[String] = Set(
    "q_agg_pricing_summary", "q_anti_join_orderless_customers",
    "q_contract_audit", "q_correlated_above_own_avg",
    "q_distinct_agg_supplier_parts", "q_distribution_order_counts",
    "q_grouping_sets_orders", "q_having_frequent_buyers",
    "q_histogram_order_price", "q_join_brand_revenue",
    "q_join_bucketed_revenue", "q_join_region_revenue",
    "q_image_dedup", "q_mode_order_priority", "q_multimodal_features",
    "q_outer_join_order_counts", "q_pivot_order_status",
    "q_range_join_value_bands", "q_rollup_orders",
    "q_scalar_subquery_big_orders", "q_semi_join_urgent_customers",
    "q_setops_all_nationkeys", "q_setops_nations", "q_topk_orders",
    "q_unpivot_order_status", "q_window_first_last",
    "q_window_rank_family", "q_window_top_customers",
    "q_market_basket", "q_basket_triples", "q_pareto_frontier",
    "q_join_size_estimate",
    "q_bitmap_distinct_users", "q_bitmap_overlap", "q_theta_set_ops",
    "q_snapshot_diff", "q_bfs_levels", "q_image_near_dup",
    "q_triangle_count", "q_fd_discovery", "q_bloom_semi_join",
    "q_balanced_downsample", "q_connected_components", "q_journey_trigrams",
    "q_volume_shipping", "q_top_supplier", "q_min_cost_supplier",
    "q_acf_daily_value", "q_ccf_click_purchase", "q_kcore_membership",
    "q_corr_matrix", "q_kendall_tau_daily",
    "q_returned_item_report", "q_disjunctive_revenue", "q_forecast_revenue",
    "q_moment_profile", "q_ab_power_audit", "q_quantile_uplift",
    "q_mannwhitney_value", "q_spearman_daily", "q_hodges_lehmann_value",
    "q_qn_scale_value", "q_runs_test_daily", "q_ljung_box_daily",
    "q_pacf_daily")

  /** Queries with no SQL surface (API-only). Currently none — every
    * registry query has a runnable Spark SQL statement.
    */
  val exemptions: Map[String, String] = Map.empty

  /** The Spark SQL text for a registry query, if it has a SQL surface. */
  def sql(name: String): Option[String] =
    twins.get(name).orElse(incrementalTwins.get(name)).orElse(
      if (portable(name)) SparkEntry.oracleSql.get(name) else None)

  /** Run a registry query through the SQL surface (registers the sf-dir
    * tables as temp views; twins need no graft-registered functions).
    */
  def run(s: SparkSession, dir: String, name: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(sql(name).getOrElse(
      sys.error(s"no SQL surface for $name (exempt: ${exemptions.get(name)})")))
  }
}
