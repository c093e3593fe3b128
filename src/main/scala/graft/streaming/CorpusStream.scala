package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-composition monitors over an unbounded DOCUMENT stream (the
  * ingest-side siblings of the batch TextAnalysis audits): catalog-sized
  * count cells maintained as complete-mode aggregation state, with the
  * batch readout running downstream of the sink — the cusumCells split.
  */
object CorpusStream {

  /** Per-(source, lang) count cells for the streaming language-diversity
    * monitor — the ingest face of
    * [[graft.operators.TextAnalysis.langDiversity]]: counts ADD, so the
    * state-store merge under any trigger boundary is exact, and the
    * Simpson/inverse-Simpson readout
    * ([[graft.operators.TextAnalysis.diversityFromCounts]]) recomputes
    * over the |sources| x |langs| cells where the mixing dashboard reads
    * them anyway (a new document shifts every share — per-trigger
    * incremental index maintenance would be wrong-by-design, exactly the
    * seasonalCells argument). State is one long per touched cell,
    * forever.
    */
  def diversityCells(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
}
