package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Continuous heavy-hitters: the streaming face of the
  * [[graft.operators.TextAnalysis.heavyTokens]] screen — one
  * [[graft.functions.HeavyHittersSketch]] (Misra-Gries) summary
  * maintained as streaming-aggregation state over an unbounded item
  * stream, alongside the running total n.
  *
  * The MG buffer is exactly the right streaming state: k entries
  * regardless of how many distinct items flow past (an exact streaming
  * groupBy count would grow state with the item DOMAIN — unbounded for
  * URLs/n-grams/user agents), and the Aggregator's merge is the
  * PODS-2012 mergeable-summaries rule, so partial buffers combine across
  * triggers and partitions with the n/k guarantee intact. Each trigger
  * emits the current summary (complete mode — the result is a rolling
  * replacement, not a delta): every item whose true running frequency
  * exceeds n/k is present, with count <= true freq <= count + err.
  *
  * Downstream, the same exact-rejoin the batch operator uses (count only
  * the <= k candidates, threshold count*k > n) turns a summary snapshot
  * into a deterministic answer whenever one is needed.
  */
object HeavyHittersStream {

  /** @param items streaming Dataset of items (tokens, URLs, keys)
    * @param k     sketch capacity = share threshold denominator
    * @return streaming frame (item, count_lb, err, n) — use output mode
    *         Complete; count_lb is the MG lower bound, err the summary's
    *         global maximum undercount, n the items seen so far
    */
  def summary(items: Dataset[String], k: Int): DataFrame = {
    val sketch = udaf(new graft.functions.HeavyHittersSketch(k),
      org.apache.spark.sql.Encoders.STRING)
    items.toDF("item")
      .agg(sketch(col("item")).as("hh"), count(lit(1)).as("n"))
      .select(explode(col("hh")).as("h"), col("n"))
      .select(col("h.item").as("item"), col("h.count").as("count_lb"),
        col("h.err").as("err"), col("n"))
  }
}
