package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pattern-mining operators over the warehouse tables: co-occurrence
  * (market-basket) mining and Pareto-frontier (skyline) selection.
  *
  * Neither exists in the reference (its only operators are the fixed ETL
  * transform, `/root/reference/src/etl/transform.py:55-63`; anything
  * analytical is delegated to BigQuery), but both are first-class needs of
  * a large-scale curation pipeline: co-occurrence mining is the
  * "what appears together" primitive (items per basket, tags per document,
  * spans per page), and skyline selection is exactly the
  * quality-vs-cost data-selection frontier ("no other candidate is both
  * cheaper and higher-quality").
  */
object Mining {

  /** Market-basket pair mining: the top part pairs that co-occur in the
    * same order, with support counts.
    *
    * Shape, built for 100 TB:
    *  - distinct (basket, item) first — a multi-line order contributes one
    *    unit of support per pair, and the distinct collapses the fact table
    *    to the far smaller basket/item incidence before anything quadratic
    *    can happen;
    *  - whale-basket guard BEFORE the self-join: pair expansion is
    *    quadratic in basket size, so baskets with more than [[maxItems]]
    *    distinct items are excluded up front (a deterministic, documented
    *    cut — the standard practice for basket mining, where a single
    *    10^5-item crawler "basket" would otherwise emit 10^10 pairs).
    *    The guard is one map-side-combined count aggregate, and the join
    *    back to the incidence list is on the basket key it is already
    *    shuffled by;
    *  - the pair generation itself is a plain equi self-join on the basket
    *    key with `item_a < item_b` — a shuffled hash join Catalyst can
    *    re-plan under AQE; per-basket work is bounded by maxItems^2;
    *  - final count is map-side combinable; top-K goes through
    *    TakeOrderedAndProject (no global sort materialized).
    */
  def marketBasket(s: SparkSession, dir: String,
                   maxItems: Int, topK: Int): DataFrame = {
    val incidence = Tables.spread(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    val sized = incidence.groupBy(col("basket"))
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") <= maxItems)
      .select("basket")
    val kept = incidence.join(sized, Seq("basket"))
    val pairs = kept.as("a").join(kept.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("part_a"), col("b.item").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
    pairs
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  /** Distributed 2D Pareto frontier (skyline): the parts for which no
    * other part is both cheaper (price <=) and larger (size >=) with at
    * least one strict inequality. The data-curation reading: candidates on
    * the quality-vs-cost frontier — nothing else is at least as good on
    * both axes.
    *
    * The textbook window formulation (`max(size) OVER (ORDER BY price)`)
    * is a GLOBAL ordered window — one task sees every row. This
    * implementation is the two-level bucketed skyline that survives 100x:
    *
    *  1. bucket rows by a fixed price band (`price_cents DIV bandWidth`) —
    *     equal prices always share a bucket, lower buckets hold strictly
    *     lower prices;
    *  2. LOCAL skyline per bucket via a bucket-partitioned window ordered
    *     (price asc, size desc): a row is locally dominated iff an earlier
    *     row's running max size strictly exceeds its size, or ties its
    *     size at a strictly lower price (the per-(bucket,size) min price
    *     detects the latter). All parallel, no global sort;
    *  3. CROSS-bucket pass over the per-bucket max sizes only — one row
    *     per non-empty bucket, catalog-sized, so the prefix-max window
    *     over buckets is trivially small — broadcast-joined back: a local
    *     survivor stays iff its size strictly exceeds every lower
    *     bucket's max (a lower-bucket tie means an equal size at a
    *     strictly lower price, i.e. a dominator).
    *
    * Equal (price, size) duplicates are mutual non-dominators and are all
    * kept, matching the NOT EXISTS oracle.
    */
  def paretoFrontier(s: SparkSession, dir: String, bandWidth: Long): DataFrame = {
    val pts = Tables.spread(s, dir, "part")
      .select(col("p_partkey"),
        expr("CAST(floor(p_retailprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)")
          .as("price_cents"),
        col("p_size").cast("long").as("size"))
      .withColumn("bucket", expr(s"price_cents DIV $bandWidth"))

    val order = Window.partitionBy(col("bucket"))
      .orderBy(col("price_cents"), col("size").desc, col("p_partkey"))
    val runMax = max(col("size")).over(
      order.rowsBetween(Window.unboundedPreceding, -1))
    val minPriceForSize = min(col("price_cents"))
      .over(Window.partitionBy(col("bucket"), col("size")))
    val local = pts
      .withColumn("run_max", runMax)
      .withColumn("min_price_sz", minPriceForSize)
      .filter(col("run_max").isNull ||
        col("size") > col("run_max") ||
        (col("size") === col("run_max") &&
          col("price_cents") === col("min_price_sz")))
      .drop("run_max", "min_price_sz")

    val bucketMax = pts.groupBy(col("bucket"))
      .agg(max(col("size")).as("bkt_max"))
    // one row per non-empty bucket: the single-partition prefix window is
    // over a catalog-sized frame by construction (price-range / bandWidth)
    val prefix = bucketMax
      .withColumn("lower_max", max(col("bkt_max")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("lower_max"))

    local.join(broadcast(prefix), Seq("bucket"))
      .filter(col("lower_max").isNull || col("size") > col("lower_max"))
      .select(col("p_partkey"), col("price_cents"), col("size").as("p_size"))
      .orderBy(col("price_cents"), col("p_partkey"))
  }
}
