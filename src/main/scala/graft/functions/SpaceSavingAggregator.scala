package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** A heavy-hitter summary entry: count is a LOWER bound on the item's
  * true frequency; true frequency <= count + err (err is the summary's
  * global maximum undercount).
  */
final case class HeavyHitter(item: String, count: Long, err: Long)

/** Misra-Gries buffer: surviving counters + the total decrement offset. */
final case class MgBuffer(counts: Map[String, Long], dec: Long)

/** Misra-Gries / SpaceSaving-family heavy-hitters sketch (Misra & Gries
  * 1982; merge rule from Agarwal et al., "Mergeable summaries", PODS
  * 2012) as a typed MERGEABLE Aggregator — the bounded-memory
  * alternative to an exact groupBy count when the key domain is
  * unbounded (URLs, n-grams, user agents) and only the head matters.
  *
  * Guarantees (capacity k, n items observed, PROVEN for the mergeable
  * form under any partitioning / merge tree):
  *  - every item with true frequency > n/k is present in the summary;
  *  - count <= true frequency <= count + err, with err <= n/k
  *    (err = the summary's accumulated decrement offset `dec`).
  *
  * Reduce decrements ALL counters when a new item finds the buffer full
  * (the classic MG step); merge sums counters pointwise, then restores
  * the capacity bound by subtracting the (k+1)-th largest count from
  * every counter and dropping non-positives — the Agarwal et al. rule
  * that preserves both guarantees exactly.
  *
  * The mergeability is the 100 TB story: each upstream partition carries
  * a k-entry buffer (map-side combined), the exchange moves one k-entry
  * row per partition, and the final merge is driver-cheap — an exact
  * count over an unbounded domain would instead shuffle every distinct
  * key. Like every sketch (cf. ApproxSpec on approx_count_distinct),
  * the surviving-set tail depends on partitioning and is NOT
  * oracle-comparable across engines; the spec checks the guarantees,
  * not a pinned answer.
  */
class HeavyHittersSketch(k: Int)
    extends Aggregator[String, MgBuffer, Seq[HeavyHitter]] {

  require(k > 0, s"capacity must be positive, got $k")

  override def zero: MgBuffer = MgBuffer(Map.empty, 0L)

  override def reduce(buf: MgBuffer, item: String): MgBuffer =
    buf.counts.get(item) match {
      case Some(c) => buf.copy(counts = buf.counts.updated(item, c + 1))
      case None if buf.counts.size < k =>
        buf.copy(counts = buf.counts.updated(item, 1L))
      case None =>
        // MG step: the newcomer and every survivor give up one count
        MgBuffer(
          buf.counts.flatMap { case (it, c) =>
            if (c > 1) Some(it -> (c - 1)) else None
          },
          buf.dec + 1)
    }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    val summed = (a.counts.keySet ++ b.counts.keySet).iterator.map { it =>
      it -> (a.counts.getOrElse(it, 0L) + b.counts.getOrElse(it, 0L))
    }.toMap
    val dec = a.dec + b.dec
    if (summed.size <= k) MgBuffer(summed, dec)
    else {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val t = summed.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      MgBuffer(
        summed.flatMap { case (it, c) =>
          if (c > t) Some(it -> (c - t)) else None
        },
        dec + t)
    }
  }

  override def finish(buf: MgBuffer): Seq[HeavyHitter] =
    buf.counts.toSeq.map { case (it, c) => HeavyHitter(it, c, buf.dec) }
      .sortBy(h => (-h.count, h.item))

  override def bufferEncoder: Encoder[MgBuffer] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgBuffer]()

  override def outputEncoder: Encoder[Seq[HeavyHitter]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HeavyHitter]]()
}
