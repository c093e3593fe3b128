package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Scored neighbor candidate: integer micro-unit score + id. */
final case class ScoredNeighbor(m: Long, vecId: Long)

/** Map-side-combining top-k by (m DESC, vecId ASC).
  *
  * The naive "row_number() OVER (PARTITION BY query_id ORDER BY m DESC)"
  * top-k shuffles EVERY scored (corpus x query) row into only
  * #queries partitions — at scale that is both the largest possible
  * shuffle and a built-in skew bomb. As a typed Aggregator the partial
  * (map-side) aggregation keeps at most k rows per upstream partition,
  * so the exchange carries partitions x k rows instead of corpus x
  * queries, and the few-keys skew disappears with the volume.
  *
  * Selection is identical to the window form for any k <= candidate
  * count: the comparator (m DESC, vecId ASC) is the same total order the
  * window and the DuckDB oracle use, so oracle parity is untouched.
  */
class TopKNeighbors(k: Int)
    extends Aggregator[ScoredNeighbor, List[ScoredNeighbor], Seq[ScoredNeighbor]] {

  require(k > 0, s"k must be positive, got $k")

  // better (comes first) = higher m, then lower vecId
  private def beats(a: ScoredNeighbor, b: ScoredNeighbor): Boolean =
    a.m > b.m || (a.m == b.m && a.vecId < b.vecId)

  override def zero: List[ScoredNeighbor] = Nil

  // buffer kept sorted best-first, length <= k
  override def reduce(buf: List[ScoredNeighbor], x: ScoredNeighbor): List[ScoredNeighbor] =
    if (buf.length >= k && beats(buf.last, x)) buf
    else {
      val (better, worse) = buf.span(beats(_, x))
      (better ::: x :: worse).take(k)
    }

  override def merge(a: List[ScoredNeighbor], b: List[ScoredNeighbor]): List[ScoredNeighbor] = {
    // merge two sorted lists, keep k
    val out = List.newBuilder[ScoredNeighbor]
    var (xs, ys, n) = (a, b, 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && beats(xs.head, ys.head))) {
        out += xs.head; xs = xs.tail
      } else {
        out += ys.head; ys = ys.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[ScoredNeighbor]): Seq[ScoredNeighbor] = r

  override def bufferEncoder: Encoder[List[ScoredNeighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredNeighbor]]()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredNeighbor]]()
}
