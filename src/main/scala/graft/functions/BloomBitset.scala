package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Map-side-combining Bloom bitset builder. Input is a BIT POSITION
  * (already hashed upstream, 0 <= pos < nBits); the buffer is the packed
  * bitset (nBits/64 longs); merge is bitwise OR — fully commutative and
  * associative, so the result is independent of partitioning and row
  * order, and the partial aggregation compresses each upstream partition
  * to a constant nBits/8 bytes before the (single-row) exchange.
  *
  * This is the 100 TB shape of a seen-set: a corpus-sized key set
  * collapses into a fixed-size filter that BROADCASTS to the probe side,
  * so screening new arrivals costs one map-side pass — no join against
  * the historical corpus at all. The price is a quantified false-positive
  * rate (~(1 - e^(-k·n/m))^k); false NEGATIVES are impossible, which is
  * the invariant the dedup screen needs (a dropped row is always a true
  * duplicate candidate).
  */
class BloomBitset(nBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  require(nBits > 0 && nBits % 64 == 0, s"nBits must be a positive multiple of 64, got $nBits")

  override def zero: Array[Long] = new Array[Long](nBits / 64)

  override def reduce(buf: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < nBits, s"position $pos out of [0, $nBits)")
    buf((pos >> 6).toInt) |= 1L << (pos & 63).toInt
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
