package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.5/§7.3): a MinHash-signature Aggregator.
  *
  * IN  = one shingle string per input row (exploded corpus),
  * BUF = the running k-slot signature (min of md5-derived 64-bit hashes),
  * OUT = the finished signature.
  *
  * This is the streaming/grouped counterpart of Dedup.minHashLsh's
  * column-expression signatures: with `groupByKey(doc).agg(MinHashAgg.tc)`
  * signatures fold incrementally (partial aggregation on the map side), so
  * a 100 TB corpus never materializes per-document shingle arrays. Also
  * usable in Structured Streaming aggregations.
  */
object MinHashAggregator {

  val NumHashes = 12

  /** First 60 bits of md5(shingle:j) as a positive Long. NOTE: this is a
    * self-contained signature scheme, NOT interchangeable with Dedup's —
    * Dedup (and its oracle) derive 12 slots as 8-hex-char windows of three
    * digests md5(shingle:0..2), while this aggregator hashes md5(shingle:j)
    * for j=0..11. Both are valid minhash families; mixing signatures across
    * the two would silently compare incompatible values.
    */
  private[graft] def hashSlot(shingle: String, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$shingle:$j".getBytes("UTF-8"))
    // top 60 bits, positive
    ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) | ((d(2) & 0xFFL) << 36) |
      ((d(3) & 0xFFL) << 28) | ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
      ((d(6) & 0xFFL) << 4) | ((d(7) & 0xF0L) >> 4)
  }

  val agg: Aggregator[String, Array[Long], Array[Long]] =
    new Aggregator[String, Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)
      override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
        var j = 0
        while (j < NumHashes) {
          val h = hashSlot(shingle, j)
          if (h < buf(j)) buf(j) = h
          j += 1
        }
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var j = 0
        while (j < NumHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
        a
      }
      override def finish(buf: Array[Long]): Array[Long] = buf
      override def bufferEncoder: Encoder[Array[Long]] =
        Encoders.javaSerialization[Array[Long]]
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** Estimated Jaccard similarity from two signatures. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
