package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature: ARRAY<STRING> shingles -> ARRAY<STRING>
  * of 12 8-hex signature slots.
  *
  * Definitionally identical to the composed-HOF form used by Dedup
  * (sig_j = min over shingles of substr(md5(shingle || ':' || j/4),
  * (j%4)*8+1, 8)) and to its DuckDB oracle twin — but computed in ONE pass
  * over the shingle array with reused MessageDigest instances, instead of
  * 12 interpreted lambda traversals materializing intermediate arrays.
  * This is the "custom Expression as an optimization fallback for hot
  * paths" tier of the extension preference order (SURVEY §7.3); the HOF
  * form remains the readable reference implementation.
  *
  * CodegenFallback: the surrounding plan stays whole-stage-codegen'd; this
  * node evaluates via eval() — the win here is algorithmic (4x fewer
  * digests, 12x fewer array passes), not loop fusion.
  */
case class MinHashSignature(child: Expression, numHashes: Int = 12)
    extends UnaryExpression with CodegenFallback {

  private val digestsNeeded = (numHashes + 3) / 4

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${other.simpleString}")
  }

  @transient private lazy val hexChars = "0123456789abcdef".toCharArray

  // ":0", ":1", ... as raw bytes, computed once — the digest input is
  // fed as (shingle utf8 bytes, suffix bytes) so no per-(shingle, d)
  // string concatenation or re-encoding happens in the hot loop. md5 of
  // the same byte stream == md5(shingle || ':' || d) by definition.
  @transient private lazy val suffixBytes: Array[Array[Byte]] =
    Array.tabulate(digestsNeeded)(d => s":$d".getBytes("UTF-8"))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null // matches array_min-of-empty -> null semantics
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill[String](numHashes)(null)
    var i = 0
    while (i < n) {
      val shingleBytes = arr.getUTF8String(i).getBytes
      var d = 0
      while (d < digestsNeeded) {
        md.reset()
        md.update(shingleBytes)
        md.update(suffixBytes(d))
        val digest = md.digest()
        // hex-encode once, slice four 8-hex windows
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(b * 2) = hexChars((digest(b) >> 4) & 0xF)
          hex(b * 2 + 1) = hexChars(digest(b) & 0xF)
          b += 1
        }
        var w = 0
        while (w < 4) {
          val j = d * 4 + w
          if (j < numHashes) {
            val slot = new String(hex, w * 8, 8)
            if (mins(j) == null || slot < mins(j)) mins(j) = slot
          }
          w += 1
        }
        d += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(s => UTF8String.fromString(s)))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
