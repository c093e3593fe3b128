package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as distributed batch operators.
  *
  * No image/audio codecs exist in this environment, so the actual decode
  * is STUBBED (deterministic fake derived from the payload hash, clearly
  * marked below). Everything Spark-side is real and tested: the schema
  * (binary payload + metadata struct), the partition-batched decode shape
  * (mapPartitions — one codec init per partition, streaming through rows),
  * and the column-level feature queries.
  */
object Multimodal {

  /** Decoded-asset feature record (what a real image decode would emit). */
  final case class AssetFeatures(
      asset_id: Long,
      byte_size: Long,
      width: Int,
      height: Int,
      channel_mean: Double)

  /** Build a multimodal asset table from `documents`: payload = utf-8
    * bytes of the text (stand-in for image/audio bytes), metadata struct
    * alongside. At scale this is exactly the layout for parquet-with-blobs:
    * payload column stays unread unless selected (column pruning).
    */
  def assets(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents").select(
      col("doc_id").as("asset_id"),
      // null body -> empty payload (same null discipline as TokensExpr):
      // downstream decode must never NPE on a null blob
      encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"),
      struct(
        col("source"),
        col("lang"),
        col("n_chars").as("orig_chars"),
        lit("text/plain").as("mime")).as("meta"))

  /** Feature extraction as pure columns (parity-safe with a DuckDB twin):
    * byte size, a content hash, and deterministic fake decode dims derived
    * from the hash — the shape a real decoder would produce.
    */
  def assetFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents").select(
      col("doc_id").as("asset_id"),
      expr("CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT)").as("byte_size"),
      expr("md5(text)").as("content_hash"),
      // ---- STUB: stands in for decoded image dims / channel stats ----
      expr("32 + (ascii(substr(md5(text), 1, 1)) % 16) * 8").as("fake_width"),
      expr("32 + (ascii(substr(md5(text), 2, 1)) % 16) * 8").as("fake_height"),
      // k/64 is an exact dyadic double (k < 64, /64 = exponent shift):
      // bit-identical on every engine, so no round() needed — round()'s
      // tie-breaking on the exact .xxxx5 values k≡2 (mod 4) produces is
      // engine-version-dependent
      expr("CAST(ascii(substr(md5(text), 3, 1)) % 64 AS DOUBLE) / CAST(64 AS DOUBLE)")
        .as("fake_channel_mean"))
      .orderBy(col("asset_id"))

  /** Partition-batched decode: the real-codec pattern. One decoder init
    * per partition (the expensive part with real libs), then a streaming
    * pass over the partition's rows — never a per-row init, never a
    * collect. Swap `decodeStub` for a JNI/ImageIO call to go live.
    */
  def decodeAssets(s: SparkSession, dir: String): Dataset[AssetFeatures] = {
    import s.implicits._
    assets(s, dir)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codec would be initialized HERE, once per partition
        val codec = new StubCodec
        rows.map { case (id, payload) => codec.decode(id, payload) }
      }
  }

  /** One sampled "frame" of a (video-like) asset. */
  final case class FrameFeature(
      asset_id: Long,
      frame_idx: Int,
      byte_offset: Long,
      frame_hash: String)

  /** Frame sampling: K evenly spaced frames per asset — the video
    * equivalent of the decode path. Same partition-batched shape as
    * decodeAssets (one codec init per partition, streaming rows, never a
    * per-row init or a collect); the STUB "frame" is a byte window at the
    * sampled offset where a real codec would seek and decode. Output is
    * rows-per-frame, ready for per-frame feature extraction or dedup.
    */
  def sampleFrames(s: SparkSession, dir: String, k: Int = 4): Dataset[FrameFeature] = {
    import s.implicits._
    require(k >= 1)
    assets(s, dir)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new StubCodec // real video codec init happens HERE
        rows.flatMap { case (id, payload) =>
          (0 until k).iterator.map { i =>
            val offset = (payload.length.toLong * i) / k
            val end = math.min(payload.length.toLong, offset + 256).toInt
            val window = java.util.Arrays.copyOfRange(payload, offset.toInt, end)
            FrameFeature(id, i, offset, codec.digestHex(window))
          }
        }
      }
  }

  /** STUB decoder — deterministic fake features from the payload digest.
    * A real implementation would replace `decode` with an actual
    * image/audio parse; the call shape and output schema stay identical.
    */
  private final class StubCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def digestHex(bytes: Array[Byte]): String =
      md.digest(bytes).map(b => f"${b & 0xFF}%02x").mkString
    def decode(id: Long, payload: Array[Byte]): AssetFeatures = {
      val digest = md.digest(payload)
      def ub(i: Int): Int = digest(i) & 0xFF
      AssetFeatures(
        asset_id = id,
        byte_size = payload.length.toLong,
        width = 32 + (ub(0) % 16) * 8,
        height = 32 + (ub(1) % 16) * 8,
        channel_mean = (ub(2) % 64) / 64.0)
    }
  }
}
