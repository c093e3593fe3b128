package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as distributed batch operators.
  *
  * The payloads are REAL PNG images, generated deterministically per
  * document (dimensions and fill level derived from the md5 of the text,
  * so an external oracle can predict the decoded features without a PNG
  * decoder of its own), and the decode path runs a genuine
  * `javax.imageio` parse — actual IDAT inflate, actual pixel traversal —
  * in the partition-batched shape a production codec integration uses:
  * one codec/digest instance per partition, streaming through rows,
  * never a per-row init, never a collect.
  */
object Multimodal {

  /** Decoded-asset feature record (emitted by the real image decode).
    * `byte_size` is the encoded PNG's size — real but codec-dependent, so
    * oracle queries exclude it; `channel_sum` is the sum of every RGB
    * component of every decoded pixel and `gray_level` the exact per-
    * channel mean (the generator fills with a constant, so the integer
    * division is exact).
    */
  final case class AssetFeatures(
      asset_id: Long,
      byte_size: Long,
      width: Int,
      height: Int,
      channel_sum: Long,
      gray_level: Long)

  /** Internal generator record (public: Catalyst's generated serializer
    * code must be able to reach the accessors — a `private` nested case
    * class compiles, but janino then rejects the accessor calls and every
    * batch falls back to the interpreted projection).
    */
  final case class AssetRow(
      asset_id: Long,
      payload: Array[Byte],
      source: String,
      lang: String,
      orig_chars: Long,
      mime: String)

  /** The deterministic generation formula, shared by the PNG generator,
    * the predicted-features twin, and the DuckDB oracle: three leading
    * hex chars of md5(text) pick width, height, and the constant gray
    * fill. Null text behaves as ''.
    */
  private def dims(md5Hex: String): (Int, Int, Int) = {
    val w = 32 + (md5Hex.charAt(0).toInt % 16) * 8
    val h = 32 + (md5Hex.charAt(1).toInt % 16) * 8
    val v = (md5Hex.charAt(2).toInt % 64) * 4
    (w, h, v)
  }

  /** Build a multimodal asset table from `documents`: payload = a real
    * PNG (constant-fill RGB, content-addressed dimensions), metadata
    * struct alongside. The typed generator materializes the payload for
    * every row it produces (an object pipeline does not column-prune
    * through itself) — the blob-layout economics apply once the table is
    * PERSISTED as parquet, where readers selecting only id/meta never
    * touch the payload column. Generation state is per partition.
    */
  def assets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(s, dir, "documents")
      .select(col("doc_id"),
        // null body -> empty text (same null discipline as TokensExpr):
        // downstream must never NPE on a null document
        coalesce(col("text"), lit("")).as("text"),
        col("source"), col("lang"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .as[(Long, String, String, String, Long)]
      .mapPartitions { rows =>
        // encoder state initialized HERE, once per partition; cache off so
        // ImageIO.write never round-trips each image through a temp file
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text, src, lang, nChars) =>
          val hex = md.digest(text.getBytes("UTF-8"))
            .map(b => f"${b & 0xFF}%02x").mkString
          val (w, h, v) = dims(hex)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (v << 16) | (v << 8) | v
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream(1024)
          javax.imageio.ImageIO.write(img, "png", out)
          AssetRow(id, out.toByteArray, src, lang, nChars, "image/png")
        }
      }
      .toDF()
      .select(col("asset_id"), col("payload"),
        struct(col("source"), col("lang"),
          col("orig_chars"), col("mime")).as("meta"))
  }

  /** Partition-batched REAL decode: `ImageIO.read` parses the PNG bytes
    * (header, zlib-inflated scanlines, the lot) and the feature pass sums
    * actual decoded pixel components. One reader init per partition,
    * streaming rows — the production-codec call shape.
    */
  def decodeAssets(s: SparkSession, dir: String): Dataset[AssetFeatures] = {
    import s.implicits._
    assets(s, dir)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // REAL per-partition codec init: disable the disk-backed stream
        // cache (ImageIO defaults to a temp FILE per read) and resolve the
        // PNG reader from the plugin registry ONCE, not per row — the two
        // hidden per-call costs of the convenience ImageIO.read()
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        rows.map { case (id, payload) => decodeOne(reader, id, payload) }
      }
  }

  private def decodeOne(reader: javax.imageio.ImageReader, id: Long,
                        payload: Array[Byte]): AssetFeatures = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img =
      try { reader.setInput(iis); reader.read(0) }
      finally iis.close()
    require(img != null, s"asset $id: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
        x += 1
      }
      y += 1
    }
    AssetFeatures(id, payload.length.toLong, w, h, sum, sum / (3L * w * h))
  }

  /** Decoded features as a DataFrame query surface (q_multimodal_features):
    * everything here comes out of the real PNG decode; only the
    * oracle-predictable columns are selected (the encoded byte size is
    * codec-dependent, so it stays out of the comparison surface).
    */
  def assetFeatures(s: SparkSession, dir: String): DataFrame =
    decodeAssets(s, dir).toDF()
      .select(col("asset_id"), col("width"), col("height"),
        col("channel_sum"), col("gray_level"))
      .orderBy(col("asset_id"))

  /** The generation-formula twin of `assetFeatures`, computed as pure
    * columns with NO image round-trip — what the DuckDB oracle evaluates.
    * MultimodalSpec pins decode == prediction row for row, which is the
    * end-to-end proof that the PNGs encode and decode faithfully.
    */
  def predictedFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents")
      .withColumn("hx", expr("md5(coalesce(text, ''))"))
      .select(
        col("doc_id").as("asset_id"),
        expr("CAST(32 + (ascii(substr(hx, 1, 1)) % 16) * 8 AS INT)").as("width"),
        expr("CAST(32 + (ascii(substr(hx, 2, 1)) % 16) * 8 AS INT)").as("height"),
        expr("""CAST(CAST(32 + (ascii(substr(hx, 1, 1)) % 16) * 8 AS BIGINT)
                * CAST(32 + (ascii(substr(hx, 2, 1)) % 16) * 8 AS BIGINT)
                * 3 * ((ascii(substr(hx, 3, 1)) % 64) * 4) AS BIGINT)""")
          .as("channel_sum"),
        expr("CAST((ascii(substr(hx, 3, 1)) % 64) * 4 AS BIGINT)").as("gray_level"))
      .orderBy(col("asset_id"))

  /** One sampled "frame" of a (video-like) asset. */
  final case class FrameFeature(
      asset_id: Long,
      frame_idx: Int,
      byte_offset: Long,
      frame_hash: String)

  /** Frame sampling: K evenly spaced byte windows per asset — the seek
    * pattern of video frame extraction, over the real PNG payloads. Same
    * partition-batched shape as decodeAssets (one digest init per
    * partition, streaming rows); a video codec integration would replace
    * the windowed digest with a seek+decode at the sampled timestamp.
    * Output is rows-per-frame, ready for per-frame features or dedup.
    */
  def sampleFrames(s: SparkSession, dir: String, k: Int = 4): Dataset[FrameFeature] = {
    import s.implicits._
    require(k >= 1)
    assets(s, dir)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, payload) =>
          (0 until k).iterator.map { i =>
            val offset = (payload.length.toLong * i) / k
            val end = math.min(payload.length.toLong, offset + 256).toInt
            val window = java.util.Arrays.copyOfRange(payload, offset.toInt, end)
            val hex = md.digest(window).map(b => f"${b & 0xFF}%02x").mkString
            FrameFeature(id, i, offset, hex)
          }
        }
      }
  }
}
