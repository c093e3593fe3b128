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

  /** Image dedup on DECODED content: group assets whose decoded rasters
    * are identical and keep the smallest id per group — the "same image
    * re-hosted / re-encoded elsewhere" pass an image-corpus pipeline runs
    * after download. Identity is decided from what the DECODER produced,
    * never from the encoded bytes (two byte-different PNGs of the same
    * raster still collapse). With this generator's constant fills the
    * raster is exactly (width, height, gray_level) — channel_sum is
    * derived — so the grouping key a production pipeline gets from a
    * pixel-buffer digest reduces to that tuple here; the plumbing
    * (decode once per partition, hash-group on decoded content, min-id
    * keeper) is unchanged by the digest's width.
    *
    * 100 TB shape: the decode is the dominant cost and happens exactly
    * once per asset (the existing partition-batched codec path); the
    * grouping shuffle carries one short row per ASSET (never pixels),
    * map-side combined.
    */
  def imageDedup(s: SparkSession, dir: String): DataFrame =
    decodeAssets(s, dir).toDF()
      .groupBy(col("width"), col("height"), col("gray_level"))
      .agg(count(lit(1)).as("n_assets"), min(col("asset_id")).as("keeper_asset_id"))
      .filter(col("n_assets") > 1)
      .orderBy(col("width"), col("height"), col("gray_level"))

  /** Perceptual NEAR-dup on decoded rasters: same canvas, gray levels
    * within `tol` — the tolerance pass an image pipeline runs after
    * exact dedup ("same screenshot, slightly different brightness").
    * Like [[imageDedup]], similarity is judged on what the DECODER
    * produced, never encoded bytes.
    *
    * Never all-pairs: each decoded asset lands in overlapping gray bands
    * (g DIV tol and g DIV tol + 1 — any pair within tol provably shares
    * a band), candidates equi-join on (width, height, band), and the
    * exact |Δgray| <= tol predicate re-checks survivors; `distinct`
    * collapses pairs that met in both bands. The same LSH-shaped
    * candidate/verify split as the text near-dup family, on a scalar
    * perceptual feature. Decode remains once per asset, partition-batched.
    */
  def imageNearDup(s: SparkSession, dir: String, tol: Int = 8): DataFrame = {
    val f = decodeAssets(s, dir).toDF()
      .select(col("asset_id"), col("width"), col("height"), col("gray_level"))
    val banded = f.withColumn("band",
      explode(array(expr(s"gray_level DIV $tol"),
        expr(s"gray_level DIV $tol + 1"))))
    banded.as("a").join(banded.as("b"),
        col("a.width") === col("b.width") &&
          col("a.height") === col("b.height") &&
          col("a.band") === col("b.band") &&
          col("a.asset_id") < col("b.asset_id"))
      .filter(abs(col("a.gray_level") - col("b.gray_level")) <= tol)
      .select(col("a.asset_id").as("asset_a"), col("b.asset_id").as("asset_b"),
        col("a.width").as("width"), col("a.height").as("height"),
        abs(col("a.gray_level") - col("b.gray_level")).as("gray_delta"))
      .distinct()
      .orderBy(col("asset_a"), col("asset_b"))
  }

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

  /** One sampled, DECODED frame of a multi-frame (video-like) asset. */
  final case class FrameFeature(
      asset_id: Long,
      frame_idx: Int,
      n_frames: Int,
      width: Int,
      height: Int,
      channel_sum: Long,
      gray_level: Long)

  /** Internal generator record for multi-frame assets (public for the
    * same janino-accessor reason as AssetRow).
    */
  final case class VideoAssetRow(
      asset_id: Long,
      payload: Array[Byte],
      n_frames: Int,
      mime: String)

  /** The multi-frame generation formula, shared by the GIF generator, the
    * predicted-features twin, and the DuckDB oracle. Hex chars 1-4 of
    * md5(text) pick width, height, the base gray fill, and the frame
    * count; frame i fills with base + 8*i (base <= 196 and nFrames <= 4,
    * so every fill stays inside the 256-gray palette with no modular
    * wrap the oracle would have to mirror).
    */
  private def videoDims(md5Hex: String): (Int, Int, Int, Int) = {
    val w = 16 + (md5Hex.charAt(0).toInt % 8) * 4
    val h = 16 + (md5Hex.charAt(1).toInt % 8) * 4
    val base = (md5Hex.charAt(2).toInt % 50) * 4
    val nFrames = 2 + (md5Hex.charAt(3).toInt % 3)
    (w, h, base, nFrames)
  }

  /** 256-entry grayscale palette: index i decodes to RGB (i, i, i), so an
    * indexed GIF round-trips pixel values exactly (no quantization).
    */
  private def grayPalette(): java.awt.image.IndexColorModel = {
    val grays = Array.tabulate(256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
  }

  /** Multi-frame (video-like) asset table: payload = a REAL animated GIF
    * (2-4 constant-fill frames, content-addressed dims and fills),
    * written with javax.imageio's sequence writer. Same per-partition
    * codec-init discipline as `assets`: one writer instance per
    * partition, streamed rows, never a temp file.
    */
  def videoAssets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(s, dir, "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        // dispose on task completion (fires on success, failure, AND
        // early-terminating consumers like limit) — appending a dispose
        // to the iterator only runs when the partition fully drains
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => writer.dispose()))
        val icm = grayPalette()
        rows.map { case (id, text) =>
          val hex = md.digest(text.getBytes("UTF-8"))
            .map(b => f"${b & 0xFF}%02x").mkString
          val (w, h, base, nFrames) = videoDims(hex)
          val out = new java.io.ByteArrayOutputStream(1024)
          val ios = javax.imageio.ImageIO.createImageOutputStream(out)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var i = 0
          while (i < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            val data = Array.fill[Byte](w * h)((base + 8 * i).toByte)
            img.getRaster.setDataElements(0, 0, w, h, data)
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            i += 1
          }
          writer.endWriteSequence()
          ios.close()
          VideoAssetRow(id, out.toByteArray, nFrames, "image/gif")
        }
      }
      .toDF()
  }

  /** Frame sampling with REAL per-frame decode: k evenly spaced frame
    * indices per asset (deduplicated when the asset has fewer than k
    * frames), each decoded from the animated GIF via `reader.read(idx)` —
    * the seek+decode-at-sampled-timestamp shape of video frame
    * extraction. Frame count comes from the container itself
    * (`getNumImages`), not the generator; one reader init per partition.
    */
  def sampleFrames(s: SparkSession, dir: String, k: Int = 4): Dataset[FrameFeature] = {
    import s.implicits._
    require(k >= 1)
    videoAssets(s, dir)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        // dispose on task completion — covers failure and early
        // termination paths the drained-iterator form missed
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => reader.dispose()))
        rows.flatMap { case (id, payload) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          // close the stream even when a corrupt payload makes read throw
          // (otherwise the executor leaks one stream per bad row)
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val sampled = (0 until k).map(i => (n * i) / k).distinct
            val features = sampled.map { idx =>
              val img = reader.read(idx)
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
              FrameFeature(id, idx, n, w, h, sum, sum / (3L * w * h))
            }
            features.iterator
          } finally iis.close()
        }
      }
  }

  /** Sampled-frame features as a DataFrame query surface
    * (q_frame_features): every value here comes out of the real GIF
    * decode — frame count from the container, pixel sums from decoded
    * rasters.
    */
  def frameFeatures(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    sampleFrames(s, dir, k).toDF()
      .orderBy(col("asset_id"), col("frame_idx"))

  /** The generation-formula twin of `frameFeatures` — pure columns, no
    * GIF round-trip — what the DuckDB oracle evaluates. OperatorSpec pins
    * decode == prediction row for row, proving the animated-GIF encode /
    * seek / per-frame decode is faithful.
    */
  def predictedFrameFeatures(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    Tables.spread(s, dir, "documents")
      .withColumn("hx", expr("md5(coalesce(text, ''))"))
      .select(
        col("doc_id").as("asset_id"),
        expr("CAST(16 + (ascii(substr(hx, 1, 1)) % 8) * 4 AS INT)").as("width"),
        expr("CAST(16 + (ascii(substr(hx, 2, 1)) % 8) * 4 AS INT)").as("height"),
        expr("CAST((ascii(substr(hx, 3, 1)) % 50) * 4 AS BIGINT)").as("base"),
        expr("CAST(2 + (ascii(substr(hx, 4, 1)) % 3) AS INT)").as("n_frames"))
      .crossJoin(s.range(k).select(col("id").as("i")))
      .select(col("asset_id"),
        expr("CAST((n_frames * i) DIV " + k + " AS INT)").as("frame_idx"),
        col("n_frames"), col("width"), col("height"), col("base"))
      .distinct()
      .select(col("asset_id"), col("frame_idx"), col("n_frames"),
        col("width"), col("height"),
        expr("CAST(3 * (base + 8 * frame_idx) AS BIGINT) * width * height")
          .as("channel_sum"),
        expr("CAST(base + 8 * frame_idx AS BIGINT)").as("gray_level"))
      .orderBy(col("asset_id"), col("frame_idx"))

  /** Decoded-audio feature record (emitted by the real WAV decode).
    * Everything comes from the parsed container + PCM frames: the rate
    * and frame count from the header, the signal stats from the decoded
    * 16-bit samples.
    */
  final case class AudioFeatures(
      asset_id: Long,
      sample_rate: Int,
      n_samples: Long,
      duration_ms: Long,
      peak: Long,
      abs_sum: Long,
      zero_crossings: Long)

  /** Internal generator record for audio assets (public for the same
    * janino-accessor reason as AssetRow).
    */
  final case class AudioAssetRow(
      asset_id: Long,
      payload: Array[Byte],
      n_samples: Long,
      mime: String)

  /** The audio generation formula, shared by the WAV generator, the
    * predicted-features twin, and the DuckDB oracle. Hex chars 1-4 of
    * md5(text) pick the sample rate, sample count, square-wave amplitude
    * (512..31512 — always inside int16), and half-period (1..4 samples):
    * sample i = amp when (i / hp) is even, else -amp.
    */
  private def audioDims(md5Hex: String): (Int, Int, Int, Int) = {
    val rate = 8000 + (md5Hex.charAt(0).toInt % 8) * 1000
    val n = 256 + (md5Hex.charAt(1).toInt % 16) * 64
    val amp = 512 + (md5Hex.charAt(2).toInt % 32) * 1000
    val hp = 1 + (md5Hex.charAt(3).toInt % 4)
    (rate, n, amp, hp)
  }

  /** Audio asset table: payload = a REAL RIFF/WAVE container (PCM16
    * mono little-endian, canonical 44-byte header) holding the
    * content-addressed square wave. The writer emits the container
    * byte-for-byte deterministically; `javax.sound` parses it back in
    * decodeAudio, so generator and decoder cross-validate. Same
    * per-partition state discipline as `assets`.
    */
  def audioAssets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.spread(s, dir, "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          val hex = md.digest(text.getBytes("UTF-8"))
            .map(b => f"${b & 0xFF}%02x").mkString
          val (rate, n, amp, hp) = audioDims(hex)
          val dataSize = n * 2
          val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1)             // PCM, mono
            .putInt(rate).putInt(rate * 2)       // sample rate, byte rate
            .putShort(2).putShort(16)            // block align, bits/sample
            .put("data".getBytes("US-ASCII")).putInt(dataSize)
          var i = 0
          while (i < n) {
            buf.putShort((if ((i / hp) % 2 == 0) amp else -amp).toShort)
            i += 1
          }
          AudioAssetRow(id, buf.array(), n.toLong, "audio/wav")
        }
      }
      .toDF()
  }

  /** Partition-batched REAL audio decode: the WAVE `AudioFileReader`
    * SPI is resolved from the ServiceLoader registry ONCE per partition
    * (the hidden per-call cost of the convenience
    * `AudioSystem.getAudioInputStream`, which re-iterates providers on
    * every invocation), then each payload is container-parsed and its
    * PCM frames decoded into 16-bit samples for the feature pass.
    */
  def decodeAudio(s: SparkSession, dir: String): Dataset[AudioFeatures] = {
    import s.implicits._
    audioAssets(s, dir)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        import scala.jdk.CollectionConverters._
        val readers = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .iterator().asScala.toList
        rows.map { case (id, payload) =>
          val in = new java.io.ByteArrayInputStream(payload)
          val ais = readers.view.flatMap { r =>
            in.reset()
            try Some(r.getAudioInputStream(in))
            catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => None
            }
          }.headOption.getOrElse(
            sys.error(s"asset $id: payload is not a decodable audio container"))
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
              s"asset $id: expected PCM16 mono, got $fmt")
            val rate = fmt.getSampleRate.toInt
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            var absSum = 0L
            var peak = 0L
            var crossings = 0L
            var prev = 0
            var i = 0
            while (i < n) {
              val sample = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF))
              val a = math.abs(sample.toLong)
              absSum += a
              if (a > peak) peak = a
              if (i > 0 && ((sample < 0) != (prev < 0))) crossings += 1
              prev = sample
              i += 1
            }
            AudioFeatures(id, rate, n.toLong, n.toLong * 1000L / rate,
              peak, absSum, crossings)
          } finally ais.close()
        }
      }
  }

  /** Decoded audio features as a DataFrame query surface
    * (q_audio_features): every value comes out of the real WAV parse —
    * rate from the header, stats from decoded PCM samples.
    */
  def audioFeatures(s: SparkSession, dir: String): DataFrame =
    decodeAudio(s, dir).toDF()
      .orderBy(col("asset_id"))

  /** The generation-formula twin of `audioFeatures` — pure columns, no
    * WAV round-trip — what the DuckDB oracle evaluates. OperatorSpec
    * pins decode == prediction row for row, proving the RIFF encode /
    * container parse / PCM decode is faithful. The square wave flips
    * sign at every half-period boundary, so crossings = (n-1) div hp.
    */
  def predictedAudioFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents")
      .withColumn("hx", expr("md5(coalesce(text, ''))"))
      .select(
        col("doc_id").as("asset_id"),
        expr("CAST(8000 + (ascii(substr(hx, 1, 1)) % 8) * 1000 AS INT)")
          .as("sample_rate"),
        expr("CAST(256 + (ascii(substr(hx, 2, 1)) % 16) * 64 AS BIGINT)")
          .as("n_samples"),
        expr("""CAST((256 + (ascii(substr(hx, 2, 1)) % 16) * 64) * 1000
                DIV (8000 + (ascii(substr(hx, 1, 1)) % 8) * 1000) AS BIGINT)""")
          .as("duration_ms"),
        expr("CAST(512 + (ascii(substr(hx, 3, 1)) % 32) * 1000 AS BIGINT)")
          .as("peak"),
        expr("""CAST(512 + (ascii(substr(hx, 3, 1)) % 32) * 1000 AS BIGINT)
                * (256 + (ascii(substr(hx, 2, 1)) % 16) * 64)""")
          .as("abs_sum"),
        expr("""CAST((256 + (ascii(substr(hx, 2, 1)) % 16) * 64 - 1)
                DIV (1 + (ascii(substr(hx, 4, 1)) % 4)) AS BIGINT)""")
          .as("zero_crossings"))
      .orderBy(col("asset_id"))

  /** Shot-boundary detection over the REAL decoded frame stream: a
    * sampled frame opens a new shot when its decoded mean gray level
    * jumps by at least 1/[[invFrac]] of the PREVIOUS frame's level — the
    * adaptive relative-change rule (a fixed jump reads as a cut in a
    * dark scene and as noise in a bright one), and the scene-cut
    * primitive a video curation pipeline runs to pick representative
    * keyframes. Per asset: sampled frames, boundaries
    * (first frame never counts), and the first boundary's frame index
    * (-1 when the clip is one shot end to end). Every gray level comes
    * out of the actual GIF decode; the oracle predicts the same stream
    * from the generation formula, so decode-vs-prediction equality rides
    * the same contract as q_frame_features.
    *
    * 100 TB shape: decode runs in [[sampleFrames]]' mapPartitions (one
    * reader per partition, no driver hop); the lag window rides one
    * asset-keyed shuffle whose rows are the k SAMPLED frames per asset,
    * never the raw video bytes; the per-asset rollup is map-side
    * combinable.
    */
  def shotBoundaries(s: SparkSession, dir: String, k: Int = 3,
                     invFrac: Long = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id")).orderBy(col("frame_idx"))
    sampleFrames(s, dir, k).toDF()
      .select(col("asset_id"), col("frame_idx"), col("gray_level"))
      .withColumn("prev", lag(col("gray_level"), 1).over(w))
      .withColumn("cut",
        (col("prev").isNotNull &&
          abs(col("gray_level") - col("prev")) * invFrac >= col("prev"))
          .cast("int"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("cut")).cast("bigint").as("n_boundaries"),
        coalesce(min(when(col("cut") === 1, col("frame_idx"))), lit(-1))
          .cast("bigint").as("first_cut_idx"))
      .orderBy(col("asset_id"))
  }
}
