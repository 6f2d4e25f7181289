package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: an opaque binary payload plus typed metadata.
  * This is the storage shape the brief mandates for image/audio/video
  * columns — Parquet `binary` + queryable metadata columns, so pruning,
  * partitioning and predicate pushdown work on metadata without ever
  * decoding payloads. */
case class Asset(asset_id: Long, modality: String, mime: String,
                 payload: Array[Byte])

/** Decoded features for one asset (what a real image decoder would emit).
  * `decoder` records WHICH arm produced the features ("imageio" / "bmp" /
  * "wav" / "stub") — stub fallback on corrupt or unsupported payloads is
  * deliberate (a bad asset must never abort a 100 TB job), so the fallback
  * RATE has to be observable: `group by decoder` on the output is the
  * health check that silent degradation would otherwise hide. */
case class AssetFeatures(asset_id: Long, width: Int, height: Int,
                         n_bytes: Long, features: Array[Float],
                         decoder: String)

/** One resized asset: the payload re-encoded at the target resolution
  * (PNG for the real-decode arm, a deterministic `width×height×3` RGB
  * plane for the stub arm), with the same decoder-provenance labelling as
  * [[AssetFeatures]]. */
case class ResizedAsset(asset_id: Long, width: Int, height: Int,
                        n_bytes: Long, payload: Array[Byte],
                        decoder: String)

/** Multimodal-column plumbing (driver brief: "multimodal columns").
  *
  * The Spark side — schema, typed Encoders, partition-level batch shape,
  * frame sampling — is real and tested (MultimodalSpec). The codec is real
  * for every format the JDK itself can decode (no external libraries):
  *
  *   - PNG / JPEG / GIF (magic-sniffed): decoded with `javax.imageio`
  *     (part of JDK 17, works headless); features are the same 16-bin
  *     BT.601 luminance histogram as the BMP arm, so identical pixel
  *     content yields identical features regardless of container format.
  *   - BMP (`BM` magic): hand-rolled BITMAPINFOHEADER walk; for
  *     uncompressed 24-bpp payloads the features are the 16-bin luminance
  *     histogram over the actual pixels — a genuine decode→feature pass.
  *     (Kept over ImageIO's BMP plugin: it predates the ImageIO arm and
  *     pins the byte-level layout in its spec.)
  *   - WAV (`RIFF…WAVE` magic): fmt/data chunk walk; width = frame count,
  *     height = channel count; features = 16-bin amplitude histogram over
  *     the 16-bit PCM samples.
  *   - anything else (MP3, video codecs, raw text) falls back to
  *     `decodeStub`'s deterministic payload-derived pseudo-features, so
  *     opaque modalities still flow through the same pipeline. A
  *     production build would swap the stub arm for an AV library; every
  *     Spark-facing signature stays as is.
  *
  * Scale notes: `featurize` is `mapPartitions` — the Scala analogue of
  * `mapInPandas` — so per-partition codec state (a decoder instance, a GPU
  * handle) is initialized once per task, not once per row, and the work
  * distributes with the data. Frame sampling is builtin expressions
  * (`substring` on binary inside `transform`) and stays in codegen.
  */
object Multimodal {

  /** Real decode for the formats we own, stub for the rest. Deterministic:
    * pure function of the payload bytes on any executor. ANY real-codec
    * failure — truncated BMP/WAV headers (their require()s), ImageIO
    * readers throwing on malformed bodies (which includes RuntimeExceptions
    * like AIOOBE from the JDK's GIF reader, not just IIOException) — falls
    * back to the stub: a corrupt asset must degrade, never abort a 100 TB
    * featurize job. The first tuple element names the arm that actually
    * produced the result, so fallback is observable, not silent. */
  private[multimodal] def decode(payload: Array[Byte]): (String, Int, Int, Array[Float]) =
    try {
      if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
        tagged("bmp", decodeBmp(payload))
      else if (payload.length >= 12 && hasAscii(payload, 0, "RIFF") &&
        hasAscii(payload, 8, "WAVE"))
        tagged("wav", decodeWav(payload))
      else if (isImageIoFormat(payload)) decodeImageIo(payload)
      else tagged("stub", decodeStub(payload))
    } catch {
      case scala.util.control.NonFatal(_) => tagged("stub", decodeStub(payload))
    }

  private def tagged(name: String, r: (Int, Int, Array[Float])) =
    (name, r._1, r._2, r._3)

  /** Magic-number sniff for the raster formats the JDK's ImageIO decodes
    * out of the box: PNG (\\x89PNG), JPEG (\\xFF\\xD8\\xFF), GIF (GIF8). */
  private def isImageIoFormat(p: Array[Byte]): Boolean =
    (p.length >= 4 && (p(0) & 0xff) == 0x89 && hasAscii(p, 1, "PNG")) ||
      (p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
        (p(2) & 0xff) == 0xff) ||
      (p.length >= 4 && hasAscii(p, 0, "GIF8"))

  /** PNG/JPEG/GIF decode via `javax.imageio` (in-JDK, headless-safe): true
    * dims + the SAME 16-bin BT.601 integer-luminance histogram as the BMP
    * arm, so a pixel-identical image produces identical features in either
    * container. Bulk `getRGB` keeps it one array pass, no per-pixel JNI.
    * An unreadable payload (ImageIO.read returns null) falls back to
    * `decodeStub` (tagged "stub"); reader EXCEPTIONS are handled by
    * `decode`'s NonFatal fallback, which covers every real-codec arm. */
  private[multimodal] def decodeImageIo(p: Array[Byte]): (String, Int, Int, Array[Float]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    if (img == null) return tagged("stub", decodeStub(p))
    val w = img.getWidth
    val h = img.getHeight
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val hist = new Array[Float](16)
    var i = 0
    while (i < rgb.length) {
      val v = rgb(i)
      val lum = (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 +
        (v & 0xff) * 114) / 1000
      hist(lum >> 4) += 1f
      i += 1
    }
    val n = rgb.length.toFloat
    i = 0
    while (i < 16) { hist(i) /= n; i += 1 }
    ("imageio", w, h, hist)
  }

  private def hasAscii(p: Array[Byte], off: Int, s: String): Boolean =
    s.indices.forall(i => p(off + i) == s.charAt(i).toByte)

  private def u16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def i32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)

  /** BITMAPFILEHEADER(14) + BITMAPINFOHEADER: width @18, height @22 (may be
    * negative = top-down), bpp @28, compression @30, pixel data @ the
    * offset stored @10; 24-bpp rows are 4-byte padded. Histogram bins are
    * integer luminance (BT.601 weights, integer arithmetic) → 16 bins. */
  private[multimodal] def decodeBmp(p: Array[Byte]): (Int, Int, Array[Float]) = {
    require(p.length >= 54, s"BMP truncated: ${p.length} bytes < 54-byte headers")
    val width = i32(p, 18)
    val heightRaw = i32(p, 22)
    val height = math.abs(heightRaw)
    val bpp = u16(p, 28)
    val compression = i32(p, 30)
    val dataOff = i32(p, 10)
    val hist = new Array[Float](16)
    if (bpp == 24 && compression == 0 && width > 0 && height > 0) {
      val rowBytes = ((width * 3 + 3) / 4) * 4
      require(p.length >= dataOff + rowBytes.toLong * height,
        s"BMP truncated: expected ${dataOff + rowBytes.toLong * height} bytes, got ${p.length}")
      var y = 0
      while (y < height) {
        var x = 0
        val row = dataOff + y * rowBytes
        while (x < width) {
          val b = p(row + x * 3) & 0xff
          val g = p(row + x * 3 + 1) & 0xff
          val r = p(row + x * 3 + 2) & 0xff
          val lum = (r * 299 + g * 587 + b * 114) / 1000
          hist(lum >> 4) += 1f
          x += 1
        }
        y += 1
      }
      val n = (width.toLong * height).toFloat
      var i = 0
      while (i < 16) { hist(i) /= n; i += 1 }
    }
    (width, height, hist)
  }

  /** RIFF chunk walk: `fmt ` gives channels @+2 / bits-per-sample @+14,
    * `data` holds the samples. width = PCM frames, height = channels;
    * features = 16-bin histogram of the unsigned-shifted 16-bit samples. */
  private[multimodal] def decodeWav(p: Array[Byte]): (Int, Int, Array[Float]) = {
    var off = 12
    var channels = 0
    var bits = 0
    var frames = 0
    val hist = new Array[Float](16)
    var sampleCount = 0L
    while (off + 8 <= p.length) {
      val size = i32(p, off + 4)
      require(size >= 0 && off + 8 + size <= p.length,
        s"WAV chunk at $off overruns payload (${p.length} bytes)")
      if (hasAscii(p, off, "fmt ")) {
        require(size >= 16, s"WAV fmt chunk too small: $size")
        channels = u16(p, off + 10)
        bits = u16(p, off + 22)
      } else if (hasAscii(p, off, "data") && bits == 16 && channels > 0) {
        frames = size / (channels * 2)
        var i = off + 8
        val end = off + 8 + size - 1
        while (i < end) {
          val s = (u16(p, i).toShort.toInt + 32768) >> 12 // 0..15
          hist(s) += 1f
          sampleCount += 1
          i += 2
        }
      }
      off += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    require(channels > 0, "WAV: no fmt chunk found")
    if (sampleCount > 0) {
      var i = 0
      while (i < 16) { hist(i) /= sampleCount.toFloat; i += 1 }
    }
    (frames, channels, hist)
  }

  /** Canonical multimodal frame from any binary column: opaque payload +
    * metadata derived WITHOUT decoding (length, content hash). */
  def pack(df: DataFrame, idCol: String, payloadCol: String,
           modality: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      lit(mime).as("mime"),
      col(payloadCol).cast("binary").as("payload"),
      length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
      sha2(col(payloadCol).cast("binary"), 256).as("content_sha"))

  /** Fallback decode for modalities without a pure-JVM codec (JPEG, PNG,
    * MP3, raw text payloads): deterministic payload-derived pseudo-features.
    * Dims come from a stable hash of the payload; "features" are a 16-dim
    * byte-histogram projection. Deterministic: same payload, same output,
    * on any executor. */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 16 + math.floorMod(h, 1024)
    val height = 16 + math.floorMod(h >> 10, 1024)
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist(java.lang.Byte.toUnsignedInt(payload(i)) % 16) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    (width, height, hist.map(_ / n))
  }

  /** Batched decode/feature-extract over a typed Dataset — the
    * `mapInPandas` analogue: one codec init per PARTITION, rows streamed
    * through it. Plans as a single narrow stage (no shuffle). */
  def featurize(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // heavier codecs would open their handle here, once per task
      it.map { a =>
        val (dec, w, h, feat) = decode(a.payload)
        AssetFeatures(a.asset_id, w, h, a.payload.length.toLong, feat, dec)
      }
    }
  }

  /** Batched resize over a typed Dataset — same `mapInPandas`-analogue
    * shape as [[featurize]] (one codec init per PARTITION, narrow stage,
    * no shuffle). Decodable rasters (PNG/JPEG/GIF/BMP via the JDK) are
    * bilinear-resampled to `width × height` and re-encoded as PNG; every
    * other payload takes the deterministic stub arm (a `width×height×3`
    * RGB plane cycled from the payload bytes), so opaque modalities flow
    * through the same pipeline without aborting the job. Provenance rides
    * in `decoder` exactly as in featurize. */
  def resize(assets: Dataset[Asset], width: Int, height: Int): Dataset[ResizedAsset] = {
    require(width > 0 && height > 0, s"target dims must be positive: $width x $height")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // heavier codecs would open their handle here, once per task
      it.map { a =>
        val (dec, bytes) = resizeOne(a.payload, width, height)
        ResizedAsset(a.asset_id, width, height, bytes.length.toLong, bytes, dec)
      }
    }
  }

  /** Real resample for anything the JDK can both read and write; stub for
    * the rest, with [[decode]]'s degrade-never-abort failure contract. BMP
    * is included here (unlike the featurize sniff order) because ImageIO
    * READS BMP fine — featurize keeps its hand-rolled BMP arm only to pin
    * the byte-level layout in its spec. */
  private[multimodal] def resizeOne(p: Array[Byte], w: Int, h: Int): (String, Array[Byte]) =
    try {
      val raster = isImageIoFormat(p) ||
        (p.length >= 2 && p(0) == 'B' && p(1) == 'M')
      if (!raster) ("stub", resizeStub(p, w, h))
      else {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        if (img == null) ("stub", resizeStub(p, w, h))
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ("imageio", bos.toByteArray)
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => ("stub", resizeStub(p, w, h))
    }

  /** Deterministic stub "thumbnail": a `w×h×3` RGB plane whose bytes cycle
    * the payload — same size contract as a real raw-RGB resize, pure
    * function of (payload, w, h) on any executor. */
  private[multimodal] def resizeStub(p: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    if (p.nonEmpty) {
      var i = 0
      while (i < out.length) { out(i) = p(i % p.length); i += 1 }
    }
    out
  }

  /** Frame sampling for chunked/video-like payloads: every `stride`-th
    * fixed-size frame, as an array column — builtin expressions only, no
    * decode, stays in whole-stage codegen. */
  def sampleFrames(df: DataFrame, payloadCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(payloadCol)) / frameBytes)
    df.withColumn("frames",
      transform(
        filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % stride === 0 && nFrames > 0),
        i => substring(col(payloadCol), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
  }

  /** The documents fixture viewed as a multimodal corpus (text bytes as the
    * opaque payload) — exercises the full pack→featurize path on real
    * parquet input. */
  def documentAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("asset_id"), lit("text").as("modality"),
        lit("text/plain").as("mime"), col("text").cast("binary").as("payload"))
      .as[Asset]
  }
}
