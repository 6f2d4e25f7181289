package graft

import graft.multimodal.{Asset, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: pack → featurize (mapPartitions
  * typed path with stubbed codec) → frame sampling. */
class MultimodalSpec extends SparkSpec {

  test("pack exposes queryable metadata without decoding payloads") {
    val docs = Tables.documents(spark, sf0001)
    val packed = Multimodal.pack(docs, "doc_id", "text", "text", "text/plain")
    assert(packed.columns.toSeq ==
      Seq("asset_id", "modality", "mime", "payload", "n_bytes", "content_sha"))
    val r = packed.where(col("asset_id") === 0).collect().head
    assert(r.getAs[Long]("n_bytes") == r.getAs[Array[Byte]]("payload").length.toLong)
    // metadata predicate prunes without touching payload bytes
    assert(packed.where(col("n_bytes") > 300).count() > 0)
  }

  test("featurize: deterministic stub decode, one feature row per asset, round-trips parquet") {
    val assets = Multimodal.documentAssets(spark, sf0001)
    val feats = Multimodal.featurize(assets).cache()
    assert(feats.count() == 500)
    val f0 = feats.filter(_.asset_id == 0L).head()
    assert(f0.features.length == 16)
    assert(math.abs(f0.features.sum - 1.0f) < 1e-3) // normalized histogram
    // determinism across plans
    val again = Multimodal.featurize(assets).filter(_.asset_id == 0L).head()
    assert(again.width == f0.width && again.features.toSeq == f0.features.toSeq)
    // binary+array schema survives a parquet round trip
    val tmp = java.nio.file.Files.createTempDirectory("mm").toString
    try {
      assets.limit(10).write.mode("overwrite").parquet(s"$tmp/assets")
      import spark.implicits._
      val back = spark.read.parquet(s"$tmp/assets").as[Asset]
      assert(back.count() == 10)
      val orig = assets.filter(_.asset_id == 0L).head()
      val rt = back.filter(_.asset_id == 0L).head()
      assert(java.util.Arrays.equals(orig.payload, rt.payload))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  /** Hand-assembled 24-bpp bottom-up BMP. */
  private def bmp(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((width * 3 + 3) / 4) * 4
    val dataOff = 54
    val total = dataOff + rowBytes * height
    val p = new Array[Byte](total)
    def put16(i: Int, v: Int): Unit = { p(i) = v.toByte; p(i + 1) = (v >> 8).toByte }
    def put32(i: Int, v: Int): Unit = (0 until 4).foreach(k => p(i + k) = (v >> (8 * k)).toByte)
    p(0) = 'B'; p(1) = 'M'
    put32(2, total); put32(10, dataOff)
    put32(14, 40) // BITMAPINFOHEADER size
    put32(18, width); put32(22, height)
    put16(26, 1) // planes
    put16(28, 24) // bpp
    put32(30, 0) // BI_RGB
    for (y <- 0 until height; x <- 0 until width) {
      val (r, g, b) = rgb(x, y)
      val o = dataOff + y * rowBytes + x * 3
      p(o) = b.toByte; p(o + 1) = g.toByte; p(o + 2) = r.toByte
    }
    p
  }

  /** Hand-assembled 16-bit PCM WAV. */
  private def wav(channels: Int, sampleRate: Int, samples: Seq[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val total = 44 + dataSize
    val p = new Array[Byte](total)
    def putA(i: Int, s: String): Unit = s.indices.foreach(k => p(i + k) = s.charAt(k).toByte)
    def put16(i: Int, v: Int): Unit = { p(i) = v.toByte; p(i + 1) = (v >> 8).toByte }
    def put32(i: Int, v: Int): Unit = (0 until 4).foreach(k => p(i + k) = (v >> (8 * k)).toByte)
    putA(0, "RIFF"); put32(4, total - 8); putA(8, "WAVE")
    putA(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, channels); put32(24, sampleRate)
    put32(28, sampleRate * channels * 2); put16(32, channels * 2); put16(34, 16)
    putA(36, "data"); put32(40, dataSize)
    samples.indices.foreach(k => put16(44 + k * 2, samples(k) & 0xffff))
    p
  }

  test("BMP codec: real dims and a luminance histogram from actual pixels") {
    import spark.implicits._
    // 3x2: left column pure black (lum 0 -> bin 0), rest pure white (bin 15)
    val img = bmp(3, 2, (x, _) => if (x == 0) (0, 0, 0) else (255, 255, 255))
    val assets = Seq(Asset(7L, "image", "image/bmp", img)).toDS()
    val f = Multimodal.featurize(assets).head()
    assert(f.width == 3 && f.height == 2)
    assert(math.abs(f.features(0) - 2f / 6f) < 1e-6) // 2 of 6 pixels black
    assert(math.abs(f.features(15) - 4f / 6f) < 1e-6) // 4 of 6 white
    assert(math.abs(f.features.sum - 1f) < 1e-6)
  }

  test("WAV codec: frames/channels from the chunk walk, amplitude histogram from samples") {
    import spark.implicits._
    // stereo, 4 frames: all-zero samples land in bin (0+32768)>>12 = 8
    val audio = wav(2, 8000, Seq.fill[Short](8)(0))
    val loud = wav(1, 8000, Seq[Short](Short.MinValue, Short.MaxValue))
    val assets = Seq(
      Asset(1L, "audio", "audio/wav", audio),
      Asset(2L, "audio", "audio/wav", loud)).toDS()
    val out = Multimodal.featurize(assets).collect().sortBy(_.asset_id)
    assert(out(0).width == 4 && out(0).height == 2) // 8 samples / 2 channels
    assert(math.abs(out(0).features(8) - 1f) < 1e-6)
    assert(out(1).width == 2 && out(1).height == 1)
    assert(math.abs(out(1).features(0) - 0.5f) < 1e-6) // min-amplitude sample
    assert(math.abs(out(1).features(15) - 0.5f) < 1e-6) // max-amplitude sample
  }

  test("PNG/JPEG decode via javax.imageio: true dims; PNG features equal the " +
      "BMP arm's on pixel-identical content") {
    import spark.implicits._
    // the same 3x2 black/white image as the BMP test, but written as a real
    // PNG by ImageIO itself — pixel-identical content must produce
    // IDENTICAL features across container formats (shared BT.601 histogram)
    val bi = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3)
      bi.setRGB(x, y, if (x == 0) 0x000000 else 0xffffff)
    def bytesOf(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = bytesOf("png")
    val jpg = bytesOf("jpg")
    assert((png(0) & 0xff) == 0x89 && (jpg(0) & 0xff) == 0xff) // real containers
    val bmpBytes = bmp(3, 2, (x, _) => if (x == 0) (0, 0, 0) else (255, 255, 255))
    val out = Multimodal.featurize(Seq(
        Asset(1L, "image", "image/png", png),
        Asset(2L, "image", "image/jpeg", jpg),
        Asset(3L, "image", "image/bmp", bmpBytes)).toDS())
      .collect().sortBy(_.asset_id)
    assert(out.forall(f => f.width == 3 && f.height == 2))
    // PNG is lossless: features must EQUAL the BMP decode bit-for-bit
    assert(out(0).features.toSeq == out(2).features.toSeq,
      s"png=${out(0).features.toSeq} bmp=${out(2).features.toSeq}")
    // JPEG is lossy: same two bins dominate, mass sums to 1
    assert(math.abs(out(1).features.sum - 1f) < 1e-5)
    assert(out(1).features(0) + out(1).features(15) > 0.9f,
      s"jpeg histogram diffused: ${out(1).features.toSeq}")
  }

  test("corrupt image payloads fall back to the stub instead of failing the task") {
    import spark.implicits._
    // JPEG magic followed by garbage: ImageIO cannot decode it; the decode
    // must degrade to the deterministic stub, not abort the featurize job
    val corrupt = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "definitely not a jpeg body".getBytes("UTF-8")
    val out = Multimodal.featurize(
      Seq(Asset(5L, "image", "image/jpeg", corrupt)).toDS()).head()
    val again = Multimodal.featurize(
      Seq(Asset(5L, "image", "image/jpeg", corrupt)).toDS()).head()
    // stub semantics: deterministic pseudo-features, normalized histogram
    assert(out.width == again.width && out.features.toSeq == again.features.toSeq)
    assert(math.abs(out.features.sum - 1f) < 1e-3)
    // and the degradation is OBSERVABLE: the row says the stub produced it
    assert(out.decoder == "stub", out.decoder)
  }

  test("decoder provenance: each arm labels its rows, so fallback rates " +
      "are measurable with a group-by") {
    import spark.implicits._
    val bi = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", bos))
    val out = Multimodal.featurize(Seq(
        Asset(1L, "image", "image/png", bos.toByteArray),
        Asset(2L, "image", "image/bmp",
          bmp(2, 2, (_, _) => (0, 0, 0))),
        Asset(3L, "audio", "audio/wav", wav(1, 8000, Seq[Short](0, 0))),
        Asset(4L, "text", "text/plain", "plain bytes".getBytes("UTF-8"))).toDS())
      .collect().sortBy(_.asset_id).map(_.decoder).toSeq
    assert(out == Seq("imageio", "bmp", "wav", "stub"), out.toString)
  }

  test("unknown modalities keep the deterministic stub fallback") {
    import spark.implicits._
    val blob = "not an image".getBytes("UTF-8")
    val a = Multimodal.featurize(Seq(Asset(9L, "text", "text/plain", blob)).toDS()).head()
    val b = Multimodal.featurize(Seq(Asset(9L, "text", "text/plain", blob)).toDS()).head()
    assert(a.width == b.width && a.features.toSeq == b.features.toSeq)
    assert(math.abs(a.features.sum - 1f) < 1e-3)
  }

  test("resize: real bilinear resample for decodable rasters (PNG round-trip " +
      "at target dims), deterministic stub plane for opaque payloads") {
    import spark.implicits._
    // a 4x4 PNG with distinct quadrant colors
    val bi = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      bi.setRGB(x, y, if (x < 2) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", bos))
    val out = Multimodal.resize(Seq(
        Asset(1L, "image", "image/png", bos.toByteArray),
        Asset(2L, "image", "image/bmp", bmp(3, 5, (_, _) => (10, 20, 30))),
        Asset(3L, "text", "text/plain", "opaque payload".getBytes("UTF-8"))).toDS(),
      width = 8, height = 6).collect().sortBy(_.asset_id)
    assert(out.map(_.decoder).toSeq == Seq("imageio", "imageio", "stub"))
    assert(out.forall(r => r.width == 8 && r.height == 6))
    assert(out.forall(r => r.n_bytes == r.payload.length.toLong))
    // the real arm re-encodes PNG at exactly the target resolution
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).payload))
    assert(back.getWidth == 8 && back.getHeight == 6)
    // white source columns stay white after bilinear resampling
    assert((back.getRGB(0, 0) & 0xffffff) == 0xffffff)
    // stub: w*h*3 plane, payload bytes cycled, pure function of input
    assert(out(2).payload.length == 8 * 6 * 3)
    assert(out(2).payload(0) == 'o'.toByte &&
      out(2).payload(14) == 'o'.toByte) // cycle wraps at payload length
    val again = Multimodal.resize(
      Seq(Asset(3L, "text", "text/plain", "opaque payload".getBytes("UTF-8"))).toDS(),
      8, 6).head()
    assert(java.util.Arrays.equals(again.payload, out(2).payload))
  }

  test("resize: corrupt raster payloads degrade to the stub, observable via decoder") {
    import spark.implicits._
    val corrupt = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "not a jpeg body".getBytes("UTF-8")
    val r = Multimodal.resize(
      Seq(Asset(7L, "image", "image/jpeg", corrupt)).toDS(), 4, 4).head()
    assert(r.decoder == "stub")
    assert(r.payload.length == 4 * 4 * 3)
  }

  test("frame sampling slices payloads with builtin expressions") {
    import spark.implicits._
    val df = Seq((1L, Array.range(0, 100).map(_.toByte))).toDF("id", "payload")
    val out = Multimodal.sampleFrames(df, "payload", frameBytes = 10, stride = 2)
      .select(col("frames")).collect().head.getSeq[Array[Byte]](0)
    assert(out.length == 5) // frames 0,2,4,6,8 of 10
    assert(out.forall(_.length == 10))
    assert(out(1)(0) == 20.toByte) // frame 2 starts at byte 20
  }
}
