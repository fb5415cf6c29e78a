package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{ImageIoDecode, MediaPipeline}

/** The JDK-codec decode arm (JPEG / GIF / TIFF via javax.imageio): golden
  * roundtrips per format, the gamma trap (gray rasters read through
  * getRGB's linear→sRGB conversion) pinned shut, magic-gate rejection, and
  * the CodecLuma expression + lumaOrRaw ladder in-plan.
  */
class ImageIoDecodeSpec extends AnyFunSuite with SparkSpec {

  private def gradPlane(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => (8 * (i / w) + 4 * (i % w)).toByte)

  private def encVia(format: String, luma: Array[Byte], w: Int): Array[Byte] = {
    val h = luma.length / w
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, luma)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("JPEG roundtrip: smooth gradient decodes within 1 level — the gamma trap stays shut") {
    // A linear-gray read through getRGB would drift mid-gray by ~60 levels
    // (measured); the raster read must reproduce the ramp almost exactly.
    val src = gradPlane(16, 16)
    val jpeg = ImageIoDecode.encodeGrayJpeg(src, width = 16, quality = 0.95f)
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val dec = ImageIoDecode.lumaOrNull(jpeg)
    assert(dec != null && dec.length == src.length)
    val maxErr = src.indices.map(i => math.abs((src(i) & 0xff) - (dec(i) & 0xff))).max
    assert(maxErr <= 1, s"JPEG roundtrip maxErr=$maxErr")
  }

  test("encodeGrayJpeg is deterministic (fixed quality, pure function of the plane)") {
    val src = gradPlane(8, 32)
    val a = ImageIoDecode.encodeGrayJpeg(src, width = 8)
    val b = ImageIoDecode.encodeGrayJpeg(src, width = 8)
    assert(a.toSeq == b.toSeq)
  }

  test("GIF and TIFF arms: lossless gray roundtrips decode EXACTLY") {
    val src = gradPlane(8, 16)
    for (fmt <- Seq("gif", "tiff")) {
      val bytes = encVia(fmt, src, 8)
      assert(ImageIoDecode.looksDecodable(bytes), s"$fmt magic not gated in")
      val dec = ImageIoDecode.lumaOrNull(bytes)
      assert(dec != null && dec.toSeq == src.toSeq, s"$fmt roundtrip not exact")
    }
  }

  test("color JPEG goes through the sRGB view with the Rec.601 weighting") {
    val w = 16; val h = 16
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 16) << 16 | (y * 16) << 8 | 0x40)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", out))
    val dec = ImageIoDecode.lumaOrNull(out.toByteArray)
    assert(dec != null && dec.length == w * h)
    // spot-check one interior pixel against the formula on the DECODED rgb
    val rt = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
    val v = rt.getRGB(8, 8)
    val expect = (299 * ((v >>> 16) & 0xff) + 587 * ((v >>> 8) & 0xff) + 114 * (v & 0xff)) / 1000
    assert((dec(8 * w + 8) & 0xff) == expect)
  }

  test("magic gate + total failure modes return null, never throw") {
    assert(ImageIoDecode.lumaOrNull(null) == null)
    assert(ImageIoDecode.lumaOrNull("plain text payload".getBytes("UTF-8")) == null)
    assert(ImageIoDecode.lumaOrNull(Array[Byte](0xff.toByte, 0xd8.toByte)) == null) // too short
    val jpeg = ImageIoDecode.encodeGrayJpeg(gradPlane(8, 8), width = 8)
    assert(ImageIoDecode.lumaOrNull(jpeg.take(jpeg.length / 2)) == null) // truncated entropy data
    val gifMagicText = "GIF87a but actually prose, not an image".getBytes("UTF-8")
    assert(ImageIoDecode.lumaOrNull(gifMagicText) == null)
  }

  test("CodecLuma expression + lumaOrRaw ladder: JPEG decodes in-plan, text falls through raw") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = gradPlane(8, 16)
    val jpeg = ImageIoDecode.encodeGrayJpeg(src, width = 8, quality = 0.95f)
    val text = "not an image".getBytes("UTF-8")
    val got = Seq((1L, jpeg), (2L, text)).toDF("id", "payload")
      .select(col("id"), MediaPipeline.codecLuma(col("payload")).as("luma"),
        MediaPipeline.lumaOrRaw(col("payload")).as("ladder"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[Array[Byte]]("luma")), r.getAs[Array[Byte]]("ladder"))).toMap
    val (jl, jladder) = got(1L)
    assert(jl.isDefined && jl.get.length == src.length)
    assert(jladder.toSeq == jl.get.toSeq) // ladder routes through the codec arm
    val (tl, tladder) = got(2L)
    assert(tl.isEmpty)                    // expression NULL on non-image
    assert(tladder.toSeq == text.toSeq)   // ladder falls through to raw bytes
  }

  test("decodeFeatures routes JPEG through real pixels, not the stub") {
    val src = gradPlane(8, 32)
    val jpeg = ImageIoDecode.encodeGrayJpeg(src, width = 8, quality = 0.95f)
    val feats = MediaPipeline.decodeFeatures(jpeg)
    assert(feats.toSeq != MediaPipeline.decodeStub(jpeg).toSeq)
    // block-0 mean of the DECODED plane (≈ source mean within 1 level)
    val dec = ImageIoDecode.lumaOrNull(jpeg)
    val n0 = dec.length / MediaPipeline.FeatureDim
    val expect = dec.slice(0, n0).map(_ & 0xff).sum.toFloat / n0
    assert(math.abs(feats(0) - expect) < 1e-4)
  }

  test("decode-bomb guard: dimensions past MaxPixels fail the row, not the executor") {
    // A 1×(MaxPixels+1) gray TIFF header would allocate 16 MiB+ per row;
    // the guard must bail before materializing. Craft via a real encode of
    // modest size, then assert the guard constant is wired (unit-level).
    assert(ImageIoDecode.MaxPixels == (1L << 24))
    val ok = ImageIoDecode.encodeGrayJpeg(gradPlane(8, 8), width = 8)
    assert(ImageIoDecode.lumaOrNull(ok) != null)
  }
}
