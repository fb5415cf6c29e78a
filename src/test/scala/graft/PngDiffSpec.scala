package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.PngDecode

/** Differential test of [[PngDecode]] (and the BMP arm) against an INDEPENDENT encoder: the
  * JDK's own PNG writer (javax.imageio) — real zlib streams and
  * encoder-chosen row filters, none of it shared with the hand-crafted
  * `pngOf` fixtures in MediaPipelineSpec. The reference plane is the pixel
  * array we wrote into the BufferedImage (not ImageIO's reader, whose gray
  * paths gamma-convert), so agreement means the inflate + filter
  * reconstruction matches a real encoder's output exactly. The round-9
  * VP8L lesson ([[Vp8lDecode]]): symmetric round-trip tests cannot catch a
  * convention shared between a test encoder and the decoder.
  */
class PngDiffSpec extends AnyFunSuite {

  private def pngBytes(bi: java.awt.image.BufferedImage): Array[Byte] =
    PngTestBytes.jdkPng(bi)

  private def rec601(r: Int, g: Int, b: Int): Byte =
    PngTestBytes.rec601(r, g, b).toByte

  test("RGB and ARGB images: PngDecode matches the source pixels through the JDK encoder") {
    val rnd = new scala.util.Random(61)
    for (trial <- 0 until 12;
        imgType <- Seq(java.awt.image.BufferedImage.TYPE_INT_RGB,
          java.awt.image.BufferedImage.TYPE_INT_ARGB)) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val bi = new java.awt.image.BufferedImage(w, h, imgType)
      val hasAlpha = imgType == java.awt.image.BufferedImage.TYPE_INT_ARGB
      val want = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val r = rnd.nextInt(256); val g = rnd.nextInt(256); val b = rnd.nextInt(256)
        // random alpha on the ARGB trials pins the ignore-alpha convention
        // (alpha=255 would let a premultiply/composite regression pass)
        val a = if (hasAlpha) rnd.nextInt(256) else 0xff
        bi.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
        want(y * w + x) = rec601(r, g, b)
      }
      val got = PngDecode.pngLumaOrNull(pngBytes(bi))
      assert(got != null, s"trial $trial type=$imgType ${w}x$h: rejected")
      assert(got.toSeq == want.toSeq, s"trial $trial type=$imgType ${w}x$h")
    }
  }

  test("8-bit gray images: gray samples pass through untouched") {
    val rnd = new scala.util.Random(67)
    for (trial <- 0 until 12) {
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(60)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = bi.getRaster
      val want = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = rnd.nextInt(256)
        raster.setSample(x, y, 0, v) // raw sample write — no colorspace conversion
        want(y * w + x) = v.toByte
      }
      val got = PngDecode.pngLumaOrNull(pngBytes(bi))
      assert(got != null, s"trial $trial ${w}x$h: rejected")
      assert(got.toSeq == want.toSeq, s"trial $trial ${w}x$h")
    }
  }

  test("16-bit gray images: high byte kept, network order") {
    val rnd = new scala.util.Random(71)
    for (trial <- 0 until 6) {
      val w = 1 + rnd.nextInt(30)
      val h = 1 + rnd.nextInt(30)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
      val raster = bi.getRaster
      val want = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = rnd.nextInt(65536)
        raster.setSample(x, y, 0, v)
        want(y * w + x) = (v >> 8).toByte
      }
      val got = PngDecode.pngLumaOrNull(pngBytes(bi))
      assert(got != null, s"trial $trial ${w}x$h: rejected")
      assert(got.toSeq == want.toSeq, s"trial $trial ${w}x$h")
    }
  }

  test("palette images (TYPE_BYTE_INDEXED, depth 8): PLTE lookup matches stored colors") {
    // The JDK writer emits a real color-type-3 PNG (PLTE + index plane) for
    // indexed images. The reference plane is getRGB AFTER the write — the
    // palette color actually stored for each pixel — so agreement means the
    // PLTE parse + index lookup match the encoder's own mapping.
    val rnd = new scala.util.Random(79)
    for (trial <- 0 until 8) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      val want = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        bi.setRGB(x, y, 0xff000000 | rnd.nextInt(1 << 24))
        val stored = bi.getRGB(x, y) // nearest palette color, post-quantization
        want(y * w + x) =
          rec601((stored >> 16) & 0xff, (stored >> 8) & 0xff, stored & 0xff)
      }
      val got = PngDecode.pngLumaOrNull(pngBytes(bi))
      assert(got != null, s"trial $trial ${w}x$h: rejected")
      assert(got.toSeq == want.toSeq, s"trial $trial ${w}x$h")
    }
  }

  test("sub-byte palette images (depths 1/2/4): MSB-first unpacking and row pad bits") {
    // TYPE_BYTE_BINARY with an n-color IndexColorModel makes the JDK writer
    // emit 1/2/4-bit palette PNGs — packed indices, trailing pad bits in
    // every row whose width doesn't fill the last byte. Odd widths are
    // deliberate: they exercise the pad-bit handling.
    val rnd = new scala.util.Random(83)
    for (bits <- Seq(1, 2, 4); trial <- 0 until 6) {
      val n = 1 << bits
      val rs = Array.fill(n)(rnd.nextInt(256).toByte)
      val gs = Array.fill(n)(rnd.nextInt(256).toByte)
      val bs = Array.fill(n)(rnd.nextInt(256).toByte)
      val icm = new java.awt.image.IndexColorModel(bits, n, rs, gs, bs)
      val w = 1 + rnd.nextInt(41)
      val h = 1 + rnd.nextInt(30)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
      val raster = bi.getRaster
      val want = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val idx = rnd.nextInt(n)
        raster.setSample(x, y, 0, idx) // raw index write — no quantization
        want(y * w + x) = rec601(rs(idx) & 0xff, gs(idx) & 0xff, bs(idx) & 0xff)
      }
      val got = PngDecode.pngLumaOrNull(pngBytes(bi))
      assert(got != null, s"bits=$bits trial $trial ${w}x$h: rejected")
      assert(got.toSeq == want.toSeq, s"bits=$bits trial $trial ${w}x$h")
    }
  }

  test("BMP arm: PpmDecode.bmpLumaOrNull matches source pixels through the JDK BMP writer") {
    // Same independent-encoder idea for the 24bpp BMP parser (incl. its
    // 4-byte row padding and bottom-up row order assumptions).
    val rnd = new scala.util.Random(73)
    for (trial <- 0 until 8) {
      val w = 1 + rnd.nextInt(40) // odd widths exercise the row padding
      val h = 1 + rnd.nextInt(40)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val want = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val r = rnd.nextInt(256); val g = rnd.nextInt(256); val b = rnd.nextInt(256)
        bi.setRGB(x, y, 0xff000000 | (r << 16) | (g << 8) | b)
        want(y * w + x) = rec601(r, g, b)
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "bmp", baos), "JDK BMP writer refused")
      val got = graft.multimodal.PpmDecode.bmpLumaOrNull(baos.toByteArray)
      assert(got != null, s"trial $trial ${w}x$h: rejected")
      assert(got.toSeq == want.toSeq, s"trial $trial ${w}x$h")
    }
  }

  test("smooth gradients push the JDK encoder into non-trivial row filters") {
    // Random noise compresses best with filter None; gradients make the
    // adaptive chooser emit Sub/Up/Average/Paeth rows — the reconstruction
    // paths a real crawl thumbnail actually exercises.
    for ((w, h) <- Seq((64, 64), (97, 31), (128, 5))) {
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val want = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 255) / math.max(w - 1, 1)
        val g = (y * 255) / math.max(h - 1, 1)
        val b = ((x + y) * 255) / math.max(w + h - 2, 1)
        bi.setRGB(x, y, 0xff000000 | (r << 16) | (g << 8) | b)
        want(y * w + x) = rec601(r, g, b)
      }
      val got = PngDecode.pngLumaOrNull(pngBytes(bi))
      assert(got != null, s"${w}x$h: rejected")
      assert(got.toSeq == want.toSeq, s"${w}x$h")
    }
  }
}
