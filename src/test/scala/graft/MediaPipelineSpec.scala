package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaPipeline

class MediaPipelineSpec extends AnyFunSuite with SparkSpec {
  private implicit val s: org.apache.spark.sql.SparkSession = spark

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val media = MediaPipeline.fromDocuments(docs)

  test("fromDocuments carries binary payload + typed metadata") {
    val r = media.head()
    assert(r.payload.nonEmpty)
    assert(r.meta.mime.startsWith("text/plain;lang="))
    assert(r.meta.nBytes == r.payload.length.toLong)
  }

  test("decode stub is deterministic and fixed-dimension") {
    val p = "hello".getBytes("UTF-8")
    val f1 = MediaPipeline.decodeStub(p)
    val f2 = MediaPipeline.decodeStub(p)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == MediaPipeline.FeatureDim)
    assert(MediaPipeline.decodeStub(Array.emptyByteArray).length == MediaPipeline.FeatureDim)
  }

  test("extractFeatures emits (id, features[dim]) for every record") {
    val feats = MediaPipeline.extractFeatures(media)
    assert(feats.count() == docs.count())
    val row = feats.head()
    assert(row.getAs[scala.collection.Seq[Float]]("features").length == MediaPipeline.FeatureDim)
  }

  test("repartitionByBytes sizes partitions from a byte budget") {
    val ds = MediaPipeline.repartitionByBytes(media, totalBytes = 100000L, bytesPerPartition = 10000L)
    assert(ds.rdd.getNumPartitions == 10)
  }

  test("frames pipeline is byte-addressed on multi-byte text (may split codepoints)") {
    import spark.implicits._
    // 'é'/'ö' are 2 UTF-8 bytes each: 26 chars → 32 bytes → 3 full 10-byte
    // frames, and frame boundaries fall INSIDE codepoints — opaque-bytes
    // semantics.
    val text = "héllö wörld héllö wörld éö!"
    val bytes = text.getBytes("UTF-8")
    assert(bytes.length > 30 && bytes.length > text.length)
    val docs = Seq((1L, text, "fr", "test", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = MediaPipeline
      .sampleFrames(MediaPipeline.fromDocuments(docs), frameBytes = 10, everyK = 1)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    frames.foreach { r =>
      val idx = r.getInt(1)
      assert(r.getAs[Array[Byte]]("frame").toSeq == bytes.slice(idx * 10, idx * 10 + 10).toSeq)
    }
  }

  test("audioStats folds int16 LE samples exactly: energy, peak, crossings, odd tail") {
    import spark.implicits._
    // Samples: +1, -1, +256, -32768 (le bytes below), trailing odd byte dropped.
    val payload = Array[Byte](
      0x01, 0x00,              // +1
      0xff.toByte, 0xff.toByte, // -1
      0x00, 0x01,              // +256
      0x00, 0x80.toByte,       // -32768
      0x2a)                    // odd tail — dropped
    val one = Seq(MediaPipeline.MediaRecord(7L, payload,
      MediaPipeline.MediaMeta("audio/fake", 7L, payload.length.toLong))).toDS()
    val r = MediaPipeline.audioStats(one).head()
    assert(r.getAs[Long]("n_samples") == 4L)
    assert(r.getAs[Long]("sum_sq") == 1L + 1L + 256L * 256L + 32768L * 32768L)
    assert(r.getAs[Long]("peak_abs") == 32768L)
    // sign sequence +,-,+,- → 3 crossings
    assert(r.getAs[Long]("zero_cross") == 3L)
  }

  test("audioStats plan has no shuffle: stats stay in the decode partition") {
    val stats = MediaPipeline.audioStats(media)
    assert(!stats.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("PpmDecode: well-formed P6 (with header comments) decodes to the exact integer luma plane") {
    // 2×2 image, known pixels; comment between fields exercises the header
    // grammar beyond the minimal form the queries craft.
    val header = "P6\n# a comment\n2 2\n# another\n255\n".getBytes("UTF-8")
    val rgb = Array[Int](
      255, 0, 0,   0, 255, 0,  // red, green
      0, 0, 255,   10, 20, 30  // blue, dark
    ).map(_.toByte)
    val luma = graft.multimodal.PpmDecode.lumaOrNull(header ++ rgb)
    assert(luma != null)
    // (299R + 587G + 114B) / 1000, truncating
    assert(luma.map(_ & 0xff).toSeq == Seq(
      299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000,
      (299 * 10 + 587 * 20 + 114 * 30) / 1000))
  }

  test("PpmDecode rejects malformed payloads: wrong magic, short data, long data, bad maxval, zero dims") {
    import graft.multimodal.PpmDecode.lumaOrNull
    val good = "P6\n2 1\n255\n".getBytes("UTF-8") ++ Array.fill[Byte](6)(7)
    assert(lumaOrNull(good) != null)
    assert(lumaOrNull("P5\n2 1\n255\n".getBytes("UTF-8") ++ Array.fill[Byte](6)(7)) == null)
    assert(lumaOrNull(good.dropRight(1)) == null)           // truncated raster
    assert(lumaOrNull(good :+ 0.toByte) == null)            // trailing junk
    assert(lumaOrNull("P6\n2 1\n65535\n".getBytes("UTF-8") ++ Array.fill[Byte](6)(7)) == null)
    assert(lumaOrNull("P6\n0 1\n255\n".getBytes("UTF-8")) == null)
    assert(lumaOrNull("P6#no ws before comment\n2 1\n255\n".getBytes("UTF-8") ++ Array.fill[Byte](6)(7)) == null)
    assert(lumaOrNull(Array.emptyByteArray) == null)
    assert(lumaOrNull("P6\n2 1\n255".getBytes("UTF-8")) == null) // header ends at maxval
  }

  // little-endian byte builders + the 54-byte BMP header, shared by the
  // BMP tests (2×2 image: fileSize = 54 + 16 raster bytes + extra junk)
  private def leU32(v: Long) = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def leU16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def bmpHeader2x2(bpp: Int, comp: Long, extra: Int) =
    Array[Byte]('B', 'M') ++ leU32(54 + 16 + extra) ++ leU32(0) ++ leU32(54) ++
    leU32(40) ++ leU32(2) ++ leU32(2) ++ leU16(1) ++ leU16(bpp) ++
    leU32(comp) ++ leU32(16) ++ leU32(0) ++ leU32(0) ++ leU32(0) ++ leU32(0)

  test("BmpDecode: bottom-up 24bpp BMP decodes to the same top-down luma plane as the equivalent PPM") {
    // The PPM test image (2×2: red, green / blue, dark), as a bottom-up BMP:
    // rows stored last-first in BGR with 2 pad bytes (rowBytes 8).
    val header = bmpHeader2x2(24, 0, 0)
    val bgrBottomUp = Array[Byte](
      // bottom row first: blue(0,0,255)→BGR(255,0,0), dark(10,20,30)→BGR(30,20,10)
      255.toByte, 0, 0,  30, 20, 10,  0, 0, // + 2 pad
      // top row: red(255,0,0)→BGR(0,0,255), green(0,255,0)→BGR(0,255,0)
      0, 0, 255.toByte,  0, 255.toByte, 0,  0, 0)
    val bmp = header ++ bgrBottomUp
    assert(header.length == 54)
    val ppm = "P6\n2 2\n255\n".getBytes("UTF-8") ++ Array[Int](
      255, 0, 0,  0, 255, 0,  0, 0, 255,  10, 20, 30).map(_.toByte)
    val viaBmp = graft.multimodal.PpmDecode.lumaOrNull(bmp)
    val viaPpm = graft.multimodal.PpmDecode.lumaOrNull(ppm)
    assert(viaBmp != null && viaPpm != null)
    assert(viaBmp.toSeq == viaPpm.toSeq) // format-invisible: same plane
  }

  test("BmpDecode rejects unsupported BMPs: wrong bpp, compressed, size mismatch, tiny header") {
    import graft.multimodal.PpmDecode.bmpLumaOrNull
    def bmp(bpp: Int, comp: Long, extra: Int) =
      bmpHeader2x2(bpp, comp, extra) ++ Array.fill[Byte](16 + extra)(7)
    assert(bmpLumaOrNull(bmp(24, 0, 0)) != null)     // control: valid
    assert(bmpLumaOrNull(bmp(32, 0, 0)) == null)     // 32bpp unsupported
    assert(bmpLumaOrNull(bmp(24, 1, 0)) == null)     // BI_RLE8 compressed
    assert(bmpLumaOrNull(bmp(24, 0, 3)) == null)     // trailing bytes
    assert(bmpLumaOrNull("BM tiny".getBytes("UTF-8")) == null)
  }

  test("lumaOrRaw: parsing payloads hash their decoded pixels, non-parsing fall back to opaque bytes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ppm = "P6\n2 1\n255\n".getBytes("UTF-8") ++ Array[Byte](1, 2, 3, 40, 50, 60)
    val notPpm = "just some opaque bytes, long enough to hash".getBytes("UTF-8")
    val df = Seq((1L, ppm), (2L, notPpm)).toDF("id", "payload")
      .select(col("id"),
        MediaPipeline.phash(MediaPipeline.lumaOrRaw(col("payload"))).as("h"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def refPhash(bytes: Array[Byte]): Long = {
      val df2 = Seq((0L, bytes)).toDF("id", "b")
        .select(MediaPipeline.phash(col("b"))).head()
      df2.getLong(0)
    }
    val expectedLuma = graft.multimodal.PpmDecode.lumaOrNull(ppm)
    assert(expectedLuma != null)
    assert(got(1L) == refPhash(expectedLuma)) // decoded arm
    assert(got(2L) == refPhash(notPpm))       // fallback arm
  }

  // ---- PNG golden tests: fully-valid files (Deflater zlib wrapper with
  // correct Adler-32, per-chunk CRC32), encoded filter-by-filter by
  // inverting the reconstruction — so the decoder's Inflater + unfilter
  // path is proven against independently-built bytes.
  private def pngChunk(tpe: String, data: Array[Byte]): Array[Byte] =
    PngTestBytes.chunk(tpe, data)

  private def zlibDeflate(raw: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    out.toByteArray
  }

  private val pngSig = PngTestBytes.sig

  /** Encode one filtered scanline block: `rows` rows of `strideB` bytes from
    * `src`, filter byte `ft(row)` per row, predictor unit `bpp` BYTES.
    */
  private def filterRows(src: Array[Byte], rows: Int, strideB: Int, bpp: Int,
      ft: Int => Int, out: java.io.ByteArrayOutputStream): Unit =
    for (row <- 0 until rows) {
      val f = ft(row)
      out.write(f)
      for (x <- 0 until strideB) {
        val cur = src(row * strideB + x) & 0xff
        val a = if (x >= bpp) src(row * strideB + x - bpp) & 0xff else 0
        val b = if (row > 0) src((row - 1) * strideB + x) & 0xff else 0
        val c = if (row > 0 && x >= bpp) src((row - 1) * strideB + x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out.write((cur - pred) & 0xff)
      }
    }

  private def pngWrap(w: Int, h: Int, channels: Int, depth: Int, interlace: Int,
      raw: Array[Byte], splitIdat: Boolean): Array[Byte] = {
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    val z = zlibDeflate(raw)
    val idats =
      if (splitIdat && z.length > 3)
        pngChunk("IDAT", z.take(3)) ++ pngChunk("IDAT", z.drop(3))
      else pngChunk("IDAT", z)
    pngSig ++ pngChunk("IHDR", ihdr) ++ idats ++ pngChunk("IEND", Array.emptyByteArray)
  }

  /** Valid PNG of `pix` (row-major samples, `channels` per pixel,
    * `sampleBytes` bytes per sample — 2 for 16-bit), each row filtered with
    * `filters(row % filters.length)`.
    */
  private def pngOf(w: Int, h: Int, channels: Int, pix: Array[Byte],
      filters: Seq[Int], depth: Int = 8, interlace: Int = 0,
      splitIdat: Boolean = false, sampleBytes: Int = 1): Array[Byte] = {
    val bpp = channels * sampleBytes
    val out = new java.io.ByteArrayOutputStream()
    filterRows(pix, h, w * bpp, bpp, row => filters(row % filters.length), out)
    pngWrap(w, h, channels, if (depth != 8) depth else 8 * sampleBytes, interlace,
      out.toByteArray, splitIdat)
  }

  private val adam7 = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Valid Adam7-interlaced PNG of `pix`: per pass, gather the pass pixels,
    * filter every pass row with `ft` against the PASS's own neighbors (the
    * spec's per-pass filtering), concatenate pass streams in order.
    */
  private def pngAdam7(w: Int, h: Int, channels: Int, pix: Array[Byte], ft: Int,
      sampleBytes: Int = 1): Array[Byte] = {
    val bpp = channels * sampleBytes
    val out = new java.io.ByteArrayOutputStream()
    for ((xs, ys, dx, dy) <- adam7) {
      val pw = if (w > xs) (w - xs + dx - 1) / dx else 0
      val ph = if (h > ys) (h - ys + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val sub = new Array[Byte](ph * pw * bpp)
        for (py <- 0 until ph; px <- 0 until pw; ch <- 0 until bpp)
          sub((py * pw + px) * bpp + ch) =
            pix(((ys + py * dy) * w + (xs + px * dx)) * bpp + ch)
        filterRows(sub, ph, pw * bpp, bpp, _ => ft, out)
      }
    }
    pngWrap(w, h, channels, 8 * sampleBytes, 1, out.toByteArray, splitIdat = false)
  }

  private def rec601(r: Int, g: Int, b: Int): Int = PngTestBytes.rec601(r, g, b)

  /** Valid color-type-3 (palette) PNG of `idx` (row-major palette indices),
    * packed `depth` bits per index MSB-first (spec §7.2, rows padded to a
    * byte boundary), each row filtered with `filters(row % n)` (filter unit
    * = 1 byte for packed rows), optionally Adam7-interlaced. `plte` = flat
    * RGB triples. `plteAfterIdat` mis-orders the chunks for reject tests.
    */
  private def pngPalette(w: Int, h: Int, depth: Int, idx: Array[Byte],
      plte: Array[Byte], filters: Seq[Int], interlace: Int = 0,
      plteAfterIdat: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val passes = if (interlace == 1) adam7 else Seq((0, 0, 1, 1))
    for ((xs, ys, dx, dy) <- passes) {
      val pw = if (w > xs) (w - xs + dx - 1) / dx else 0
      val ph = if (h > ys) (h - ys + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val stride = (pw * depth + 7) / 8
        val packed = new Array[Byte](ph * stride)
        for (py <- 0 until ph; px <- 0 until pw) {
          val v = idx((ys + py * dy) * w + (xs + px * dx)) & ((1 << depth) - 1)
          val bit = px * depth
          packed(py * stride + (bit >> 3)) = (packed(py * stride + (bit >> 3)) |
            (v << (8 - depth - (bit & 7)))).toByte
        }
        filterRows(packed, ph, stride, 1, row => filters(row % filters.length), out)
      }
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    val plteChunk = pngChunk("PLTE", plte)
    val idatChunk = pngChunk("IDAT", zlibDeflate(out.toByteArray))
    val mid = if (plteAfterIdat) idatChunk ++ plteChunk else plteChunk ++ idatChunk
    pngSig ++ pngChunk("IHDR", ihdr) ++ mid ++ pngChunk("IEND", Array.emptyByteArray)
  }

  test("PngDecode: grayscale with every filter type reconstructs the exact plane") {
    // 4×5 deterministic pseudo-random grayscale; rows cycle through all five
    // filters, so Sub/Up/Average/Paeth reconstruction is each exercised.
    val pix = Array.tabulate(20)(i => (((i * 97 + 13) ^ (i << 3)) & 0xff).toByte)
    val png = pngOf(4, 5, 1, pix, filters = Seq(0, 1, 2, 3, 4))
    val luma = graft.multimodal.PngDecode.pngLumaOrNull(png)
    assert(luma != null)
    assert(luma.toSeq == pix.toSeq) // gray: luma = samples
  }

  test("PngDecode: RGB with Paeth filters matches the PPM of the same pixels (format-invisible)") {
    val rgb = Array[Int](
      255, 0, 0,   0, 255, 0,
      0, 0, 255,   10, 20, 30).map(_.toByte)
    val png = pngOf(2, 2, 3, rgb, filters = Seq(4))
    val ppm = "P6\n2 2\n255\n".getBytes("UTF-8") ++ rgb
    val viaPng = graft.multimodal.PngDecode.pngLumaOrNull(png)
    val viaPpm = graft.multimodal.PpmDecode.lumaOrNull(ppm)
    assert(viaPng != null && viaPpm != null)
    assert(viaPng.toSeq == viaPpm.toSeq)
  }

  test("PngDecode: RGBA and gray+alpha ignore the alpha channel; split IDAT concatenates") {
    val rgba = Array[Int](100, 150, 200, 255,  7, 9, 11, 0).map(_.toByte)
    val viaRgba = graft.multimodal.PngDecode.pngLumaOrNull(
      pngOf(2, 1, 4, rgba, filters = Seq(1), splitIdat = true))
    assert(viaRgba != null)
    assert(viaRgba.map(_ & 0xff).toSeq ==
      Seq(rec601(100, 150, 200), rec601(7, 9, 11)))
    val ga = Array[Int](42, 255, 77, 0).map(_.toByte)
    val viaGa = graft.multimodal.PngDecode.pngLumaOrNull(
      pngOf(2, 1, 2, ga, filters = Seq(2)))
    assert(viaGa != null)
    assert(viaGa.map(_ & 0xff).toSeq == Seq(42, 77))
  }

  test("PngDecode rejects out-of-subset payloads: interlaced, 16-bit, truncated, palette, junk") {
    import graft.multimodal.PngDecode.pngLumaOrNull
    val pix = Array.tabulate(8)(_.toByte)
    val good = pngOf(4, 2, 1, pix, filters = Seq(0))
    assert(pngLumaOrNull(good) != null) // control
    // header/stream mismatches: an Adam7 (resp. 16-bit) IHDR over a plain
    // 8-bit non-interlaced stream inflates short of the declared layout
    assert(pngLumaOrNull(pngOf(4, 2, 1, pix, Seq(0), interlace = 1)) == null)
    assert(pngLumaOrNull(pngOf(4, 2, 1, pix, Seq(0), depth = 16)) == null)
    assert(pngLumaOrNull(good.dropRight(20)) == null) // truncated inside IDAT
    // crafted 0xFFFFFFFF × 0xFFFFFFFF header: the axis product wraps Long
    // negative and would sail past a product-only pixel cap, "decoding" to
    // a bogus 1-byte plane — each axis must be bounded BEFORE multiplying
    val hugeIhdr = java.nio.ByteBuffer.allocate(13)
      .putInt(-1).putInt(-1).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val huge = pngSig ++ pngChunk("IHDR", hugeIhdr) ++
      pngChunk("IDAT", zlibDeflate(Array.emptyByteArray)) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(pngLumaOrNull(huge) == null)
    assert(pngLumaOrNull("not a png at all, truly".getBytes("UTF-8")) == null)
    // palette color type WITHOUT a PLTE chunk: patch IHDR's colorType byte
    // (sig 8 + len 4 + type 4 + 9). The stream layout matches (1 index byte
    // = 1 gray byte) so the reject is the missing-PLTE gate, not a length
    // mismatch — palette PNGs themselves decode since round 11.
    val pal = good.clone(); pal(8 + 4 + 4 + 9) = 3
    assert(pngLumaOrNull(pal) == null)
  }

  test("PngDecode palette: PLTE lookup, sub-byte packing, Adam7, and strict rejects") {
    import graft.multimodal.PngDecode.pngLumaOrNull
    // 17-entry palette (non-multiple-of-4 size, ≠ a full 2^depth table)
    val plte = Array.tabulate(17 * 3) { i =>
      (i % 3 match { case 0 => 40 + i; case 1 => 200 - i; case _ => 3 * i }).toByte
    }
    def lumaOf(i: Int) =
      rec601(plte(3 * i) & 0xff, plte(3 * i + 1) & 0xff, plte(3 * i + 2) & 0xff).toByte
    // depth 8, every filter type exercised on packed index rows
    val idx8 = Array.tabulate(5 * 5)(k => (k % 17).toByte)
    val via8 = pngLumaOrNull(pngPalette(5, 5, 8, idx8, plte, Seq(0, 1, 2, 3, 4)))
    assert(via8 != null)
    assert(via8.toSeq == idx8.map(i => lumaOf(i & 0xff)).toSeq)
    // depth 4 with an odd width: every row carries pad bits
    val idx4 = Array.tabulate(7 * 4)(k => (k % 16).toByte)
    val via4 = pngLumaOrNull(pngPalette(7, 4, 4, idx4, plte, Seq(0, 1, 2)))
    assert(via4 != null)
    assert(via4.toSeq == idx4.map(i => lumaOf(i & 0xff)).toSeq)
    // depth 2 Adam7: interlacing and packing compose; matches the plain plane
    val idx2 = Array.tabulate(9 * 10)(k => (k % 4).toByte)
    val plain2 = pngLumaOrNull(pngPalette(9, 10, 2, idx2, plte, Seq(0)))
    val inter2 = pngLumaOrNull(pngPalette(9, 10, 2, idx2, plte, Seq(1, 2), interlace = 1))
    assert(plain2 != null && inter2 != null)
    assert(inter2.toSeq == plain2.toSeq)
    assert(plain2.toSeq == idx2.map(i => lumaOf(i & 0xff)).toSeq)
    // strict rejects: out-of-range index (17 with a 17-entry palette),
    // PLTE after IDAT, non-triple PLTE length, oversize PLTE, 16-bit depth
    val bad = idx8.clone(); bad(7) = 17
    assert(pngLumaOrNull(pngPalette(5, 5, 8, bad, plte, Seq(0))) == null)
    assert(pngLumaOrNull(
      pngPalette(5, 5, 8, idx8, plte, Seq(0), plteAfterIdat = true)) == null)
    assert(pngLumaOrNull(pngPalette(5, 5, 8, idx8, plte.dropRight(1), Seq(0))) == null)
    assert(pngLumaOrNull(
      pngPalette(5, 5, 8, idx8, new Array[Byte](257 * 3), Seq(0))) == null)
    val d16 = pngPalette(5, 5, 8, idx8, plte, Seq(0))
    d16(8 + 4 + 4 + 8) = 16 // IHDR depth byte
    assert(pngLumaOrNull(d16) == null)
  }

  test("PngDecode: Adam7 interlaced planes reconstruct exactly — format and interlacing invisible") {
    // 8×9 exercises all seven passes with ragged pass heights; Paeth per
    // pass row exercises the per-pass neighbor rule (a/b/c reset at pass
    // boundaries — a decoder unfiltering against the full image would
    // corrupt every pass after the first).
    val pix = Array.tabulate(72)(i => ((i * 37 + 11) & 0xff).toByte)
    val viaAdam7 = graft.multimodal.PngDecode.pngLumaOrNull(pngAdam7(8, 9, 1, pix, ft = 4))
    assert(viaAdam7 != null && viaAdam7.toSeq == pix.toSeq)
    // identical plane through the non-interlaced spelling
    val plain = graft.multimodal.PngDecode.pngLumaOrNull(pngOf(8, 9, 1, pix, Seq(0, 1, 2, 3, 4)))
    assert(viaAdam7.toSeq == plain.toSeq)
    // RGB Adam7 with an edge-size image (1×1: only pass 1 non-empty)
    val one = Array[Byte](100.toByte, 50.toByte, 200.toByte)
    val lum1 = graft.multimodal.PngDecode.pngLumaOrNull(pngAdam7(1, 1, 3, one, ft = 0))
    assert(lum1 != null && (lum1(0) & 0xff) == rec601(100, 50, 200))
  }

  test("PngDecode: 16-bit samples reduce to the high byte (gray with Sub filter, RGB)") {
    // gray 16-bit, Sub-filtered: bpp=2, so the predictor offset is the
    // previous SAMPLE's byte pair — a bpp=1 decoder would mis-reconstruct
    val hi = Array.tabulate(12)(i => ((i * 17 + 3) & 0xff).toByte)
    val pix16 = hi.flatMap(b => Array(b, 0xAB.toByte)) // (hi, lo) big-endian
    val luma = graft.multimodal.PngDecode.pngLumaOrNull(
      pngOf(4, 3, 1, pix16, Seq(1), sampleBytes = 2))
    assert(luma != null && luma.toSeq == hi.toSeq)
    // RGB 16-bit: luminance from the three high bytes
    val rgb16 = Array(
      30, 0xFF, 60, 0x01, 90, 0x80, // pixel 0: r=30 g=60 b=90
      200, 0x00, 10, 0x10, 250, 0x7F // pixel 1
    ).map(_.toByte)
    val luma2 = graft.multimodal.PngDecode.pngLumaOrNull(
      pngOf(2, 1, 3, rgb16, Seq(0), sampleBytes = 2))
    assert(luma2 != null)
    assert((luma2(0) & 0xff) == rec601(30, 60, 90))
    assert((luma2(1) & 0xff) == rec601(200, 10, 250))
    // 16-bit Adam7 compose: both extensions at once
    val pixA = Array.tabulate(10)(i => ((i * 29 + 7) & 0xff).toByte)
    val pixA16 = pixA.flatMap(b => Array(b, 0x55.toByte))
    val lumA = graft.multimodal.PngDecode.pngLumaOrNull(
      pngAdam7(5, 2, 1, pixA16, ft = 2, sampleBytes = 2))
    assert(lumA != null && lumA.toSeq == pixA.toSeq)
  }

  test("lumaOrRaw routes PNG through the real decode arm (phash of pixels, not bytes)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pix = Array.tabulate(40)(i => ((i * 31) & 0xff).toByte)
    val png = pngOf(4, 10, 1, pix, filters = Seq(0, 1, 2, 3, 4))
    val df = Seq((1L, png)).toDF("id", "payload")
      .select(MediaPipeline.phash(MediaPipeline.lumaOrRaw(col("payload"))).as("h"))
    val viaPlane = Seq((1L, pix)).toDF("id", "b")
      .select(MediaPipeline.phash(col("b"))).head().getLong(0)
    assert(df.head().getLong(0) == viaPlane)
    // and real-pixel features: block means of the plane, not byte stats
    val feats = MediaPipeline.decodeFeatures(png)
    assert(feats.toSeq != MediaPipeline.decodeStub(png).toSeq)
    assert(feats(0) == pix.slice(0, 5).map(_ & 0xff).sum / 5.0f)
  }

  test("decodeArm provenance: 'exact' for PPM/PNG/VP8L, 'imageio' for JPEG, 'stub' for lossy WebP and plain text") {
    // The arm label must be the REAL decode outcome: LOSSLESS WebP (VP8L,
    // hand-decoded since round 9) reads 'exact'; LOSSY WebP (VP8 — the
    // remaining no-JVM-codec boundary) and a non-image payload both read
    // 'stub' — the provenance q_multimodal_features carries so stub
    // features are never mistaken for pixels downstream.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ppm = "P6\n2 1\n255\n".getBytes("UTF-8") ++ Array[Byte](1, 2, 3, 40, 50, 60)
    val png = pngOf(2, 2, 1, Array[Byte](1, 2, 3, 4), filters = Seq(0, 0))
    val jpeg = graft.multimodal.ImageIoDecode.encodeGrayJpeg(
      Array.tabulate(64)(i => (i * 4).toByte), width = 8)
    val webpLossy = "RIFF".getBytes("UTF-8") ++ leU32(20) ++
      "WEBPVP8 ".getBytes("UTF-8") ++ Array.fill[Byte](12)(0)
    val webpLossless = Vp8lTestEncoder.encode(
      Array(0xff102030, 0xff405060, 0xff708090, 0xffa0b0c0), 2, 2, Vp8lTestEncoder.Cfg())
    val text = "plain utf8 text payload".getBytes("UTF-8")
    val truncatedPng = png.take(png.length / 2)
    val got = Seq((1L, ppm), (2L, png), (3L, jpeg), (4L, webpLossy), (5L, text),
        (6L, truncatedPng), (7L, webpLossless))
      .toDF("id", "payload")
      .select(col("id"), MediaPipeline.decodeArm(col("payload")).as("arm"))
      .orderBy(col("id")).as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "exact"), (2L, "exact"), (3L, "imageio"),
      (4L, "stub"), (5L, "stub"), (6L, "stub"), (7L, "exact")), got.toString)
  }

  test("decoded struct: arm and luma extract from ONE probe and match the per-helper routing") {
    // Round 11: decodeArm and lumaOrRaw are field extractions of the fused
    // DecodeProbe struct, so a plan reading both runs the decode chain
    // once. Pin (a) the pair is consistent per payload — arm 'exact'/'
    // imageio' comes with decoded pixels, 'stub' with the raw bytes — and
    // (b) both extractions appear as the SAME unconditional probe in the
    // projection (two semantically-equal occurrences, CSE-able), never a
    // when/coalesce re-spelling that could drift.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ppm = "P6\n2 1\n255\n".getBytes("UTF-8") ++ Array[Byte](1, 2, 3, 40, 50, 60)
    val png = pngOf(2, 2, 1, Array[Byte](1, 2, 3, 4), filters = Seq(0, 0))
    val jpeg = graft.multimodal.ImageIoDecode.encodeGrayJpeg(
      Array.tabulate(64)(i => (i * 4).toByte), width = 8)
    val text = "plain utf8 text payload".getBytes("UTF-8")
    val df = Seq((1L, ppm), (2L, png), (3L, jpeg), (4L, text))
      .toDF("id", "payload")
      .select(col("id"), col("payload"),
        MediaPipeline.decodeArm(col("payload")).as("arm"),
        MediaPipeline.lumaOrRaw(col("payload")).as("luma"))
    assert("graft_decode_probe".r
      .findAllIn(df.queryExecution.analyzed.toString).size == 2,
      df.queryExecution.analyzed.toString)
    val rows = df.orderBy(col("id")).collect()
    val expect = Map(
      1L -> ("exact", graft.multimodal.PpmDecode.lumaOrNull(ppm).toSeq),
      2L -> ("exact", graft.multimodal.PngDecode.pngLumaOrNull(png).toSeq),
      3L -> ("imageio", graft.multimodal.ImageIoDecode.lumaOrNull(jpeg).toSeq),
      4L -> ("stub", text.toSeq))
    rows.foreach { r =>
      val (arm, luma) = expect(r.getLong(0))
      assert(r.getString(2) == arm, s"id=${r.getLong(0)}")
      assert(r.getAs[Array[Byte]](3).toSeq == luma, s"id=${r.getLong(0)}")
    }
  }

  test("sampleFrames slices every k-th fixed-size frame") {
    val payload = Array.tabulate(100)(_.toByte)
    import spark.implicits._
    val one = Seq(MediaPipeline.MediaRecord(1L, payload,
      MediaPipeline.MediaMeta("video/fake", 1L, 100L))).toDS()
    val frames = MediaPipeline.sampleFrames(one, frameBytes = 10, everyK = 2).collect()
    assert(frames.length == 5) // frames 0,2,4,6,8 of 10
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.head.getAs[Array[Byte]]("frame").toSeq == payload.slice(0, 10).toSeq)
  }
}
