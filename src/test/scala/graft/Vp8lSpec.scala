package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Vp8lDecode

/** Round-trip property tests for the pure-JVM VP8L (lossless WebP) decoder.
  *
  * The environment has no reference codec, so correctness evidence is an
  * INDEPENDENT test-side encoder: it builds real canonical prefix codes
  * from symbol frequencies, emits the container + bitstream per the spec,
  * and exercises each feature the decoder claims — simple and
  * code-length-coded prefix codes (with and without 16/17/18 run coding),
  * color cache, LZ77 (both map-coded and direct distances), and all four
  * transforms. Decoded ARGB must equal the source image EXACTLY.
  */
object Vp8lTestEncoder {

  final class Bw {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
    }
    def bytes: Array[Byte] = if (n > 0) (buf :+ cur.toByte).toArray else buf.toArray
  }

  /** Plain Huffman code lengths from frequencies (no length limiting —
    * asserts the depth bound instead; test alphabets are tiny).
    */
  def huffLengths(freq: Map[Int, Long], maxLen: Int): Map[Int, Int] = {
    val syms = freq.filter(_._2 > 0)
    if (syms.isEmpty) return Map.empty
    if (syms.size == 1) return Map(syms.head._1 -> 1)
    // (weight, tiebreak, members)
    var heap = syms.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((s, f), i) => (f, i.toLong, List(s)) }
      .sortBy(t => (t._1, t._2))
    var next = heap.size.toLong
    val depth = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
    while (heap.size > 1) {
      val a = heap.head
      val b = heap(1)
      heap = heap.drop(2)
      (a._3 ++ b._3).foreach(s => depth(s) += 1)
      val merged = (a._1 + b._1, next, a._3 ++ b._3)
      next += 1
      heap = (heap :+ merged).sortBy(t => (t._1, t._2))
    }
    val out = syms.keys.map(s => s -> depth(s)).toMap
    assert(out.values.max <= maxLen, s"test huffman exceeded depth $maxLen: $out")
    out
  }

  /** Canonical codes (deflate assignment) from lengths. */
  def canonicalCodes(lengths: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val maxLen = if (lengths.isEmpty) 0 else lengths.values.max
    val blCount = new Array[Int](maxLen + 1)
    lengths.values.foreach(l => blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    for (l <- 1 to maxLen) { code = (code + (if (l > 0) blCount(l - 1) else 0)) << 1; nextCode(l) = code }
    lengths.toSeq.sortBy(_._1).map { case (s, l) =>
      val c = nextCode(l); nextCode(l) += 1; s -> (c, l)
    }.toMap
  }

  // Must match the decoder's (spec) order: symbol 16 sits at position 8.
  private val ClOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code: simple form when possible, else the code-length-coded
    * complex form. Returns the per-symbol writer. `zeroRuns` compresses
    * zero gaps with 17/18 and repeats with 16 (exercising those paths).
    */
  def writePrefix(bw: Bw, alphabetSize: Int, freq: Map[Int, Long], zeroRuns: Boolean,
      useMaxSym: Boolean = false): Map[Int, (Int, Int)] = {
    val used = freq.filter(_._2 > 0).keys.toSeq.sorted
    require(used.nonEmpty, "empty alphabet")
    if (used.size <= 2 && used.forall(_ <= 255)) {
      bw.put(1, 1) // simple
      bw.put(used.size - 1, 1)
      if (used.head > 1) { bw.put(1, 1); bw.put(used.head, 8) }
      else { bw.put(0, 1); bw.put(used.head, 1) }
      if (used.size == 2) bw.put(used(1), 8)
      if (used.size == 1) Map(used.head -> (0, 0))
      else Map(used.head -> (0, 1), used(1) -> (1, 1))
    } else {
      bw.put(0, 1) // complex
      val lens = huffLengths(freq, 15)
      val single = used.size == 1
      val lenOf = (s: Int) => if (single) 1 else lens.getOrElse(s, 0)
      // Without the max_symbol shortcut the decoder reads code lengths for
      // the FULL alphabet — transmit all of them (17/18 runs compress the
      // zero tails when zeroRuns is on). With the shortcut, transmit only
      // up to the last nonzero length and declare the op count.
      val full = (0 until alphabetSize).map(lenOf)
      val seq0 = if (useMaxSym) full.take(full.lastIndexWhere(_ > 0) + 1) else full
      // run-code the sequence when asked
      final case class Op(sym: Int, extraBits: Int, extraVal: Int)
      val ops = scala.collection.mutable.ArrayBuffer[Op]()
      var i = 0
      var prevNz = 8
      while (i < seq0.length) {
        val v = seq0(i)
        var run = 1
        while (zeroRuns && i + run < seq0.length && seq0(i + run) == v) run += 1
        if (zeroRuns && v == 0 && run >= 11) {
          val r = math.min(run, 138)
          ops += Op(18, 7, r - 11); i += r
        } else if (zeroRuns && v == 0 && run >= 3) {
          val r = math.min(run, 10)
          ops += Op(17, 3, r - 3); i += r
        } else if (zeroRuns && v != 0 && v == prevNz && run >= 3) {
          val r = math.min(run, 6)
          ops += Op(16, 2, r - 3); i += r
        } else {
          ops += Op(v, 0, 0)
          if (v != 0) prevNz = v
          i += 1
        }
      }
      // code-length code over the op symbols
      val clFreq = ops.groupBy(_.sym).map { case (s, o) => s -> o.size.toLong }
      val clLens: Map[Int, Int] =
        if (clFreq.size == 1) Map(clFreq.head._1 -> 1) else huffLengths(clFreq, 7)
      val clCodes = canonicalCodes(clLens)
      // numCl must cover every used cl symbol's position in the fixed order
      val numCl = (ClOrder.zipWithIndex.collect {
        case (s, idx) if clLens.getOrElse(s, 0) > 0 => idx + 1
      }.max).max(4)
      bw.put(numCl - 4, 4)
      for (i2 <- 0 until numCl) bw.put(clLens.getOrElse(ClOrder(i2), 0), 3)
      if (useMaxSym) {
        require(ops.length >= 2, "complex codes always need >= 2 ops") // shortcut needs max_symbol >= 2
        bw.put(1, 1)
        // smallest length_nbits that can hold ops.length - 2
        val need = ops.length - 2
        val sel = (0 to 7).find(s => need < (1 << (2 + 2 * s))).get
        bw.put(sel, 3)
        bw.put(need, 2 + 2 * sel)
      } else bw.put(0, 1) // no max_symbol shortcut
      val clSingle = clFreq.size == 1
      for (op <- ops) {
        if (!clSingle) { val (c, l) = clCodes(op.sym); putMsb(bw, c, l) }
        if (op.extraBits > 0) bw.put(op.extraVal, op.extraBits)
      }
      if (single) Map(used.head -> (0, 0)) else canonicalCodes(lens)
    }
  }

  /** Prefix-code bits are written first-bit-most-significant. */
  def putMsb(bw: Bw, code: Int, len: Int): Unit = {
    var i = len - 1
    while (i >= 0) { bw.put((code >> i) & 1, 1); i -= 1 }
  }

  /** Inverse of the LZ77 prefix-value coding: (code, extraBits, extraVal). */
  def lz77Code(value: Int): (Int, Int, Int) = {
    if (value <= 4) return (value - 1, 0, 0)
    var code = 4
    while (code < 40) {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      if (value >= offset + 1 && value <= offset + (1 << extra)) return (code, extra, value - offset - 1)
      code += 1
    }
    sys.error(s"no lz77 code for $value")
  }

  sealed trait Tok
  final case class Lit(argb: Int) extends Tok
  final case class Copy(len: Int, dist: Int) extends Tok
  final case class CacheRef(idx: Int, argb: Int) extends Tok

  /** Tokenize the pixel stream: cache hits first, then a dist∈{1,w} LZ77
    * run when enabled, else a literal.
    */
  def tokenize(px: Array[Int], w: Int, cacheBits: Int, lz77: Boolean): Seq[Tok] = {
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val filled = if (cache != null) new Array[Boolean](cache.length) else null
    def key(v: Int) = (0x1e35a7bd * v) >>> (32 - cacheBits)
    val out = scala.collection.mutable.ArrayBuffer[Tok]()
    var pos = 0
    while (pos < px.length) {
      val v = px(pos)
      val k = if (cache != null) key(v) else -1
      if (cache != null && filled(k) && cache(k) == v) {
        out += CacheRef(k, v)
        pos += 1
      } else {
        var emitted = false
        if (lz77 && pos > 0) {
          val dist = if (pos >= w && px(pos - w) == v) w else if (px(pos - 1) == v) 1 else 0
          if (dist > 0) {
            var len = 0
            while (pos + len < px.length && px(pos + len) == px(pos + len - dist) && len < 40) len += 1
            if (len >= 3) {
              var j = 0
              while (j < len) {
                if (cache != null) { val kk = key(px(pos + j)); cache(kk) = px(pos + j); filled(kk) = true }
                j += 1
              }
              out += Copy(len, dist)
              pos += len
              emitted = true
            }
          }
        }
        if (!emitted) {
          if (cache != null) { cache(k) = v; filled(k) = true }
          out += Lit(v)
          pos += 1
        }
      }
    }
    out.toSeq
  }

  /** Encode one spatially-coded image (no meta groups). */
  def writeImage(bw: Bw, px: Array[Int], w: Int, cacheBits: Int, lz77: Boolean,
      zeroRuns: Boolean, distViaMap: Boolean, useMaxSym: Boolean = false): Unit = {
    if (cacheBits > 0) { bw.put(1, 1); bw.put(cacheBits, 4) } else bw.put(0, 1)
    val toks = tokenize(px, w, cacheBits, lz77)
    def distCode(dist: Int): Int =
      if (distViaMap && dist == 1) 2 // DistMap(1) == (1, 0)
      else if (distViaMap && dist == w && w <= 0x7fff) 1 // DistMap(0) == (0, 1); only valid when dy*w+dx == w
      else dist + 120
    val gFreq = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val rFreq = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val bFreq = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val aFreq = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val dFreq = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    toks.foreach {
      case Lit(v) =>
        gFreq((v >> 8) & 0xff) += 1; rFreq((v >> 16) & 0xff) += 1
        bFreq(v & 0xff) += 1; aFreq((v >>> 24) & 0xff) += 1
      case Copy(len, dist) =>
        gFreq(256 + lz77Code(len)._1) += 1
        dFreq(lz77Code(distCode(dist))._1) += 1
      case CacheRef(idx, _) =>
        gFreq(256 + 24 + idx) += 1
    }
    // every tree must exist; give unused trees a single dummy symbol
    for (f <- Seq(rFreq, bFreq, aFreq)) if (f.isEmpty) f(0) = 1
    if (dFreq.isEmpty) dFreq(0) = 1
    bw.put(0, 1) // no meta prefix (only read when level0; harmless 0 bit is NOT written for sub-images — see caller)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val gC = writePrefix(bw, 256 + 24 + cacheSize, gFreq.toMap, zeroRuns, useMaxSym)
    val rC = writePrefix(bw, 256, rFreq.toMap, zeroRuns, useMaxSym)
    val bC = writePrefix(bw, 256, bFreq.toMap, zeroRuns, useMaxSym)
    val aC = writePrefix(bw, 256, aFreq.toMap, zeroRuns, useMaxSym)
    val dC = writePrefix(bw, 40, dFreq.toMap, zeroRuns, useMaxSym)
    def emit(codes: Map[Int, (Int, Int)], s: Int): Unit = { val (c, l) = codes(s); putMsb(bw, c, l) }
    toks.foreach {
      case Lit(v) =>
        emit(gC, (v >> 8) & 0xff); emit(rC, (v >> 16) & 0xff)
        emit(bC, v & 0xff); emit(aC, (v >>> 24) & 0xff)
      case Copy(len, dist) =>
        val (lc, leb, lev) = lz77Code(len)
        emit(gC, 256 + lc); bw.put(lev, leb)
        val (dc, deb, dev) = lz77Code(distCode(dist))
        emit(dC, dc); bw.put(dev, deb)
      case CacheRef(idx, _) =>
        emit(gC, 256 + 24 + idx)
    }
  }

  final case class Cfg(cacheBits: Int = 0, lz77: Boolean = false, zeroRuns: Boolean = false,
      distViaMap: Boolean = false, subtractGreen: Boolean = false,
      predictorMode: Int = -1, predictorBits: Int = 2,
      colorParams: Option[(Int, Int, Int)] = None, // (g2r, g2b, r2b) signed bytes
      palette: Boolean = false, maxSymShortcut: Boolean = false)

  private def divCeil(a: Int, b: Int) = (a + b - 1) / b
  private def subPx(v: Int, pred: Int): Int = {
    val a = (((v >>> 24) - (pred >>> 24)) & 0xff) << 24
    val r = ((((v >> 16) & 0xff) - ((pred >> 16) & 0xff)) & 0xff) << 16
    val g = ((((v >> 8) & 0xff) - ((pred >> 8) & 0xff)) & 0xff) << 8
    val b = (((v & 0xff) - (pred & 0xff)) & 0xff)
    a | r | g | b
  }
  private def avg2(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) >> 1) & 0xff
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) & 0xff
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) & 0xff
    val bb = (((a & 0xff) + (b & 0xff)) >> 1) & 0xff
    (aa << 24) | (rr << 16) | (gg << 8) | bb
  }
  private def clamp255(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
  private def predict(mode: Int, img: Array[Int], w: Int, x: Int, y: Int): Int = {
    val pos = y * w + x
    if (x == 0 && y == 0) return 0xff000000
    if (y == 0) return img(pos - 1)
    if (x == 0) return img(pos - w)
    val l = img(pos - 1); val t = img(pos - w); val tl = img(pos - w - 1)
    val tr = if (x == w - 1) img(y * w) else img(pos - w + 1)
    def sumAbs(u: Int, v: Int) =
      math.abs((u >>> 24) - (v >>> 24)) + math.abs(((u >> 16) & 0xff) - ((v >> 16) & 0xff)) +
        math.abs(((u >> 8) & 0xff) - ((v >> 8) & 0xff)) + math.abs((u & 0xff) - (v & 0xff))
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => if (sumAbs(t, tl) < sumAbs(l, tl)) l else t
      case 12 =>
        def ch(sh: Int) = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
        (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
      case _ =>
        val av = avg2(l, t)
        def ch(sh: Int) = { val a = (av >>> sh) & 0xff; val b = (tl >>> sh) & 0xff; clamp255(a + (a - b) / 2) }
        (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
    }
  }
  private def ctDelta(t: Int, c: Int): Int = (t.toByte.toInt * c.toByte.toInt) >> 5

  /** Full encode: container + header + transforms + spatial image. */
  def encode(img: Array[Int], w: Int, h: Int, cfg: Cfg): Array[Byte] = {
    require(img.length == w * h)
    val bw = new Bw
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1) // alpha hint
    bw.put(0, 3) // version
    var px = img.clone()
    var effW = w
    // transforms, in write order; decoder inverts in reverse order, so
    // forward application order here must match write order.
    if (cfg.predictorMode >= 0) {
      bw.put(1, 1); bw.put(0, 2) // predictor
      bw.put(cfg.predictorBits - 2, 3)
      val tw = divCeil(w, 1 << cfg.predictorBits)
      val th = divCeil(h, 1 << cfg.predictorBits)
      val tiles = Array.fill(tw * th)(0xff000000 | (cfg.predictorMode << 8))
      writeSub(bw, tiles, tw)
      val res = new Array[Int](px.length)
      for (y <- 0 until h; x <- 0 until w)
        res(y * w + x) = subPx(px(y * w + x), predict(cfg.predictorMode, px, w, x, y))
      px = res
    }
    cfg.colorParams.foreach { case (g2r, g2b, r2b) =>
      bw.put(1, 1); bw.put(1, 2) // cross-color
      bw.put(0, 3) // bits = 2 → one tile covers up to 4x4; use whole-image tiles
      val bits = 2
      val tw = divCeil(w, 1 << bits)
      val th = divCeil(h, 1 << bits)
      val cm = 0xff000000 | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) | (g2r & 0xff)
      writeSub(bw, Array.fill(tw * th)(cm), tw)
      px = px.map { v =>
        val g = (v >> 8) & 0xff
        val r0 = (v >> 16) & 0xff
        val b0 = v & 0xff
        val r = (r0 - ctDelta(g2r & 0xff, g)) & 0xff
        val b = (b0 - ctDelta(g2b & 0xff, g) - ctDelta(r2b & 0xff, r0)) & 0xff
        (v & 0xff00ff00.toInt) | (r << 16) | b
      }
    }
    if (cfg.subtractGreen) {
      bw.put(1, 1); bw.put(2, 2)
      px = px.map { v =>
        val g = (v >> 8) & 0xff
        val r = (((v >> 16) & 0xff) - g) & 0xff
        val b = ((v & 0xff) - g) & 0xff
        (v & 0xff00ff00.toInt) | (r << 16) | b
      }
    }
    if (cfg.palette) {
      val colors = px.distinct
      require(colors.length <= 16, "palette test images stay <= 16 colors")
      bw.put(1, 1); bw.put(3, 2)
      bw.put(colors.length - 1, 8)
      // component-wise delta-coded palette sub-image (1 row)
      val deltas = colors.zipWithIndex.map { case (c, i) =>
        if (i == 0) c else subPx(c, colors(i - 1))
      }
      writeSub(bw, deltas, colors.length)
      val wb = if (colors.length <= 2) 3 else if (colors.length <= 4) 2 else 1
      val bpp = 8 >> wb
      val perByte = 1 << wb
      effW = divCeil(w, perByte)
      val packed = new Array[Int](effW * h)
      for (y <- 0 until h; xf <- 0 until w) {
        val idx = colors.indexOf(px(y * w + xf))
        val slot = y * effW + xf / perByte
        val g = ((packed(slot) >> 8) & 0xff) | (idx << ((xf % perByte) * bpp))
        packed(slot) = 0xff000000 | (g << 8)
      }
      px = packed
    }
    bw.put(0, 1) // end of transforms
    writeImage(bw, px, effW, cfg.cacheBits, cfg.lz77, cfg.zeroRuns, cfg.distViaMap, cfg.maxSymShortcut)
    container(bw.bytes)
  }

  /** Sub-images (transform data) have no transforms and no meta-prefix bit;
    * the decoder reads [cache bit, prefix codes, pixels] only — mirror that.
    */
  private def writeSub(bw: Bw, px: Array[Int], w: Int): Unit = {
    bw.put(0, 1) // no color cache
    // NOTE: no meta-prefix bit for sub-images (decoder only reads it at level0)
    val gFreq = px.map(v => (v >> 8) & 0xff).groupBy(identity).map { case (s, a) => s -> a.length.toLong }
    val rFreq = px.map(v => (v >> 16) & 0xff).groupBy(identity).map { case (s, a) => s -> a.length.toLong }
    val bFreq = px.map(v => v & 0xff).groupBy(identity).map { case (s, a) => s -> a.length.toLong }
    val aFreq = px.map(v => (v >>> 24) & 0xff).groupBy(identity).map { case (s, a) => s -> a.length.toLong }
    val gC = writePrefix(bw, 256 + 24, gFreq, zeroRuns = false)
    val rC = writePrefix(bw, 256, rFreq, zeroRuns = false)
    val bC = writePrefix(bw, 256, bFreq, zeroRuns = false)
    val aC = writePrefix(bw, 256, aFreq, zeroRuns = false)
    val dC = writePrefix(bw, 40, Map(0 -> 1L), zeroRuns = false)
    def emit(codes: Map[Int, (Int, Int)], s: Int): Unit = { val (c, l) = codes(s); putMsb(bw, c, l) }
    px.foreach { v =>
      emit(gC, (v >> 8) & 0xff); emit(rC, (v >> 16) & 0xff)
      emit(bC, v & 0xff); emit(aC, (v >>> 24) & 0xff)
    }
    dC.size // distance tree written but never used in literal-only sub-images
  }

  def container(payload0: Array[Byte]): Array[Byte] = {
    val payload = 0x2f.toByte +: payload0
    val chunkLen = payload.length
    val padded = if (chunkLen % 2 == 1) payload :+ 0.toByte else payload
    val riffLen = 4 + 8 + padded.length
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    out.write("RIFF".getBytes); le32(riffLen)
    out.write("WEBP".getBytes)
    out.write("VP8L".getBytes); le32(chunkLen)
    out.write(padded)
    out.toByteArray
  }
}

class Vp8lSpec extends AnyFunSuite {
  import Vp8lTestEncoder._

  private def decodeArgb(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    val res = Vp8lDecode.argbOrNull(bytes)
    assert(res != null, "decoder rejected an encoder-produced stream")
    assert(res._1 == w && res._2 == h, s"dims ${res._1}x${res._2}, want ${w}x$h")
    res._3
  }

  private def randImg(rnd: scala.util.Random, w: Int, h: Int, nColors: Int): Array[Int] = {
    val colors = Array.fill(nColors)(rnd.nextInt() | 0xff000000)
    Array.fill(w * h)(colors(rnd.nextInt(nColors)))
  }

  test("distance map: 120 entries, spec head pinned, sorted by the spec rule") {
    val m = Vp8lDecode.DistMap
    assert(m.length == 120)
    val head = Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0))
    assert(m.take(head.length).toSeq == head)
    assert(m.distinct.length == 120)
    assert(m.last == ((8, 7)))
  }

  test("golden: hand-verified byte-exact 2x1 stream") {
    // This exact hex was verified BIT BY BIT against the spec by hand
    // (container, 14-bit dims, five simple prefix codes, canonical 1-bit
    // pixel codes) — it pins the wire format itself, so a symmetric
    // encoder+decoder drift cannot slip past the round-trip tests.
    val img = Array(0xff102030, 0xff405060)
    val bytes = encode(img, 2, 1, Cfg())
    val wantHex = "524946461c000000574542505650384c100000002f010000003808d421800e03d6ffc001"
    assert(bytes.map(b => f"$b%02x").mkString == wantHex)
    assert(decodeArgb(bytes, 2, 1).toSeq == img.toSeq)
    // luma: (299*16+587*32+114*48)/1000 = 29; (299*64+587*80+114*96)/1000 = 77
    assert(Vp8lDecode.webpLumaOrNull(bytes).toSeq == Seq(29.toByte, 77.toByte))
  }

  test("golden: 1x1 single pixel, simple codes") {
    val img = Array(0xffc08040)
    val bytes = encode(img, 1, 1, Cfg())
    assert(decodeArgb(bytes, 1, 1).toSeq == img.toSeq)
  }

  test("two-color checkerboard: simple 2-symbol codes per channel") {
    val w = 9; val h = 7
    val img = Array.tabulate(w * h)(i => if ((i % w + i / w) % 2 == 0) 0xff112233 else 0xffa0b0c0)
    assert(decodeArgb(encode(img, w, h, Cfg()), w, h).toSeq == img.toSeq)
  }

  test("complex code-length-coded trees, with and without 16/17/18 run coding") {
    val rnd = new scala.util.Random(7)
    val w = 13; val h = 11
    val img = randImg(rnd, w, h, 9)
    for (zr <- Seq(false, true))
      assert(decodeArgb(encode(img, w, h, Cfg(zeroRuns = zr)), w, h).toSeq == img.toSeq,
        s"zeroRuns=$zr")
  }

  test("color cache hits round-trip") {
    val rnd = new scala.util.Random(11)
    val w = 16; val h = 8
    val img = randImg(rnd, w, h, 4)
    for (cb <- Seq(1, 3, 6))
      assert(decodeArgb(encode(img, w, h, Cfg(cacheBits = cb)), w, h).toSeq == img.toSeq,
        s"cacheBits=$cb")
  }

  test("LZ77 copies: direct distances and the 2D distance map (dist 1 and w)") {
    val w = 12; val h = 10
    // vertical stripes -> dist-1 runs; repeated rows -> dist-w runs
    val img = Array.tabulate(w * h)(i => if ((i % w) < 6) 0xff0000ff else 0xff00ff00)
    for (viaMap <- Seq(false, true))
      assert(decodeArgb(encode(img, w, h, Cfg(lz77 = true, distViaMap = viaMap)), w, h).toSeq == img.toSeq,
        s"distViaMap=$viaMap")
  }

  test("subtract-green transform round-trips") {
    val rnd = new scala.util.Random(13)
    val w = 8; val h = 8
    val img = randImg(rnd, w, h, 6)
    assert(decodeArgb(encode(img, w, h, Cfg(subtractGreen = true)), w, h).toSeq == img.toSeq)
  }

  test("all 14 predictor modes round-trip") {
    val rnd = new scala.util.Random(17)
    val w = 11; val h = 9
    for (mode <- 0 to 13) {
      val img = randImg(rnd, w, h, 5)
      for (bits <- Seq(2, 4))
        assert(decodeArgb(encode(img, w, h, Cfg(predictorMode = mode, predictorBits = bits)), w, h).toSeq == img.toSeq,
          s"predictor mode=$mode bits=$bits")
    }
  }

  test("cross-color transform round-trips (signed params)") {
    val rnd = new scala.util.Random(19)
    val w = 10; val h = 6
    val img = randImg(rnd, w, h, 7)
    for (params <- Seq((0, 0, 0), (16, -16, 5), (-128, 127, -1)))
      assert(decodeArgb(encode(img, w, h, Cfg(colorParams = Some(params))), w, h).toSeq == img.toSeq,
        s"params=$params")
  }

  test("color-indexing with 2/4/16-color bundling round-trips") {
    val rnd = new scala.util.Random(23)
    for ((n, w, h) <- Seq((2, 19, 5), (4, 10, 7), (13, 9, 9))) {
      val img = randImg(rnd, w, h, n)
      assert(decodeArgb(encode(img, w, h, Cfg(palette = true)), w, h).toSeq == img.toSeq,
        s"colors=$n")
    }
  }

  test("max_symbol shortcut: truncated code-length transmission round-trips") {
    val rnd = new scala.util.Random(31)
    val w = 15; val h = 9
    val img = randImg(rnd, w, h, 8)
    for (zr <- Seq(false, true))
      assert(decodeArgb(encode(img, w, h, Cfg(zeroRuns = zr, maxSymShortcut = true)), w, h).toSeq == img.toSeq,
        s"zeroRuns=$zr")
  }

  test("stacked transforms: predictor + cross-color + subtract-green") {
    val rnd = new scala.util.Random(29)
    val w = 14; val h = 12
    val img = randImg(rnd, w, h, 6)
    val cfg = Cfg(predictorMode = 7, predictorBits = 3, colorParams = Some((12, -7, 33)),
      subtractGreen = true, cacheBits = 2, lz77 = true, distViaMap = true, zeroRuns = true)
    assert(decodeArgb(encode(img, w, h, cfg), w, h).toSeq == img.toSeq)
  }

  test("randomized round-trip sweep across feature combinations") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 60) {
      val w = 1 + rnd.nextInt(20)
      val h = 1 + rnd.nextInt(20)
      val img = randImg(rnd, w, h, 1 + rnd.nextInt(10))
      val paletteOk = img.distinct.length <= 16 && rnd.nextBoolean()
      val cfg = Cfg(
        cacheBits = if (rnd.nextBoolean()) 1 + rnd.nextInt(6) else 0,
        lz77 = rnd.nextBoolean(),
        zeroRuns = rnd.nextBoolean(),
        distViaMap = rnd.nextBoolean(),
        subtractGreen = !paletteOk && rnd.nextBoolean(),
        predictorMode = if (!paletteOk && rnd.nextBoolean()) rnd.nextInt(14) else -1,
        colorParams = if (!paletteOk && rnd.nextBoolean()) Some((rnd.nextInt(256) - 128, rnd.nextInt(256) - 128, rnd.nextInt(256) - 128)) else None,
        palette = paletteOk, maxSymShortcut = rnd.nextBoolean())
      val got = decodeArgb(encode(img, w, h, cfg), w, h)
      assert(got.toSeq == img.toSeq, s"trial $trial ${w}x$h cfg=$cfg")
    }
  }

  test("VP8X extended container: the chunk walk finds VP8L behind metadata chunks") {
    // Files saved with ICC/EXIF/XMP metadata wrap the VP8L chunk in a VP8X
    // container — build one by hand: VP8X header chunk, a dummy EXIF chunk
    // (odd-sized, exercising the pad byte), then the VP8L chunk from a
    // plain encode.
    val img = Array(0xff112233, 0xff445566, 0xff778899, 0xffaabbcc)
    val plain = encode(img, 2, 2, Cfg())
    val vp8lChunk = plain.drop(12) // "VP8L" + size + payload (+pad)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val vp8x = "VP8X".getBytes ++ le32(10) ++ Array[Byte](2, 0, 0, 0) ++ // flags: EXIF
      Array[Byte](1, 0, 0) ++ Array[Byte](1, 0, 0) // canvas w-1, h-1 (24-bit LE)
    val exif = "EXIF".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // odd size + pad
    val body = "WEBP".getBytes ++ vp8x ++ exif ++ vp8lChunk
    val bytes = "RIFF".getBytes ++ le32(body.length) ++ body
    assert(decodeArgb(bytes, 2, 2).toSeq == img.toSeq)
    // and a container with ONLY a lossy chunk still walks off and rejects
    val lossyOnly = "RIFF".getBytes ++ le32(16) ++ "WEBP".getBytes ++
      "VP8 ".getBytes ++ le32(4) ++ Array[Byte](0, 0, 0, 0)
    assert(Vp8lDecode.webpLumaOrNull(lossyOnly) == null)
  }

  test("luma plane matches the shared Rec.601 integer formula") {
    val img = Array(0xff604020, 0xffffffff, 0xff000000, 0xff0000ff)
    val bytes = encode(img, 2, 2, Cfg())
    val luma = Vp8lDecode.webpLumaOrNull(bytes)
    assert(luma != null)
    val want = img.map { px =>
      val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val b = px & 0xff
      ((299 * r + 587 * g + 114 * b) / 1000).toByte
    }
    assert(luma.toSeq == want.toSeq)
  }

  test("real libwebp-encoded fixtures decode to libwebp's own luma plane") {
    // Four streams produced by the REAL encoder (WebPEncodeLosslessRGBA,
    // libwebp 7.1.5) with its own transform/entropy choices — palette,
    // gradient (predictor/cross-color), a 220x140 mix that gets meta
    // prefix groups, and a photo-like random walk. The .luma reference
    // beside each .webp is libwebp's decode through the shared Rec.601
    // integer formula, so this pins real-encoder compatibility inside
    // `sbt test` (dev/vp8l_diff.py is the wider, generative version).
    for (name <- Seq("palette", "gradient", "metamix", "photowalk")) {
      def res(ext: String): Array[Byte] = {
        val in = getClass.getResourceAsStream(s"/vp8l/$name.$ext")
        assert(in != null, s"missing resource $name.$ext")
        try in.readAllBytes() finally in.close()
      }
      val got = Vp8lDecode.webpLumaOrNull(res("webp"))
      assert(got != null, s"$name: rejected")
      assert(got.toSeq == res("luma").toSeq, s"$name: luma mismatch")
    }
  }

  test("rejects: lossy VP8, truncated, wrong signature, garbage — null, never a throw") {
    val good = encode(Array(0xff123456), 1, 1, Cfg())
    val lossy = good.clone(); lossy(15) = ' ' // "VP8 " (lossy chunk tag)
    assert(Vp8lDecode.webpLumaOrNull(lossy) == null)
    for (cut <- Seq(5, 12, 20, 21, good.length - 1))
      assert(Vp8lDecode.webpLumaOrNull(good.take(cut)) == null, s"cut=$cut")
    val badSig = good.clone(); badSig(20) = 0x2e
    assert(Vp8lDecode.webpLumaOrNull(badSig) == null)
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(junk)
      Vp8lDecode.webpLumaOrNull(junk) // must not throw
    }
    // fuzz the body of a valid stream: null or a same-size plane, never a throw
    for (_ <- 0 until 200) {
      val mut = good.clone()
      mut(21 + rnd.nextInt(mut.length - 21)) = rnd.nextInt(256).toByte
      Vp8lDecode.webpLumaOrNull(mut)
    }
  }
}
