package graft.multimodal

/** Deterministic decode of binary (P6) PPM images — the one raster format
  * whose decode is pure header-parse + integer math, which makes the phash
  * family operate on actual pixel data while staying bit-exact across
  * engines (no codec libs, no DCT, no float resampling anywhere).
  *
  * Grammar accepted (the netpbm spec for P6): magic `P6`, then three
  * whitespace-separated ASCII decimal fields `width height maxval`, with
  * `#`-to-end-of-line comments allowed in the header, then EXACTLY one
  * whitespace byte, then `width*height*3` raw RGB bytes. Restrictions for
  * determinism: maxval must be 1..255 (single-byte samples) and the data
  * section must be exactly the declared size — anything else returns null
  * and callers fall back to the opaque-bytes path.
  *
  * Luminance is the integer Rec.601 weighting, truncating division —
  * `(299*R + 587*G + 114*B) / 1000` — so a DuckDB oracle reproduces the
  * plane exactly with `//` arithmetic.
  */
object PpmDecode {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

  /** Skip whitespace and `#` comments; returns next index or -1 if none. */
  private def skipWsAndComments(p: Array[Byte], start: Int): Int = {
    var i = start
    var progressed = false
    while (i < p.length && (isWs(p(i)) || p(i) == '#')) {
      if (p(i) == '#') {
        if (!progressed) return -1 // comment must follow at least one ws
        while (i < p.length && p(i) != '\n') i += 1
      } else {
        progressed = true
        i += 1
      }
    }
    if (!progressed || i >= p.length) -1 else i
  }

  /** Parse an unsigned decimal at `start`; returns ((value, nextIdx)) or null.
    * Value capped at 10^8 — larger headers are rejected, not overflowed.
    */
  private def readInt(p: Array[Byte], start: Int): (Int, Int) = {
    var i = start
    var v = 0L
    var digits = 0
    while (i < p.length && p(i) >= '0' && p(i) <= '9') {
      v = v * 10 + (p(i) - '0')
      digits += 1
      if (v > 100000000L) return null
      i += 1
    }
    if (digits == 0) null else (v.toInt, i)
  }

  /** The luminance plane of a binary P6 PPM payload (row-major, one byte per
    * pixel), or null if the payload is not a well-formed P6 under the rules
    * above. Callable from generated code (static forwarder).
    */
  def lumaOrNull(p: Array[Byte]): Array[Byte] = {
    if (p == null || p.length < 2 || p(0) != 'P' || p(1) != '6') return null
    var i = skipWsAndComments(p, 2)
    if (i < 0) return null
    val wr = readInt(p, i); if (wr == null) return null
    val w = wr._1
    i = skipWsAndComments(p, wr._2); if (i < 0) return null
    val hr = readInt(p, i); if (hr == null) return null
    val h = hr._1
    i = skipWsAndComments(p, hr._2); if (i < 0) return null
    val mr = readInt(p, i); if (mr == null) return null
    val maxval = mr._1
    i = mr._2
    // exactly ONE whitespace byte between maxval and the raster
    if (i >= p.length || !isWs(p(i))) return null
    i += 1
    if (w < 1 || h < 1 || maxval < 1 || maxval > 255) return null
    val nPix = w.toLong * h.toLong
    if (p.length.toLong - i != nPix * 3L) return null
    val out = new Array[Byte](nPix.toInt)
    var k = 0
    while (k < out.length) {
      val r = p(i + 3 * k) & 0xff
      val g = p(i + 3 * k + 1) & 0xff
      val b = p(i + 3 * k + 2) & 0xff
      out(k) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
      k += 1
    }
    out
  }
}
