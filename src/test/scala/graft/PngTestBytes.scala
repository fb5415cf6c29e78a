package graft

/** Shared PNG byte-craft helpers for the decoder specs (MediaPipelineSpec,
  * PngDiffSpec, DecodeFuzzSpec) — ONE copy of the chunk assembly, file
  * signature, JDK-encoder wrapper and Rec.601 luminance, so the specs
  * cannot drift apart (round-12 review: each carried a private
  * byte-identical copy of these).
  */
object PngTestBytes {

  val sig: Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** One PNG chunk: length + type + data + CRC32 over type+data. */
  def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(tpe.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** The decoders' integer Rec.601 (truncating division). */
  def rec601(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** Encode through the JDK's own PNG writer — the independent encoder the
    * differential specs compare against.
    */
  def jdkPng(bi: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(bi, "png", baos), "JDK PNG writer refused the image")
    baos.toByteArray
  }
}
