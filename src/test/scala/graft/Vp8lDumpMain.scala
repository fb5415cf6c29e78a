package graft

/** Dev harness for `dev/vp8l_diff.py`: decode every `*.webp` in a directory
  * with [[graft.multimodal.Vp8lDecode]] and print one line per file —
  * `name REJECT` or `name <w> <h> <argb-hex>` — for the python side to
  * compare pixel-exact against libwebp's own decode of the same bytes.
  */
object Vp8lDumpMain {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    for (f <- dir.listFiles().filter(_.getName.endsWith(".webp")).sortBy(_.getName)) {
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val res = graft.multimodal.Vp8lDecode.argbOrNull(bytes)
      if (res == null) println(s"${f.getName} REJECT")
      else {
        val (w, h, argb) = res
        val sb = new StringBuilder(argb.length * 8)
        argb.foreach(px => sb.append(f"$px%08x"))
        println(s"${f.getName} $w $h $sb")
      }
    }
  }
}
