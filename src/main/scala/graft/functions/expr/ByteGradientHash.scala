package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Codegen'd 32-bit perceptual gradient hash over an opaque binary payload —
  * the dHash construction (difference hash: resize, then bit = "brightness
  * rises between adjacent cells") applied to a byte stream: the payload is
  * divided into 33 contiguous blocks (block of byte i = i*33/n, the integer
  * "resize"), and bit b is set iff block b's mean byte value exceeds block
  * b+1's. Payloads that are near-duplicates at the byte level (re-encodes,
  * watermarks, truncated tails) keep most gradient signs, so Hamming
  * distance over this hash is the media-column analogue of SimHash on text.
  *
  * Cross-engine determinism: means are compared by integer
  * cross-multiplication (s_b·c_{b+1} > s_{b+1}·c_b) — no floating point
  * anywhere, so the DuckDB oracle reproduces the hash exactly. Blocks with
  * no bytes (payload shorter than 33 bytes) contribute zero sums/counts;
  * both comparisons against an empty block are then false, matching the
  * oracle's dense 33-row grid with coalesce(0).
  *
  * One generated loop per row, no allocation beyond two 33-long arrays —
  * a pure map stage at any corpus size.
  */
case class ByteGradientHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_byte_gradient_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val s = new Array[Long](33)
    val c = new Array[Long](33)
    var i = 0
    while (i < n) {
      val b = ((i.toLong * 33L) / n).toInt
      s(b) += (bytes(i) & 0xff).toLong
      c(b) += 1L
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 32) {
      if (s(b) * c(b + 1) > s(b + 1) * c(b)) h |= (1L << b)
      b += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
         |int $n = $bin.length;
         |long[] $s = new long[33];
         |long[] $c = new long[33];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = (int) (((long) $i * 33L) / $n);
         |  $s[$b] += (long) ($bin[$i] & 0xff);
         |  $c[$b] += 1L;
         |}
         |long $h = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($s[$b] * $c[$b + 1] > $s[$b + 1] * $c[$b]) $h |= (1L << $b);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteGradientHash =
    copy(child = newChild)
}
