package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Binary → binary decode of a P6 PPM payload to its luminance plane
  * ([[graft.multimodal.PpmDecode.lumaOrNull]]), NULL when the payload does
  * not parse — so `coalesce(ppm_luma(payload), payload)` is the
  * decode-with-opaque-fallback idiom the media dedup family uses. Stays
  * inside whole-stage codegen: the generated code is one static call into
  * the shared parser (the same pattern as Spark's own StaticInvoke), no
  * row-level closure allocation.
  */
case class PpmLuma(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // non-PPM payloads decode to NULL
  override def prettyName: String = "graft_ppm_luma"

  override protected def nullSafeEval(input: Any): Any =
    graft.multimodal.PpmDecode.lumaOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      s"""
         |${ev.value} = graft.multimodal.PpmDecode.lumaOrNull($bin);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PpmLuma =
    copy(child = newChild)
}
