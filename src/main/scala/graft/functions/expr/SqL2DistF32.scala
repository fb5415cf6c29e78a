package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused squared-L2 distance over two ArrayType(FloatType) columns,
  * computed as |a|² + |b|² - 2·(a·b) — NOT the direct Σ(aᵢ-bᵢ)² form —
  * with each of the three accumulators the same sequential double fold as
  * [[DotProductF32]]. That keeps the result BIT-EQUAL to the composed
  * `dot(a,a) + dot(b,b) - 2*dot(a,b)` expression tree (property-tested)
  * and therefore to the DuckDB oracle's three `list_sum` folds, while
  * traversing each array once instead of the composed form's three
  * expression evaluations per row. The PQ index (codebook training,
  * encoding, and ADC tables — the hottest distance path in VectorQueries)
  * runs on this.
  */
case class SqL2DistF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sql2_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < x.numElements()) { na += x.getFloat(i).toDouble * x.getFloat(i).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < y.numElements()) { nb += y.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    na + nb - 2.0 * dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |double $na = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $na += (double) $a.getFloat($i) * (double) $a.getFloat($i);
         |}
         |double $nb = 0.0;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  $nb += (double) $b.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $na + $nb - 2.0 * $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqL2DistF32 =
    copy(left = newLeft, right = newRight)
}
