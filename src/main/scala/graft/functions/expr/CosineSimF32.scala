package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two ArrayType(FloatType) columns: one
  * generated function with three tight loops (dot, |a|², |b|²) replacing
  * three separate expression-tree evaluations. Each accumulator is the same
  * sequential double fold as [[DotProductF32]]/the DuckDB oracle, and the
  * final combine uses the identical expression shape
  * (dot / (sqrt(na) * sqrt(nb))) — so results are bit-equal to the composed
  * form with no intermediate allocation.
  *
  * Zero-norm behavior (deliberate, matches the composed form and the DuckDB
  * oracle): if either vector is all-zero the dot is 0 and the denominator is
  * 0, so the result is 0/0 = NaN. Spark orders NaN as the GREATEST double,
  * so a `orderBy(cos.desc)` top-k would rank zero-embedding pairs first
  * (other engines differ — DuckDB sorts NaN last by default). Corpora that
  * can contain zero embeddings should pre-filter on a positive norm or wrap
  * the call in `nanvl(cos, lit(0.0))`. Kept un-guarded here so the
  * expression stays bit-equal to the portable composed/oracle form.
  */
case class CosineSimF32(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_cosine_f32"

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
    dot / (math.sqrt(na) * math.sqrt(nb))
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
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimF32 =
    copy(left = newLeft, right = newRight)
}
