package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Word n-gram shingles as ONE expression evaluation per row: split on a
  * single space, emit the n-w+1 space-joined w-grams.
  *
  * Why an expression and not the transform/slice/array_join HOF composition:
  * interpreted higher-order lambdas get no common-subexpression elimination,
  * so after Catalyst's projection collapse the `split(text)` child is
  * re-evaluated once per OUTPUT element — and a downstream `size(shs)` next
  * to `explode(shs)` re-derives the whole array per exploded row. That
  * O(tokens²·|text|) recompute was measured as a 30-minute single-task stall
  * when a broadcast build side lost its materialization barrier. One opaque
  * expression makes the cost O(|text| + shingles) per evaluation no matter
  * how the optimizer rearranges the plan — no barrier needed at all.
  *
  * Semantics exactly match the HOF form ([[graft.functions.TextFns.shinglesHof]],
  * property-tested) and the DuckDB oracle fragment
  * (`list_transform(range(1, len(ts)-w+2), i -> ts[i] || ' ' || ...)`):
  * split keeps empty tokens, docs shorter than w yield an empty array.
  * CodegenFallback: one interpreted call per row is already cheap; the win
  * is the per-row evaluation count, not the loop body.
  */
case class TokenShingles(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  require(width >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    // -1 limit: keep trailing empty tokens, matching Spark split(text, " ")
    // and DuckDB string_split.
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = toks.length - (width - 1)
    if (n <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n) {
        sb.setLength(0)
        var j = 0
        while (j < width) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}
