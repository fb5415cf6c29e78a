package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Wrap a raw Catalyst Expression as a user-facing Column. Spark 4 made this
  * constructor private[sql], so (like frameless/sedona and other extension
  * libraries) we expose it from a subpackage of org.apache.spark.sql. No
  * Spark internals are modified — this is the supported extension seam for
  * libraries that ship custom Expressions without a FunctionRegistry round
  * trip, so custom expressions work on ANY session (including one the test
  * driver creates without our SparkSessionExtensions).
  */
object GraftColumn {
  def apply(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst Expression (inverse seam). */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Apply Expression constructors to Columns. */
  def lift1(f: Expression => Expression)(a: Column): Column =
    apply(f(expression(a)))
  def lift2(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    apply(f(expression(a), expression(b)))
}
