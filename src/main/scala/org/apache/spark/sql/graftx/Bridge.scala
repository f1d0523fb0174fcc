package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 made the classic `Column(expr)` constructor internal; extension
  * libraries conventionally host a tiny shim inside `org.apache.spark.sql`
  * to convert between the public `Column` API and catalyst `Expression`s
  * (needed to expose custom expressions like `graft.functions.Uuid3` as
  * ordinary Columns).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is `private[sql]`; custom expressions need
    * it to override `ExpectsInputTypes.inputTypes` (analysis-time type
    * checking). Aliasing from inside the sql package re-exports it. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** `QueryExecutionErrors` is `private[sql]`; custom expressions that
    * reproduce built-in error semantics (SetJaccard's ANSI
    * DIVIDE_BY_ZERO) need the same error class/SQLSTATE the built-in
    * would raise. */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(null)
}
