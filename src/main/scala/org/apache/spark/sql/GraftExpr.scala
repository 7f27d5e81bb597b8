package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ Expression converters, so graft's
  * custom Catalyst expressions ([[graft.functions]]) can be used through the
  * public DataFrame API. This is the sanctioned extension seam for libraries
  * shipping native expressions without a full `SparkSessionExtensions`
  * function-registry round-trip.
  */
object GraftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
