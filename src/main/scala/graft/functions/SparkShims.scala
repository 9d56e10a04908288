package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column<->Expression conversion (Spark 4 moved
  * it behind `classic.ExpressionUtils`). Compiled into the sql package —
  * the standard pattern for libraries shipping custom Catalyst
  * expressions without a SparkSessionExtensions registration round-trip.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
