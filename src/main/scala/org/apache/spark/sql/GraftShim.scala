package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the package-private classic Column<->Expression
  * converters, so graft's native Catalyst expressions can surface as
  * `Column`s (the supported pattern for libraries extending Catalyst).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
