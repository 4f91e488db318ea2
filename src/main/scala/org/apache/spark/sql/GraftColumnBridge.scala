package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-package-private Expression ↔ Column converters, so the
  * library can hand custom Catalyst expressions (HyperplaneBands,
  * TopDotIndices, PointInPolygon) to the Column API without requiring session
  * function registration — the standard packaging trick for Spark extension
  * libraries. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
