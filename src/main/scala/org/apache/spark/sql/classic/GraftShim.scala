package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's package-private Column<->Expression conversion
 * (`org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]` in
 * Spark 4.x). The standard pattern for libraries that define native
 * Catalyst expressions and expose them as `Column`s.
 */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
