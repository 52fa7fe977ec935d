package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst Expressions and the public Column API.
  *
  * Spark 4's Column wraps a ColumnNode rather than an Expression, and the
  * converter (classic.ExpressionUtils) is private[sql]; this shim exposes
  * just the two conversions — the same approach used by public Spark
  * extension libraries.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
