package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils` is private[sql] in
  * Spark 4 after the Connect split). Standard extension-library
  * pattern: this file lives in the Spark package purely to re-export
  * the two conversions graft's custom expressions need. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
