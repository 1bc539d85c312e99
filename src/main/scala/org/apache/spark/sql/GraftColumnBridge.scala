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

  /** Materialize what a SparkSessionExtensions instance would inject —
    * `buildOptimizerRules`/`buildPlannerStrategies` are private[sql], and
    * a shared-JVM test suite can't build a fresh session per extensions
    * object, so specs assert the injection list through this. */
  def builtOptimizerRules(e: SparkSessionExtensions, s: SparkSession): Seq[
      org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    e.buildOptimizerRules(s)
  def builtStrategies(e: SparkSessionExtensions, s: SparkSession): Seq[
      org.apache.spark.sql.execution.SparkStrategy] =
    e.buildPlannerStrategies(s)
}
