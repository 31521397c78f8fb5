package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions for the
  * engine's custom Catalyst expressions (the supported extension-point
  * idiom: Spark 4 moved these behind sql-package privacy). */
object GraftInterop {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column→catalyst conversion. `expression` returns a LAZY
    * `ColumnNodeExpression` wrapper that is not serializable — fine inside
    * operators the analyzer rewrites, fatal when stored in a custom plan
    * node whose fields ship to executors. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
