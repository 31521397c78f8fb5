package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions for the
  * engine's custom Catalyst expressions (the supported extension-point
  * idiom: Spark 4 moved these behind sql-package privacy). */
object GraftInterop {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
