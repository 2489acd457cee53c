package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression converters. Spark 4 moved these behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so this
  * one-file bridge lives under org.apache.spark.sql — the standard pattern
  * for extension libraries that add native Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
