package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql package so graft's custom Catalyst Expressions can be
  * exposed as user-facing Columns (Spark 4 moved Column off Expression; the
  * converter lives behind `private[sql]`). Standard extension-library
  * pattern — uses only code shipped in the public Spark distribution.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
