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

  /** Eagerly convert a Column to a Catalyst expression tree. The lazy
    * `ExpressionUtils.expression` wrapper (ColumnNodeExpression) is opaque
    * to the analyzer when spliced in via the FunctionRegistry, so SQL
    * function registration needs the real converted tree (any remaining
    * UnresolvedFunction nodes resolve during analysis as usual).
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
