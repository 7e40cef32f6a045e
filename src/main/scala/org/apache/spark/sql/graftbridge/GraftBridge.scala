package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made Column backend-agnostic and
  * hid the classic Expression conversions behind `private[sql]`; extension
  * libraries conventionally reach them from an org.apache.spark.sql
  * subpackage (same pattern as spark-connectors in the wild).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly CONVERT the column's node tree to a Catalyst expression
    * (ExpressionUtils.expression only wraps it in a lazy
    * ColumnNodeExpression, which stays Unevaluable if it reaches
    * execution unconverted — e.g. when a function-registry builder
    * returns it into an analyzed plan). Needed for UDAF applications. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
