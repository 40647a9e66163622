package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column ⇄ Expression conversions —
  * the supported seam for libraries shipping native Catalyst expressions
  * (Spark 4 moved Column onto ColumnNode; `classic.ExpressionUtils` is the
  * conversion point).
  */
package object graftbridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
