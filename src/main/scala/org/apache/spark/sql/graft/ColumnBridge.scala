package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for Spark 4 (the Column class no longer
  * exposes `.expr`; `ExpressionUtils` is `private[sql]`). Lives in
  * the `org.apache.spark.sql` namespace for access — the standard
  * pattern for libraries that define native Catalyst expressions.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
