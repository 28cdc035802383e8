package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for exposing graft's custom Catalyst expressions as Columns.
  * Lives in the org.apache.spark.sql package because Expression→Column
  * wrapping (ExpressionUtils.column) is private[sql] — the standard
  * pattern for third-party expression libraries that ship native
  * codegen'd expressions rather than UDFs. */
object graftexpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
