package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column construction: lets the engine expose
  * its native Catalyst expressions (graft.functions.*) as plain `Column`s
  * without requiring the session to be built with GraftExtensions —
  * queries then work in ANY session (the driver builds its own). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
