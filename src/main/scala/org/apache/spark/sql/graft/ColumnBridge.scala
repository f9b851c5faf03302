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

  /** Build a DataFrame from a raw LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — the construction path for the engine's custom
    * logical operators (graft.plans.AsOfJoinPlan). */
  def dataset(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
