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

  /** `FieldReference`/`LiteralValue` are `private[sql]` Scala-side (Java
    * connectors see them as public bytecode); the V2 catalog
    * (graft.catalog) needs both — a column reference for
    * `filterAttributes`/`requiredMetadataAttributes` and literal
    * extraction from runtime `_file IN (...)` predicates. */
  def fieldReference(name: String)
      : org.apache.spark.sql.connector.expressions.NamedReference =
    org.apache.spark.sql.connector.expressions.FieldReference.column(name)

  def literalValue(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[Any] = e match {
    case org.apache.spark.sql.connector.expressions.LiteralValue(v, _) =>
      Some(v)
    case _ => None
  }

  /** Catalyst → `sources.Filter` translation (`DataSourceStrategy
    * .translateFilter` is `protected[sql]`): how a user-supplied predicate
    * STRING becomes the pushed-filter form the manifest's zone/partition
    * pruning understands (scoped compaction's admission test). */
  def translateFilter(e: Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  private object Conjuncts
    extends org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    def split(e: Expression): Seq[Expression] = splitConjunctivePredicates(e)
  }

  def splitConjuncts(e: Expression): Seq[Expression] = Conjuncts.split(e)

  /** Build a DataFrame from a raw LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — the construction path for the engine's custom
    * logical operators (graft.plans.AsOfJoinPlan). */
  def dataset(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
