package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: TRANSPARENT MATERIALIZED-VIEW SUBSTITUTION, exact-match
  * tier. A registered view pairs a defining query with a warehouse table
  * holding its result; any later query whose plan CONTAINS the defining
  * subplan (canonicalized — attribute ids and cosmetic aliasing ignored)
  * has that subtree swapped for a scan of the table. The consumer keeps
  * its author-facing shape — `explode(split(text))` + groupBy in the
  * source — and the optimizer silently reads the precomputed aggregate:
  * the corpus scan, the explode, and the aggregation exchange all vanish
  * from the physical plan.
  *
  * Exact-match is the honest first tier of view rewriting (commercial
  * engines and Calcite start exactly here before unifying filters or
  * rolling up aggregates): it already covers the dominant production
  * case — a standard derived table (word counts, per-doc features, daily
  * aggregates) consumed verbatim by many downstream queries.
  *
  * Substitution preserves semantics by construction: the table IS the
  * defining query's result (written by [[register]] from the same plan),
  * output attributes are re-aliased onto the consumer's original exprIds
  * so downstream references resolve unchanged, and datatypes are required
  * to match positionally — on any mismatch the rule declines rather than
  * rewrites. The q204 registry entry grades the rewritten query against
  * the from-scratch DuckDB oracle, so a wrong substitution is a
  * correctness failure, not just a plan diff.
  *
  * Lifecycle: the registry is session-scoped process state keyed by the
  * canonicalized defining plan; `clear()` resets it (tests; Bench passes).
  * Fixed-point safety: the replacement subtree is a table scan whose
  * canonical form cannot equal a registered defining plan (which always
  * computes something), so the rule is idempotent.
  */
object MatViewRule extends Rule[LogicalPlan] {

  private val views = TrieMap.empty[LogicalPlan, String]

  /** Materialize `defining`'s result as warehouse table `table` (overwrite)
    * and register its optimized canonical plan for substitution. */
  def register(spark: SparkSession, defining: DataFrame, table: String): Unit = {
    graft.queries.Warehouse.resetTable(spark, table)
    defining.write.mode("overwrite").saveAsTable(table)
    views.put(defining.queryExecution.optimizedPlan.canonicalized, table)
  }

  /** Drop all registered views (the table data stays; only the rewrite
    * mapping is cleared). */
  def clear(): Unit = views.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (views.isEmpty) return plan
    plan.transformUp {
      case p if !p.isInstanceOf[LeafNode] && p.resolved =>
        views.get(p.canonicalized) match {
          case Some(table) =>
            // A rewrite must never turn an optimization into a failure:
            // if the table can't be read right now (dropped, mid-refresh
            // by a concurrent re-registration, wrong session), DECLINE and
            // let the original plan run — always correct, just unrewritten.
            try {
              // the OPTIMIZED read: this rule fires after the main
              // optimizer batches, so a spliced subtree must arrive
              // already in post-optimization shape (SubqueryAlias
              // eliminated, relation converted) or the planner has no
              // strategy for it
              val rel =
                SparkSession.active.table(table).queryExecution.optimizedPlan
              val ok = rel.output.length == p.output.length &&
                rel.output.zip(p.output).forall { case (n, o) =>
                  n.dataType == o.dataType
                }
              if (!ok) p
              else Project(p.output.zip(rel.output).map { case (o, n) =>
                Alias(n, o.name)(exprId = o.exprId)
              }, rel)
            } catch { case scala.util.control.NonFatal(_) => p }
          case None => p
        }
    }
  }
}
