package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded `levenshtein(a, b) <= k` predicates to
  * the banded form
  *
  *   |length(a) - length(b)| <= k  AND  0 <= levenshtein(a, b, k) <= k
  *
  * Unbounded levenshtein fills the full O(|a|·|b|) matrix per pair; the
  * threshold variant works in an O(|a|·k) band and early-exits above k, and
  * the length band eliminates most pairs before any matrix work. Equivalent
  * for all inputs: edit distance >= length difference, and the thresholded
  * form returns -1 exactly when the true distance exceeds k (nulls propagate
  * to null in both forms, which filters identically).
  *
  * In a blocked self-join dedup at 100 TB (SURVEY.md §2.2b, q76) this is the
  * difference between the join being compute-bound on string matrices and
  * being scan-bound. Installed through `GraftExtensions.injectOptimizerRule`,
  * so any user predicate — SQL or DataFrame — gets the rewrite.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Expression): Expression = {
    val lev = Levenshtein(a, b, Some(k))
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k),
      And(GreaterThanOrEqual(lev, Literal(0, IntegerType)),
        LessThanOrEqual(lev, k)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_COMPARISON)) {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
        banded(a, b, k)
      case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
        banded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k > 0 =>
        banded(a, b, Literal(k - 1, IntegerType))
    }
}
