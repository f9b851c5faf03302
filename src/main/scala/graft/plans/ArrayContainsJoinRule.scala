package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.types.ArrayType

/** Optimizer rule: turn a join whose only cross-side predicate is
  * `array_contains(arrSide.arr, keySide.key)` into an EQUI join against the
  * exploded (distinct) array elements:
  *
  *   a JOIN b ON array_contains(b.arr, a.key)
  *     ==>  a JOIN (b GENERATE explode(array_distinct(arr)) AS __p)
  *            ON a.key = __p
  *
  * Without an equi key Catalyst can only plan such a join as a
  * (Broadcast)NestedLoopJoin — every row of one side tests every row of the
  * other, O(n·m) comparisons. The rewrite gives the planner a hash key, so
  * the same join becomes a Broadcast/SortMerge HASH join: the multi-probe
  * IVF lesson (q107, where the probe-list join is written in exploded form
  * by hand) generalized to any user query, the same way
  * [[LevenshteinBandRule]] generalizes the banded-threshold rewrite.
  *
  * Semantics are preserved exactly:
  *  - `array_distinct` keeps one row per element, so duplicate elements
  *    cannot duplicate join pairs;
  *  - a NULL array explodes to zero rows; `array_contains(NULL, k)` is NULL
  *    (filtered) — same outcome;
  *  - a NULL element yields `key = NULL` -> NULL (filtered);
  *    `array_contains` never returns TRUE on the strength of a NULL element
  *    — same outcome;
  *  - a NULL key matches nothing in either form.
  *
  * Fires only when no other conjunct already supplies a cross-side equi key
  * (with one, Catalyst hash-joins on it and evaluates `array_contains` as a
  * cheap post-filter — exploding would only multiply the build side), and
  * only for Inner joins and LeftSemi with the array on the right (a
  * left-side explode would duplicate semi-join output rows).
  */
object ArrayContainsJoinRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithPruning(_.containsPattern(TreePattern.JOIN)) {
      case j @ Join(left, right, jt, Some(cond), hint)
          if j.resolved && (jt == Inner || jt == LeftSemi) =>
        val cs = conjuncts(cond)
        // Equality matches both `=` and `<=>`: an EqualNullSafe cross-side
        // key is just as usable by the hash-join planner, so it must
        // suppress the rewrite too (exploding would only multiply rows)
        val crossEqui = cs.exists {
          case Equality(l, r) =>
            val (lr, rr) = (l.references, r.references)
            (lr.subsetOf(left.outputSet) && rr.subsetOf(right.outputSet) &&
              lr.nonEmpty && rr.nonEmpty) ||
              (lr.subsetOf(right.outputSet) && rr.subsetOf(left.outputSet) &&
                lr.nonEmpty && rr.nonEmpty)
          case _ => false
        }
        val candidate =
          if (crossEqui) None
          else cs.collectFirst {
            // array on the RIGHT, key on the LEFT (valid for Inner + semi)
            case ac @ ArrayContains(arr, key)
                if ac.deterministic &&
                  arr.references.nonEmpty &&
                  arr.references.subsetOf(right.outputSet) &&
                  key.references.nonEmpty &&
                  key.references.subsetOf(left.outputSet) =>
              (ac, arr, key, true)
            // array on the LEFT, key on the RIGHT (Inner only)
            case ac @ ArrayContains(arr, key)
                if jt == Inner && ac.deterministic &&
                  arr.references.nonEmpty &&
                  arr.references.subsetOf(left.outputSet) &&
                  key.references.nonEmpty &&
                  key.references.subsetOf(right.outputSet) =>
              (ac, arr, key, false)
          }
        candidate match {
          case Some((ac, arr, key, arrOnRight)) =>
            val et = arr.dataType.asInstanceOf[ArrayType].elementType
            val probe = AttributeReference("__graft_probe", et)()
            def exploded(child: LogicalPlan): LogicalPlan =
              Generate(Explode(ArrayDistinct(arr)), unrequiredChildIndex = Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(probe), child = child)
            val rest = cs.filterNot(_ eq ac)
            val newCond = (EqualTo(key, probe) +: rest).reduce(And)
            val newJoin =
              if (arrOnRight)
                Join(left, exploded(right), jt, Some(newCond), hint)
              else Join(exploded(left), right, jt, Some(newCond), hint)
            // semi-join output is left.output already; inner must drop __p
            if (jt == LeftSemi) newJoin
            else Project(j.output, newJoin)
          case None => j
        }
    }
}
