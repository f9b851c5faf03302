package graft.plans

import graft.functions.{DotProduct, L2SqLong}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Optimizer rule: rewrite the composable vector folds
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v)
  *   aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v)
  *
  * to the engine's native codegen'd expressions [[DotProduct]] (`dot_d`,
  * array<double>) and [[L2SqLong]] (`l2sq_l`, array<bigint>). The
  * composable form is how a USER naturally writes a dot product or
  * squared distance in SQL, and it is CodegenFallback: interpreted per
  * row, boxed lambda variables, an intermediate array materialized by
  * `zip_with` — the hot loop of any similarity scan at 100 TB. The
  * engine's own queries call the natives directly; this rule gives user
  * queries the same plan without a rewrite on their side (the
  * `LevenshteinBandRule` philosophy).
  *
  * Strictly semantics-preserving, which constrains when it may fire:
  *
  *  - `zip_with` PADS the shorter array with nulls, so unequal lengths
  *    make the whole fold null; the natives fold over min(len). The
  *    rewrite therefore guards with `if (size(a) = size(b)) native else
  *    null` — exactly the original's behavior for non-null elements.
  *  - A null ELEMENT nulls the composable fold but is undefined for the
  *    natives, so the rule only fires when BOTH array types carry
  *    `containsNull = false` — schema-proven safety, no runtime cost.
  *    (Arrays built from non-nullable columns qualify; a raw parquet
  *    read typically does not, matching the natives' documented
  *    non-null-element contract.)
  *  - IEEE multiplication and addition are commutative (bit-exact), so
  *    `x * y` vs `y * x` and `s + v` vs `v + s` all match; the integer
  *    form also accepts `(y - x) * (y - x)` since squaring kills the
  *    sign.
  */
object VectorFoldRule extends Rule[LogicalPlan] {

  /** The two lambda variables of a 2-ary lambda, or None. */
  private def args2(f: LambdaFunction): Option[(NamedLambdaVariable, NamedLambdaVariable)] =
    f.arguments match {
      case Seq(x: NamedLambdaVariable, y: NamedLambdaVariable) => Some((x, y))
      case _ => None
    }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** body == x*y or y*x over exactly the two lambda vars. */
  private def isProduct(body: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = body match {
    case Multiply(l, r, _) =>
      (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
    case _ => false
  }

  /** body == (x-y)*(x-y) or (y-x)*(y-x) — same subtract squared. */
  private def isSqDiff(body: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = body match {
    case Multiply(s1 @ Subtract(l, r, _), s2, _) if s1.semanticEquals(s2) =>
      (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
    case _ => false
  }

  /** merge == s+v or v+s over exactly the two lambda vars. */
  private def isSum(body: Expression, s: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = body match {
    case Add(l, r, _) =>
      (isVar(l, s) && isVar(r, v)) || (isVar(l, v) && isVar(r, s))
    case _ => false
  }

  /** finish == identity (the 3-arg aggregate's implicit finish). */
  private def isIdentity(f: LambdaFunction): Boolean = f.arguments match {
    case Seq(a: NamedLambdaVariable) => isVar(f.function, a)
    case _ => false
  }

  private def nonNullArray(e: Expression, elem: org.apache.spark.sql.types.DataType): Boolean =
    e.dataType match {
      case ArrayType(t, containsNull) => t == elem && !containsNull
      case _ => false
    }

  private def guarded(a: Expression, b: Expression, native: Expression): Expression =
    If(EqualTo(Size(a), Size(b)), native,
      Literal.create(null, native.dataType))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          zw @ ZipWith(a, b, prod: LambdaFunction),
          Literal(zero, zt), merge: LambdaFunction, finish: LambdaFunction)
          if isIdentity(finish) =>
        val dotOk = zt == DoubleType && zero == 0.0d &&
          nonNullArray(a, DoubleType) && nonNullArray(b, DoubleType) &&
          args2(prod).exists { case (x, y) => isProduct(prod.function, x, y) } &&
          args2(merge).exists { case (s, v) => isSum(merge.function, s, v) }
        val l2Ok = zt == LongType && zero == 0L &&
          nonNullArray(a, LongType) && nonNullArray(b, LongType) &&
          args2(prod).exists { case (x, y) => isSqDiff(prod.function, x, y) } &&
          args2(merge).exists { case (s, v) => isSum(merge.function, s, v) }
        if (dotOk) guarded(a, b, DotProduct(a, b))
        else if (l2Ok) guarded(a, b, L2SqLong(a, b))
        else agg
    }
}
