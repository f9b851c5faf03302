package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native squared-L2 distance over two `array<bigint>` columns — the
  * integer sibling of [[DotProduct]], for the engine's fixed-point
  * quantized vector space (floor(x·2^20) components, q179/q181/q184):
  * Σ (a_i − b_i)², exact in int64 up to |Δ| ≤ 2^21 per component over
  * ≤ 2^15 dimensions (the quantized-embedding envelope, 2^57 < 2^63).
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)),
  * 0L, (acc,x) -> acc+x)` — is CodegenFallback (interpreted per row,
  * boxed lambda variables) and materializes an intermediate array per
  * row. Iterative fitters (greedy k-center, k-means) evaluate a distance
  * per row PER ROUND, so this is their hot loop: a tight codegen'd
  * subtract-multiply-accumulate with no allocation keeps every round
  * inside whole-stage codegen. Integer arithmetic is associative — no
  * accumulation-order caveat at all, unlike the double fold.
  *
  * Null semantics: null if either array is null, and null on a LENGTH
  * MISMATCH — exactly what the composable form produces (`zip_with` pads
  * the short side with nulls, the lambda turns those into null elements,
  * and the fold's `acc + null` nulls the sum). The expression is
  * user-callable SQL (`l2sq_l`), so the equivalence must hold at the
  * expression itself, not only under `VectorFoldRule`'s size-guarded
  * rewrite — a silent truncated sum here would diverge from the
  * documented fold for any direct caller. Elements assumed non-null
  * (quantized vectors), matching the composable form otherwise.
  */
case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression {

  // mismatch → null even when both inputs are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "l2sq_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $x.getLong($i) - $y.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqLong =
    copy(left = newLeft, right = newRight)
}
