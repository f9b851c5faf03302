package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native intersection of two SORTED-ASCENDING, DISTINCT `array<long>`
  * columns (the adjacency-list shape `sort_array(collect_set/list(...))`
  * produces).
  *
  * `array_intersect` is general: per input row it builds a hash set over
  * one side, probes the other, and carries null/NaN bookkeeping. On the
  * triangle-closing path that is the hot loop — one intersection per
  * oriented edge, Σ outdeg² probed elements total (41M at sf0.1, corpus
  * ×√m at 100 TB) — and the per-row hash-set allocation dominates. Both
  * adjacency arrays are already sorted and distinct, so a two-pointer
  * merge does the same work allocation-free (one primitive result buffer,
  * no hashing) and stays inside whole-stage codegen.
  *
  * CONTRACT: both inputs sorted ascending with distinct, non-null
  * elements — the caller's job (this is an engine-internal expression,
  * not a user surface). Under that contract the result is exactly
  * `array_intersect(a, b)`: the common elements in ascending order,
  * which IS left order for a sorted left side. Null semantics: null if
  * either array is null, matching `array_intersect`.
  */
case class SortedIntersectLong(left: Expression, right: Expression)
    extends BinaryExpression {

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

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sorted_intersect_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val out = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { out(k) = xv; k += 1; i += 1; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val buf = ctx.freshName("buf")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |long[] $buf = new long[java.lang.Math.min($n, $m)];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $buf[$k++] = $xv; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectLong =
    copy(left = newLeft, right = newRight)
}
