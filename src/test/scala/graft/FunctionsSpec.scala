package graft

import graft.functions.dot_d
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct expression: bit-parity with the composable
  * higher-order-function form, null semantics, SQL registration via
  * GraftExtensions, and codegen participation. */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val fold =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  test("dot_d is bit-identical to the aggregate(zip_with) fold") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(64)((
      Array.fill(33)(rnd.nextDouble() * 2 - 1),
      Array.fill(33)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(dot_d($"a", $"b").as("native"), expr(fold).as("folded"))
    assert(df.where($"native" =!= $"folded").count() == 0)
    assert(df.count() == 64)
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(dot_d($"a", $"b")).head.isNullAt(0))
  }

  test("dot_d is registered in SQL via GraftExtensions") {
    val r = spark.sql("SELECT dot_d(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d")
    assert(r.head.getDouble(0) == 32.0)
  }

  test("dot_d stays inside whole-stage codegen") {
    // non-foldable input (else the optimizer constant-folds the whole thing)
    val df = spark.range(10)
      .select(array($"id".cast("double"), lit(2.0)).as("v"))
      .select(dot_d($"v", $"v").as("d"))
    val p = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("codegen id"), p) // inside a WholeStageCodegen subtree
    assert(df.collect().map(_.getDouble(0)).sum > 0)
  }
}
