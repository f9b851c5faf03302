package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point, installed via
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  *
  * Registers the engine's native expressions with the session's function
  * registry so they are usable from `expr(...)` / `spark.sql(...)` exactly
  * like built-ins, and participate in whole-stage codegen; also injects the
  * engine's optimizer rules (`graft.plans.LevenshteinBandRule`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_d"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_d takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
