package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column-level API for the engine's native expressions. Works in any
  * session; `GraftExtensions` additionally exposes them to SQL text. */
package object functions {

  /** Dot product of two `array<double>` columns (codegen'd, allocation-free;
    * bit-identical to the `aggregate(zip_with(...))` fold). */
  def dot_d(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
