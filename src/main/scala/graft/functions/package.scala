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

  /** Squared-L2 distance of two `array<bigint>` columns (codegen'd,
    * allocation-free, exact integer — identical to the
    * `aggregate(zip_with(...))` fold for quantized vectors). */
  def l2sq_l(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Intersection of two sorted-ascending distinct `array<bigint>` columns
    * (codegen'd two-pointer merge, no per-row hash set — identical result
    * to `array_intersect` under that input contract). */
  def sorted_intersect_l(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Distributed Bloom-filter build over a `long` column — Spark's native
    * `BloomFilterAggregate` (partial aggregates merged by bit-OR; the same
    * expression runtime join filtering uses). Returns ONE binary row.
    * Sizing mirrors `BloomFilter.create(expectedItems, fpp)`. */
  def bloom_filter_agg(h: Column, expectedItems: Long, fpp: Double): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(h),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Codegen'd Bloom-filter membership probe of a `long` column against a
    * CONSTANT serialized filter (the analyzer requires the filter side be
    * foldable — pass `lit(bytes)` of a collected [[bloom_filter_agg]]). */
  def might_contain(bloom: Column, h: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(bloom), ColumnBridge.expression(h)))
}
