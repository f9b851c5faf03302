package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * At 100 TB a table is pruned through file/row-group min-max statistics; a
  * layout sorted on ONE key gives tight ranges on that key only. Interleaving
  * the bits of two keys into a Z-value and clustering on it bounds BOTH
  * dimensions inside every cluster, so point/range predicates on EITHER key
  * prune files. The whole computation is integer bit arithmetic inside one
  * whole-stage-codegen'd scan followed by a single partial+final aggregate —
  * no joins, no extra shuffle beyond the group-by.
  *
  * Determinism: the Z-value is exact integer math, reproduced operator-for-
  * operator in the DuckDB oracle, so q125 is hash-gated end-to-end.
  * `ZorderSpec` additionally pins the pruning THEOREM: dropping the low
  * 2k bits of the Z-value leaves at most k free low bits per dimension, so
  * every `z >> 10` cell spans at most 32 consecutive values of each key.
  */
object Layout {

  /** Spread the low 31 bits of `c` to the even bit positions 0,2,..,60
    * (classic Morton magic-mask spread: x, x<<16, x<<8, x<<4, x<<2, x<<1
    * with narrowing masks). 31 bits per dimension covers every integer key
    * in the schema (TPC-H partkey reaches 2·10⁵·sf — 16 bits would alias
    * above sf≈0.33 and the per-cell min-max bounds would silently stop
    * holding); the 62-bit z stays positive in a BIGINT in both engines.
    * Pure codegen'd integer ops. */
  private[queries] def spread31(c: Column): Column =
    Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
      .foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
        case (x, (s, mask)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
      }

  /** 62-bit Z-value: bits of `a` on even positions, bits of `b` on odd. */
  def zValue(a: Column, b: Column): Column =
    spread31(a).bitwiseOR(shiftleft(spread31(b), 1))

  /** The same spread as plain SQL, for the DuckDB oracle. */
  private def spreadSql(col: String): String = {
    var x = s"(CAST($col AS BIGINT) & 2147483647)"
    for ((s, mask) <- Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
        1 -> 0x5555555555555555L))
      x = s"(($x | ($x << $s)) & $mask)"
    x
  }

  /** q125: Z-order cells over lineitem (l_partkey ⨉ l_suppkey) with the
    * per-cell min-max statistics a file-pruning layer would persist. Each
    * `z >> 10` cell is a 32×32 tile of key space: the min/max columns SHOW
    * the double-sided prunability the layout buys. */
  def zorderCells(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("cell", shiftright(zValue(col("l_partkey"), col("l_suppkey")), 10))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("part_lo"), max(col("l_partkey")).as("part_hi"),
        min(col("l_suppkey")).as("supp_lo"), max(col("l_suppkey")).as("supp_hi"))

  private val zorderCellsSql = {
    val z = s"(${spreadSql("l_partkey")} | (${spreadSql("l_suppkey")} << 1))"
    s"""SELECT ($z >> 10) AS cell, count(*) AS n,
       |  min(l_partkey) AS part_lo, max(l_partkey) AS part_hi,
       |  min(l_suppkey) AS supp_lo, max(l_suppkey) AS supp_hi
       |FROM lineitem GROUP BY 1""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q125_zorder_cells", zorderCells, Some(zorderCellsSql)))
}
