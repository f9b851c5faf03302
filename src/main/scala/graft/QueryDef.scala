package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named, oracle-checked query — the unit of the driver's correctness
  * gate (see `SparkEntry`). `oracle` is ANSI SQL that DuckDB runs over the
  * same parquet tables; `None` means the driver falls back to a weaker
  * rows-only check (reserved for ops whose semantics SQL can't express).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Determinism helpers for oracle-differential testing.
  *
  * Double aggregation is order-sensitive at the ULP level, and Spark and
  * DuckDB will not accumulate partitions in the same order — so any plain
  * `sum(double)` would hash-mismatch the oracle. Instead we route every
  * double aggregate through an exact DECIMAL sum and cast the final result
  * back to double: both engines then produce bit-identical values.
  *
  * Scale choice: the generator writes the raw parquet doubles with at most
  * 2 decimal digits, so casting a *raw column* to DECIMAL(_,2) is exact
  * (the stored double is within ~1e-12 of the true 2-dp value, far from any
  * rounding boundary). A *product of two raw columns* is exact at 4 dp, so
  * those are cast to DECIMAL(_,4). Never round/decimal-cast an arbitrary
  * computed double — its true value can sit on a rounding boundary where the
  * engines' double->decimal conversions legitimately disagree.
  */
object Exact {
  /** Exact sum of a raw <=2-decimal double column. */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a product of two raw <=2-decimal double columns. */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(27, 4))).cast("double")

  /** Exact average of a raw <=2-decimal double column (exact sum, then one
    * IEEE division — identical in both engines). */
  def davg2(c: Column): Column = dsum2(c) / count(lit(1))

  // DuckDB-side equivalents (string templates for oracle SQL).
  def sqlSum2(e: String): String = s"CAST(sum(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlSum4(e: String): String = s"CAST(sum(CAST($e AS DECIMAL(27,4))) AS DOUBLE)"
  def sqlAvg2(e: String): String = s"${sqlSum2(e)} / count(*)"
}
