package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's parquet tables (TESTDATA.md). Every query takes
  * the scale-factor directory as a parameter so identical code runs at
  * sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, unchanged, on a
  * cluster path at any scale: `spark.read.parquet` yields a splittable,
  * column-pruned, filter-pushed scan regardless of file size.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an `events.ts` column to `TimestampType` regardless of how
    * the producer wrote it. Three shapes exist in the wild:
    *
    *  - parquet TIMESTAMP(NANOS): Spark has no nanos type, so with
    *    `spark.sql.legacy.parquet.nanosAsLong` the column arrives as a
    *    `LongType` of nanoseconds — truncate to micros (matching DuckDB's
    *    nanos->micros truncation) and convert.
    *  - parquet timestamp[us] (isAdjustedToUTC=false): Spark resolves it as
    *    `TIMESTAMP_NTZ`. Under the UTC session timezone a cast to
    *    `TimestampType` is value-preserving (same micros), and keeps every
    *    downstream consumer on the single timestamp flavor the engine and
    *    its oracles were built against.
    *  - already `TimestampType`: pass through.
    *
    * Branching on the RESOLVED type (not an assumed file layout) means a
    * producer-side schema change is absorbed here once instead of breaking
    * 35 consumers at analysis time.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val tsCol: Column = df.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected nanos-long, " +
          "TIMESTAMP_NTZ, or TIMESTAMP")
    }
    df.withColumn("ts", tsCol)
  }

  /** Session conf every graft entry point must carry: the legacy
    * nanos-as-long parquet read (a no-op for files that don't use
    * TIMESTAMP(NANOS) — without it Spark REJECTS such files at scan
    * planning). Set once at session construction ([[Verify]], [[Bench]],
    * [[Driver]], [[SparkEntry.entry]], the test harness) so loaders stay
    * side-effect-free. */
  val sessionConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** `events` loader: normalize `ts` by its resolved type via
    * [[normalizeTs]]. Assumes [[sessionConf]] was applied at session
    * construction (all graft entry points do). */
  private def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
}
