package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark has no
    * native type for — read it as a long (nanosAsLong) and truncate to
    * microseconds, matching DuckDB's nanos->micros truncation exactly. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
