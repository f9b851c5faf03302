package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** EXACT GLOBAL ORDER STATISTICS WITHOUT A SINGLE-PARTITION WINDOW — the
  * scale path for the exact-quantile tier (q247/q278/q298's global
  * `ntile`/`row_number` windows put the whole table through ONE task; this
  * construction is the drop-in their scaladocs promise).
  *
  * Construction (the classic distributed rank): range-repartition on the
  * total order (RangePartitioner samples split points — one extra
  * sampling pass), sort within partitions, then number rows with
  * `zipWithIndex` (per-partition counts + a prefix-sum offset — one more
  * count job, no data movement). Global rank is EXACT and deterministic
  * whenever the order is total (callers must include a unique tiebreak
  * column): partition boundaries may vary run to run with sampling, but a
  * row's global position never does.
  *
  * Cost at 100 TB: one range shuffle of the ranked projection + two
  * metadata passes — against the single-partition window's one-executor
  * sort of the entire table, which stops being a plan at all. RDD use is
  * deliberate: per-partition ordinal assignment is exactly the imperative
  * hole `zipWithIndex` exists for.
  */
object DistributedRank {

  /** `df` plus a 0-based exact global rank column `out` under the total
    * order `order`. */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
      out: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(2,
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val withIdx = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withIdx, schema)
  }

  /** The bucket `ntile(k)` assigns to 0-based rank `rank0` of `n` rows —
    * the SQL-standard split (the first n mod k buckets take one extra
    * row), as an integer-exact Column so a rank-based construction
    * reproduces the window function bit-for-bit. */
  def ntileOfRank(rank0: Column, n: Long, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val q = n / k
    val r = n % k
    val cut = (q + 1) * r
    when(rank0 < cut, floor(rank0 / (q + 1)) + 1)
      .otherwise(lit(r) + floor((rank0 - cut) / math.max(q, 1L)) + 1)
      .cast("long")
  }
}
