package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function surface over the `events` table: ranking (top-k per
  * group), running aggregates, lag/lead deltas, bounded frames. Window order
  * is always (ts, event_id) so ties can't make results partition-dependent.
  * Running double sums go through DECIMAL frames (see `Exact`) for oracle
  * bit-parity. Partitioning is by `user_id` — at 100 TB this shuffles once
  * on the window key, which is the minimum any engine can do.
  */
object Windows {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  private val byUserTs = Window.partitionBy(col("user_id"))
    .orderBy(col("ts").asc, col("event_id").asc)

  /** Top-3 events per user by value (rank + filter — the scalable top-k).
    * `value IS NOT NULL` is pinned on both sides: Spark and DuckDB agree
    * on nulls-last for DESC today, but the q153 aggregate twin excludes
    * nulls by construction, and all three must rank the same row set. */
  def topEventsPerUser(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .where(col("value").isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id").asc)).cast("long"))
      .where(col("rn") <= 3)
      .select(col("event_id"), col("user_id"), col("value"), col("rn"))

  /** Running (cumulative) sum of value per user in time order. */
  def runningValue(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(18, 2)))
          .over(byUserTs.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running"))

  /** Delta to the previous event of the same user (IEEE-exact subtraction). */
  def valueDelta(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"), col("user_id"),
        (col("value") - lag(col("value"), 1).over(byUserTs)).as("delta"))

  /** Trailing 3-row moving average (exact decimal sum / frame count). */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val frame = byUserTs.rowsBetween(-2, Window.currentRow)
    events(spark, dir)
      .select(col("event_id"), col("user_id"),
        (sum(col("value").cast(DecimalType(18, 2))).over(frame).cast("double") /
          count(lit(1)).over(frame)).as("mov_avg"))
  }

  /** Full ranking-function surface in one pass: rank, dense_rank, ntile,
    * percent_rank, cume_dist. Order key (value desc, event_id) is unique so
    * every function is deterministic and the ratio functions are a single
    * IEEE division in both engines. */
  def rankingFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    events(spark, dir).select(col("event_id"), col("user_id"), col("value"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
  }

  /** q119: the frame-spec surface the other window queries don't touch —
    * a true RANGE frame (trailing 1 hour by event time: the frame is
    * VALUE-bounded, so each row aggregates a data-dependent row count) and
    * the navigation functions first/nth/last over ROWS frames. Range
    * frames include order-value PEERS wholesale, so only tie-safe
    * AGGREGATES run over the range frame (sum/count are peer-order
    * independent); the navigation functions run over ROWS frames keyed by
    * the unique (ts, event_id) order, where their row choice is exact.
    * Both engines compute the range key as epoch millis, so peer groups
    * are identical by construction. One shuffle on user_id, like every
    * window here. */
  def frameSpecs(spark: SparkSession, dir: String): DataFrame = {
    val wr = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    val wf = byUserTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = byUserTs.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    events(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(18, 2))).over(wr)
          .cast("double").as("hr_sum"),
        count(lit(1)).over(wr).as("hr_n"),
        first(col("value")).over(wf).as("first_val"),
        nth_value(col("value"), 2).over(wf).as("second_val"),
        last(col("value")).over(wl).as("last_val"))
  }

  private val frameSpecsSql =
    """SELECT event_id, user_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER wr AS DOUBLE) AS hr_sum,
      |  count(*) OVER wr AS hr_n,
      |  first_value(value) OVER wf AS first_val,
      |  nth_value(value, 2) OVER wf AS second_val,
      |  last_value(value) OVER wl AS last_val
      |FROM events
      |WINDOW
      |  wr AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW),
      |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wl AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin

  /** q132: per-priority SKYLINE (Pareto frontier) of orders maximizing
    * (price, recency) — the dominance query (best-tradeoff shortlists,
    * non-dominated configurations). The O(n²) dominance anti-join is
    * replaced by the 2-D window formulation: sorted by price within the
    * group, an order is dominated iff a STRICTLY-higher-priced order is at
    * least as recent (running max over the strict-predecessor RANGE frame)
    * or an equal-priced one is strictly more recent (group max over the
    * price peers) — one shuffle on the group key, linear scan, no pair
    * space. Price compares as exact integer cents (round, not cast-
    * truncate: the *100 product carries float noise in 2% of rows and the
    * two engines truncate differently, but never near a half). Both max
    * frames are tie-safe (RANGE frames include order-value peers). */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderdate"))
    val wStrict = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cents").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wPeer = Window.partitionBy(col("o_orderpriority"), col("cents"))
    cents
      .withColumn("dx", max(col("o_orderdate")).over(wStrict))
      .withColumn("dp", max(col("o_orderdate")).over(wPeer))
      .where((col("dx").isNull || col("dx") < col("o_orderdate")) &&
        col("dp") === col("o_orderdate"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("cents"),
        col("o_orderdate"))
  }

  private val skylineSql =
    """SELECT o_orderpriority, o_orderkey, cents, o_orderdate FROM (
      |  SELECT o_orderpriority, o_orderkey, cents, o_orderdate,
      |    max(o_orderdate) OVER (PARTITION BY o_orderpriority
      |      ORDER BY cents DESC
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dx,
      |    max(o_orderdate) OVER (
      |      PARTITION BY o_orderpriority, cents) AS dp
      |  FROM (
      |    SELECT o_orderpriority, o_orderkey,
      |      CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderdate
      |    FROM orders) t) s
      |WHERE (dx IS NULL OR dx < o_orderdate) AND dp = o_orderdate""".stripMargin

  /** q153: q30's per-user top-3 through the engine's NATIVE top-k
    * AGGREGATE (`graft.functions.TopKPairs`, a TypedImperativeAggregate)
    * instead of the window. The semantic twin is the point: the window
    * form must shuffle and sort EVERY event row (no partial step exists
    * for `row_number`); the aggregate form is mergeable, so map-side
    * partial aggregation reduces each partition to ≤ k pairs per user
    * BEFORE the exchange and the shuffle carries |users|·k pairs at any
    * corpus size. Same (value desc, event_id) total order, same DuckDB
    * oracle as q30 — the two implementations can never drift.
    *
    * NULL contract, made explicit on every side: `TopKPairs` EXCLUDES
    * null scores (a null can't participate in a desc ranking without an
    * engine-specific nulls-order convention), so the query filters
    * `value IS NOT NULL` and the oracle pins the same predicate — the
    * testdata has no null values today, but without the pin a future
    * regeneration with nulls would silently diverge from the window
    * form's nulls-last placement. q30 carries the identical pin. */
  def topEventsPerUserNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).where(col("value").isNotNull)
    graft.functions.GraftExtensions.registerTopK(ev.sparkSession)
    ev.groupBy(col("user_id"))
      .agg(expr("top_k_pairs(value, event_id, 3)").as("tk"))
      .select(col("user_id"), posexplode(col("tk")))
      .select(col("col.id").as("event_id"), col("user_id"),
        col("col.score").as("value"), (col("pos") + 1).cast("long").as("rn"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q132_skyline", skyline, Some(skylineSql)),
    QueryDef("q153_topk_native", topEventsPerUserNative, Some(
      """SELECT event_id, user_id, value, rn FROM (
        |  SELECT event_id, user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL) t
        |WHERE rn <= 3""".stripMargin)),
    QueryDef("q119_window_frames", frameSpecs, Some(frameSpecsSql)),
    QueryDef("q30_window_topk", topEventsPerUser, Some(
      """SELECT event_id, user_id, value, rn FROM (
        |  SELECT event_id, user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL) t
        |WHERE rn <= 3""".stripMargin)),
    QueryDef("q31_window_running", runningValue, Some(
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM events""".stripMargin)),
    QueryDef("q32_window_lag", valueDelta, Some(
      """SELECT event_id, user_id,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events""".stripMargin)),
    QueryDef("q33_window_movavg", movingAvg, Some(
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin)),
    QueryDef("q34_window_ranks", rankingFuncs, Some(
      """SELECT event_id, user_id, value,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)""".stripMargin)))
}
