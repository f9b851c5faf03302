package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping over `events`: resampling onto a regular grid with
  * gap-fill, and forward-fill of missing buckets. The spine (types × hours)
  * is generated from two tiny aggregates and broadcast — the fact scan
  * stays the only big input, so the shape is one shuffle (the groupBy on
  * (type, hour)) at any scale.
  */
object TimeSeries {
  import Exact._

  private def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("value"))

  /** Regular hourly grid per event type, empty buckets zero-filled.
    * `sequence(min,max,interval)` runs on a 1-row aggregate; the spine
    * (types × hours) is a broadcast cross join — never a shuffle. */
  def resample(spark: SparkSession, dir: String): DataFrame = {
    val ev = hourly(spark, dir)
    val agg = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"))
    val hours = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
    val types = ev.select(col("event_type")).distinct()
    types.crossJoin(broadcast(hours))
      .join(agg, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  private val resampleSql =
    """WITH ev AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, value FROM events),
      |agg AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2),
      |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
      |hours AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 hour)) AS h FROM b),
      |types AS (SELECT DISTINCT event_type FROM ev)
      |SELECT t.event_type, hours.h AS hour, coalesce(a.n, 0) AS n
      |FROM types t CROSS JOIN hours
      |LEFT JOIN agg a ON a.event_type = t.event_type AND a.h = hours.h""".stripMargin

  /** Forward fill: hourly summed value per type; hours with no events carry
    * the last observed hour's sum (`last(..., ignoreNulls)` over an
    * unbounded-preceding frame — one pass after the spine join). */
  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = hourly(spark, dir)
    val agg = ev.groupBy(col("event_type"), col("h"))
      .agg(dsum2(col("value")).as("v"))
    val hours = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
    val types = ev.select(col("event_type")).distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    types.crossJoin(broadcast(hours))
      .join(agg, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("hour"),
        last(col("v"), ignoreNulls = true).over(
          Window.partitionBy(col("event_type")).orderBy(col("h").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("v_filled"))
  }

  private val forwardFillSql =
    s"""WITH ev AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h, value FROM events),
       |agg AS (
       |  SELECT event_type, h, ${sqlSum2("value")} AS v FROM ev GROUP BY 1, 2),
       |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
       |hours AS (
       |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 hour)) AS h FROM b),
       |types AS (SELECT DISTINCT event_type FROM ev)
       |SELECT t.event_type, hours.h AS hour,
       |  last_value(a.v IGNORE NULLS) OVER (
       |    PARTITION BY t.event_type ORDER BY hours.h
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
       |FROM types t CROSS JOIN hours
       |LEFT JOIN agg a ON a.event_type = t.event_type AND a.h = hours.h""".stripMargin

  // ---- q101: statistical anomaly detection (z-score outliers) ------------

  /** Per-type z-score outlier detection — the monitoring pass of an event
    * pipeline: flag events more than 3σ from their type's mean. The
    * moments are computed EXACTLY (decimal-cast sums of the 2-dp values
    * and their 4-dp squares — the `graft.Exact` technique, immune to
    * float aggregation order), and the 3σ TEST itself is exact integer
    * arithmetic: with xi = 100·value and integer moments s1 = Σxi,
    * s2 = Σxi², the predicate (n·xi − s1)² > 9·(n·s2 − s1²) is
    * (value−mean)² > 9·variance with both sides scaled by (100n)² — no
    * sqrt (libm, non-portable) and no division to double anywhere in the
    * flag, so the flagged row set is engine-exact at ANY sum magnitude.
    * The variance>0 guard is the exact n·s2 − s1² > 0 (a constant group is
    * exactly 0, never an ulp below). The emitted mean/variance are doubles
    * derived from the exact sums through an identical IEEE expression tree
    * in both engines. One partial-agg shuffle over |event_types| groups;
    * the stats broadcast back onto the scan. */
  def anomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val d2 = col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
    // xi = value scaled to an exact integer (2-dp * 100). The 3σ PREDICATE
    // runs entirely on integer moments of xi — (n·xi − s1)² > 9·(n·s2 − s1²)
    // is the σ test with both sides multiplied by n² (and by 100² via the
    // scaling), so no division-to-double happens before the comparison and
    // the flagged row set cannot diverge cross-engine even when the scaled
    // sums grow beyond double's 2^53 integer window. Spark side: products
    // via DECIMAL(19,0)/(38,0) (exact up to 10^38); DuckDB side: HUGEINT
    // (exact int128) — magnitudes stay ~10^22 at any realistic per-type
    // count, far inside both. The emitted mean/variance stay derived from
    // the decimal sums through the identical single-IEEE-op expression tree
    // in both engines, as before.
    val xi = (d2 * 100).cast("long")
    val mean = col("s1").cast("double") / col("n")
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(d2).as("s1"), sum(d2 * d2).as("s2"),
        sum(xi).as("s1i"), sum(xi * xi).as("s2i"))
      .select(col("event_type"), col("n"), mean.as("mean"),
        (col("s2").cast("double") / col("n") - mean * mean).as("variance"),
        col("s1i"), col("s2i"))
    val nD = col("n").cast(org.apache.spark.sql.types.DecimalType(19, 0))
    val dev = nD * col("xi").cast(org.apache.spark.sql.types.DecimalType(19, 0)) -
      col("s1i").cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val varN2 = nD * col("s2i").cast(org.apache.spark.sql.types.DecimalType(19, 0)) -
      col("s1i").cast(org.apache.spark.sql.types.DecimalType(19, 0)) *
        col("s1i").cast(org.apache.spark.sql.types.DecimalType(19, 0))
    ev.withColumn("xi", xi)
      .join(broadcast(stats), "event_type")
      .where(varN2 > 0 && dev * dev > varN2 * 9)
      .select(col("event_id"), col("event_type"), col("value"),
        col("mean"), col("variance"))
  }

  private val anomaliesSql =
    """WITH s AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(value AS DECIMAL(12,2))) AS s1,
      |    sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS s2,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS s1i,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS s2i
      |  FROM events GROUP BY event_type),
      |st AS (
      |  SELECT event_type, n,
      |    CAST(s1 AS DOUBLE) / n AS mean,
      |    CAST(s2 AS DOUBLE) / n
      |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS variance,
      |    s1i, s2i
      |  FROM s)
      |SELECT event_id, event_type, value, mean, variance FROM (
      |  SELECT e.event_id, e.event_type, e.value, st.mean, st.variance,
      |    CAST(st.n AS HUGEINT) * CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      - CAST(st.s1i AS HUGEINT) AS dev,
      |    CAST(st.n AS HUGEINT) * CAST(st.s2i AS HUGEINT)
      |      - CAST(st.s1i AS HUGEINT) * CAST(st.s1i AS HUGEINT) AS varn2
      |  FROM events e JOIN st ON e.event_type = st.event_type) t
      |WHERE varn2 > 0 AND dev * dev > varn2 * 9""".stripMargin

  /** q190: exponentially-decayed counts — the trending/monitoring
    * primitive (recency-weighted activity per key, half-life = 1 day):
    * score(type) = Σ_days count(type, day) · 2^(day − newest_day). Every
    * weight is a POWER OF TWO, which is the whole determinism design:
    * 2^(−k) is exactly representable, each product count·2^(−k) is exact
    * in double (counts ≪ 2^53), and over the 20-day trending window the
    * sum has common denominator 2^20 with an integer numerator below
    * 2^53 for any count total under 2^33 — so the accumulation is EXACT
    * and order-independent, where any other decay base (or an unbounded
    * window, whose numerator needs max-age bits) would make the sum
    * partition-order-dependent and break the cross-engine gate (the
    * q165 sqrt lesson applied to decay). The window is also the
    * semantics: trending is recency by definition, and 2^-20 ≈ 1e-6
    * is already noise weight.
    *
    * Plan shape: one map-side-combined (type, day) aggregation, the
    * 1-row newest-day anchor broadcast back, and a |types|-row final
    * reduce. The decayed score is an incremental-maintenance-friendly
    * quantity: tomorrow's score = today's · 2^(−Δdays) + new counts —
    * the same monoid-merge property the q120/q188 incremental tier is
    * built on. */
  def decayedCounts(spark: SparkSession, dir: String): DataFrame =
    decayFromDaily(Tables(spark, dir, "events")
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("n")))

  /** The decay arithmetic over a (event_type, d, n) daily-count table —
    * shared by the batch query and its STREAMING twin (q191), so the two
    * can never drift: anchor at the newest day, window to 20 days,
    * exact power-of-two weighted sum. */
  private[graft] def decayFromDaily(daily: DataFrame): DataFrame = {
    val anchor = daily.agg(max(col("d")).as("dmax"))
    daily.crossJoin(broadcast(anchor))
      .select(col("event_type"), col("n"),
        expr("CAST(datediff(dmax, d) AS BIGINT)").as("age"))
      .where(col("age") <= 20)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_window"),
        sum(expr("CAST(n AS DOUBLE) * power(CAST(2.0 AS DOUBLE), CAST(-age AS DOUBLE))"))
          .as("decayed"))
  }

  private[graft] val decayedCountsSql =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |anchor AS (SELECT max(d) AS dmax FROM daily)
      |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_window,
      |  sum(CAST(n AS DOUBLE)
      |      * power(CAST(2.0 AS DOUBLE),
      |              CAST(-date_diff('day', d, dmax) AS DOUBLE))) AS decayed
      |FROM daily, anchor
      |WHERE date_diff('day', d, dmax) <= 20
      |GROUP BY event_type""".stripMargin

  // ---- q238: A/B experiment analysis --------------------------------------

  /** q238: A/B TEST — the two-proportion z-test every experimentation
    * platform runs, in EXACT integer arithmetic. Unit of analysis is the
    * USER (assignment by `user_id` parity — a deterministic hash-bucket
    * stand-in), outcome is "ever purchased"; the per-user collapse is the
    * step naive event-level tests get wrong (within-user correlation).
    * The pooled z² statistic is a ratio of integer polynomials in
    * (x1, n1, x2, n2):  z² = (x1·n2 − x2·n1)²·N / (n1·n2·x·(N−x)),
    * reported in parts-per-million via the q211 DECIMAL(38,0)/HUGEINT
    * discipline — no IEEE division or sqrt crosses engines, and the
    * significance verdict is an integer compare against the χ²₁ 95%
    * critical value (3.841459). Exactness bound: the ppm numerator caps
    * DECIMAL38/HUGEINT around ~10⁶ users per arm — beyond that drop the
    * ppm factor a digit (the verdict needs no six-decimal z²).
    *
    * At 100 TB: one user-keyed aggregate (map-side partials collapse the
    * event stream), then a single-row reduction — the same two-shuffle
    * shape regardless of event volume. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    // conversion = any purchase over $100 — a split that is neither empty
    // nor universal at every sf (ALL-converted would zero the pooled
    // variance; the guard below still handles that degenerate case)
    val perUser = Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 100.0, 1)
        .otherwise(0)).as("conv"))
      .withColumn("arm", pmod(col("user_id"), lit(2)))
    val counts = perUser.agg(
      count(when(col("arm") === 0, lit(1))).as("n1"),
      count(when(col("arm") === 0 && col("conv") === 1, lit(1))).as("x1"),
      count(when(col("arm") === 1, lit(1))).as("n2"),
      count(when(col("arm") === 1 && col("conv") === 1, lit(1))).as("x2"))
    val diff = col("x1").cast(d38) * col("n2") - col("x2").cast(d38) * col("n1")
    val bigN = col("n1").cast(d38) + col("n2")
    val x = col("x1").cast(d38) + col("x2")
    counts
      .withColumn("num", diff * diff * bigN * 1000000)
      .withColumn("den", col("n1").cast(d38) * col("n2") * x * (bigN - x))
      // `div` (IntegralDivide): exact integral quotient — bit-matches the
      // oracle's HUGEINT `//`; a true decimal division would ROUND at the
      // capped scale and can disagree at quotient boundaries. den = 0
      // (zero pooled variance: nobody or everybody converted, or an empty
      // arm) carries no evidence — z² defined as 0
      .selectExpr("n1", "x1", "n2", "x2",
        "CAST(CASE WHEN den = 0 THEN 0 ELSE num div den END AS BIGINT) AS z2_ppm",
        "CAST(CASE WHEN den = 0 THEN FALSE " +
          "ELSE num div den >= 3841459 END AS BOOLEAN) AS significant")
  }

  private val abTestSql =
    """WITH u AS (
      |  SELECT user_id, user_id % 2 AS arm,
      |    max(CASE WHEN event_type = 'purchase' AND value > 100
      |      THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT
      |    count(*) FILTER (WHERE arm = 0) AS n1,
      |    count(*) FILTER (WHERE arm = 0 AND conv = 1) AS x1,
      |    count(*) FILTER (WHERE arm = 1) AS n2,
      |    count(*) FILTER (WHERE arm = 1 AND conv = 1) AS x2
      |  FROM u),
      |z AS (
      |  SELECT n1, x1, n2, x2,
      |    (x1::HUGEINT * n2 - x2::HUGEINT * n1)
      |      * (x1::HUGEINT * n2 - x2::HUGEINT * n1) * (n1 + n2) * 1000000
      |      AS num,
      |    n1::HUGEINT * n2 * (x1 + x2) * (n1 + n2 - x1 - x2) AS den
      |  FROM c)
      |SELECT n1, x1, n2, x2,
      |  CAST(CASE WHEN den = 0 THEN 0 ELSE num // den END AS BIGINT) AS z2_ppm,
      |  CAST(CASE WHEN den = 0 THEN FALSE ELSE num // den >= 3841459 END
      |    AS BOOLEAN) AS significant
      |FROM z""".stripMargin

  // ---- q240: Markov transition matrix -------------------------------------

  /** q240: MARKOV TRANSITIONS — the per-user event-sequence transition
    * matrix (session analysis, next-action prediction, anomaly baselines):
    * order each user's stream by (ts, event_id) — the unique tiebreak
    * that makes `lag` deterministic — pair every event with its
    * predecessor TYPE, count (from, to) cells, and report each cell's
    * row-conditional probability as exact ppm (count·10⁶ div row total,
    * the q211 integer discipline — no IEEE division crosses engines).
    *
    * At 100 TB: one user-keyed shuffle for the lag window (user streams
    * are the natural partition — bounded per user), then a |types|²-cell
    * aggregate with map-side partials; the row totals attach via a
    * broadcast-sized |types| frame. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    pairs.join(broadcast(rowTot), Seq("from_type"))
      .selectExpr("from_type", "to_type", "n",
        "CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div row_n AS BIGINT) AS p_ppm")
  }

  private val markovTransitionsSql =
    """WITH s AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |p AS (
      |  SELECT prev AS from_type, event_type AS to_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, sum(n) AS row_n FROM p GROUP BY 1)
      |SELECT p.from_type, p.to_type, p.n,
      |  CAST(p.n::HUGEINT * 1000000 // t.row_n::HUGEINT AS BIGINT) AS p_ppm
      |FROM p JOIN t ON p.from_type = t.from_type""".stripMargin

  // ---- q241: time-weighted average (TWAP) ---------------------------------

  /** q241: TWAP — the interval-weighted mean every pricing/ops system
    * uses when samples arrive irregularly: each observation holds until
    * the next one of its type, so its weight is the holding DURATION.
    * Everything integer-exact: durations in microseconds
    * (`unix_micros` = DuckDB `epoch_us`, both exact BIGINT), values in
    * cents, and the TWAP itself as cents-ppm — (Σ v·dur)·10⁶ div (Σ dur)
    * in DECIMAL38/HUGEINT, so the engines agree bitwise with NO float in
    * the accumulation (a naive Σ(v·dur) in doubles is partition-order-
    * dependent). The last observation of each type has no closing
    * timestamp and is excluded — the closed-interval convention.
    *
    * At 100 TB: one type-keyed shuffle for the lead window (types are few
    * but each stream is a time-ordered partition — the segmented-scan
    * note of q237 applies to monster types), then a |types|-group
    * aggregate. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
      .where(col("next_us").isNotNull)
      .withColumn("dur", col("next_us") - unix_micros(col("ts")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("dur").cast(DecimalType(38, 0))).as("tot_dur"),
        sum(col("cents").cast(DecimalType(38, 0)) * col("dur")).as("wsum"))
      .selectExpr("event_type", "n",
        "CAST(tot_dur AS BIGINT) AS tot_dur_us",
        "CAST((wsum * 1000000) div tot_dur AS BIGINT) AS twap_ppm_cents")
  }

  private val twapSql =
    """WITH s AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    epoch_us(ts) AS us,
      |    lead(epoch_us(ts)) OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id) AS next_us
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(next_us - us) AS BIGINT) AS tot_dur_us,
      |  CAST(sum(cents::HUGEINT * (next_us - us)) * 1000000
      |    // sum(next_us - us)::HUGEINT AS BIGINT) AS twap_ppm_cents
      |FROM s WHERE next_us IS NOT NULL
      |GROUP BY event_type""".stripMargin

  // ---- q242: CUSUM change detection ---------------------------------------

  /** q242: CUSUM — the classic drift detector: the cumulative sum of
    * deviations from the series mean peaks where the level SHIFTS. Kept
    * integer-exact by clearing denominators: with S = Σv (cents) and
    * n = count per type, the scaled statistic C_i = n·Σ_{j≤i} v_j − i·S
    * equals n² times the textbook mean-centered cusum — same argmax, no
    * division, DECIMAL38/HUGEINT all the way. Reported per type:
    * max |C_i|, WHERE it peaks (the change-point estimate; min-ts
    * tiebreak via exact composite max_by), and the peak scaled by n² to
    * ppm-cents for cross-type comparability.
    *
    * At 100 TB: the prefix sum is a type-keyed ordered window (q237's
    * segmented-scan note); the rest is a |types|-group aggregate with an
    * exact-integer argmax — no iteration, one pass. */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val base = Tables(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"), sum(col("cents")).as("s_t"))
    base.join(broadcast(tot), Seq("event_type"))
      .withColumn("c",
        col("n_t").cast(d38) * col("cum") - col("i").cast(d38) * col("s_t"))
      .withColumn("absc", abs(col("c")))
      .withColumn("peak_w",
        max(col("absc")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("absc")).as("peak"),
        min(when(col("absc") === col("peak_w"), col("ts"))).as("peak_ts"),
        max(col("n_t")).as("nt"))
      .selectExpr("event_type", "n",
        "CAST((peak * 1000000) div (CAST(nt AS DECIMAL(38,0)) * nt) AS BIGINT)"
          + " AS peak_ppm_cents",
        "date_format(peak_ts, 'yyyy-MM-dd HH:mm:ss') AS peak_ts_s")
  }

  private val cusumSql =
    """WITH b AS (
      |  SELECT event_type, ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id) AS BIGINT) AS i,
      |    sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      OVER (PARTITION BY event_type ORDER BY ts, event_id
      |        ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM events),
      |t AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_t,
      |    CAST(sum(cents) AS BIGINT) AS s_t
      |  FROM b GROUP BY 1),
      |c AS (
      |  SELECT b.event_type, b.ts,
      |    abs(t.n_t::HUGEINT * b.cum - b.i::HUGEINT * t.s_t) AS absc,
      |    t.n_t
      |  FROM b JOIN t ON b.event_type = t.event_type),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    max(absc) AS peak, max(n_t) AS nt
      |  FROM c GROUP BY 1)
      |SELECT m.event_type, m.n,
      |  CAST(m.peak * 1000000 // (m.nt::HUGEINT * m.nt) AS BIGINT)
      |    AS peak_ppm_cents,
      |  strftime(p.peak_ts, '%Y-%m-%d %H:%M:%S') AS peak_ts_s
      |FROM m JOIN (
      |  SELECT c.event_type, min(c.ts) AS peak_ts
      |  FROM c JOIN m ON c.event_type = m.event_type AND c.absc = m.peak
      |  GROUP BY c.event_type) p
      |ON m.event_type = p.event_type""".stripMargin

  // ---- q258: EWMA smoothing series ----------------------------------------

  /** q258: EWMA SERIES — exponentially-weighted smoothing of the daily
    * count series, one smoothed value PER DAY (q190 reports only the
    * final decayed score; monitors chart the whole series). Same
    * exactness machinery: half-life one day means weights 2^-k — every
    * term n·2^-k is a dyadic rational exactly representable in double,
    * so the sum is order-independent and cross-engine exact, where any
    * other decay base is partition-order-dependent. The recursion
    * s_i = x_i/1 + s_{i-1}/2 is deliberately unrolled into a BOUNDED
    * 20-day lookback join (weights below 2^-20 are sub-ppm): recursive
    * smoothing is inherently sequential, the truncated form is a
    * 20-way bounded self-join any engine parallelizes freely.
    *
    * At 100 TB: the join inflates the |types|·|days| DAILY table (not
    * the event stream) by ≤20× — aggregation-then-smooth, never
    * smooth-then-aggregate. */
  def ewmaSeries(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val a = daily.select(col("event_type"), col("d"))
    val b = daily.select(col("event_type").as("bt"), col("d").as("bd"),
      col("n").as("bn"))
    a.join(b, col("event_type") === col("bt") &&
        expr("datediff(d, bd) BETWEEN 0 AND 19"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("bn")).as("n_window"),
        sum(expr("CAST(bn AS DOUBLE) * power(CAST(2.0 AS DOUBLE)," +
          " CAST(-datediff(d, bd) AS DOUBLE))")).as("ewma"))
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day_s"),
        col("n_window"), col("ewma"))
  }

  private val ewmaSeriesSql =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT a.event_type, strftime(a.d, '%Y-%m-%d') AS day_s,
      |  CAST(sum(b.n) AS BIGINT) AS n_window,
      |  sum(CAST(b.n AS DOUBLE)
      |    * power(CAST(2.0 AS DOUBLE),
      |        CAST(-datediff('day', b.d, a.d) AS DOUBLE))) AS ewma
      |FROM daily a JOIN daily b
      |  ON a.event_type = b.event_type
      |  AND datediff('day', b.d, a.d) BETWEEN 0 AND 19
      |GROUP BY 1, 2""".stripMargin

  // ---- q259: longest streaks ----------------------------------------------

  /** q259: LONGEST STREAK — per user, the longest run of consecutive
    * same-type events (engagement/monitoring: "longest error streak",
    * "longest daily-active run"). The q245 islands identity composed
    * with a type-change boundary: row_number over the user's stream
    * minus row_number within (user, type) is constant exactly while the
    * type doesn't change — runs drop out as groups, no self-join, no
    * iteration. Per user the longest run wins; one row_number over the
    * TOTAL order (length desc, earliest start, then event_type) makes
    * the reported run deterministic under ties in both engines — a
    * composite-key max_by would leave (len, start) ties unresolved and
    * three independent oracle max_by calls could each pick a different
    * tied row.
    *
    * At 100 TB: two windows over the same user-keyed sort (one
    * partition ordering serves both — no second shuffle), then one
    * aggregate per run and one per user. */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val runs = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("grp",
        row_number().over(byUser) - row_number().over(byUserType))
      .groupBy(col("user_id"), col("event_type"), col("grp"))
      .agg(count(lit(1)).as("len"), min(unix_micros(col("ts"))).as("start_us"))
    // total order: longest first, earliest start, then event_type — the
    // last key resolves exact (len, start_us) ties identically in both
    // engines (runs of different types CAN tie when events share a ts)
    val best = Window.partitionBy(col("user_id"))
      .orderBy(col("len").desc, col("start_us").asc, col("event_type").asc)
    runs.withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("streak_type"),
        col("len").as("streak_len"), col("start_us"))
  }

  private val streaksSql =
    """WITH r AS (
      |  SELECT user_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      - row_number() OVER (PARTITION BY user_id, event_type
      |          ORDER BY ts, event_id) AS grp
      |  FROM events),
      |runs AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS len,
      |    CAST(min(epoch_us(ts)) AS BIGINT) AS start_us
      |  FROM r GROUP BY user_id, event_type, grp)
      |SELECT user_id, event_type AS streak_type, len AS streak_len, start_us
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY len DESC, start_us ASC, event_type ASC) AS rn
      |  FROM runs)
      |WHERE rn = 1""".stripMargin

  // ---- q263: new vs returning users ---------------------------------------

  /** q263: NEW vs RETURNING — the growth-accounting weekly split: a
    * user is NEW in the week of their first event, RETURNING in any
    * later active week. Two aggregates (first-seen week per user, then
    * the weekly classification rollup) — the first-seen frame is
    * user-grain and joins back by user key; no window over the event
    * stream at all. Engine-neutral week rendering via date_trunc +
    * explicit format. */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
    val first = weekly.groupBy(col("user_id")).agg(min(col("w")).as("w0"))
    weekly.join(first, Seq("user_id"))
      .groupBy(date_format(col("w"), "yyyy-MM-dd").as("week_s"))
      .agg(countDistinct(col("user_id")).as("active"),
        count(when(col("w") === col("w0"), lit(1))).as("new_users"),
        count(when(col("w") =!= col("w0"), lit(1))).as("returning"))
  }

  private val newVsReturningSql =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
      |f AS (SELECT user_id, min(w) AS w0 FROM weekly GROUP BY 1)
      |SELECT strftime(weekly.w, '%Y-%m-%d') AS week_s,
      |  count(DISTINCT weekly.user_id) AS active,
      |  count(*) FILTER (WHERE weekly.w = f.w0) AS new_users,
      |  count(*) FILTER (WHERE weekly.w <> f.w0) AS returning
      |FROM weekly JOIN f ON weekly.user_id = f.user_id
      |GROUP BY 1""".stripMargin

  // ---- q265: interval union (coverage) ------------------------------------

  /** q265: INTERVAL UNION — total COVERED time per user when each event
    * opens a 5-minute activity window: overlapping windows must count
    * once (the SLA/uptime/billing contract that plain sums double-count).
    * Sweep by start time per user: a window starts a new covered SEGMENT
    * iff it begins after the running max of all earlier ends (cummax over
    * the 1-PRECEDING frame); segment ids are the prefix sum of those
    * flags (the q245 island machinery on a continuous axis); covered
    * time = Σ per-segment (max end − min start). Exact integer
    * microseconds throughout.
    *
    * At 100 TB: one user-keyed sort serves all three windows; segments
    * aggregate locally. The q237 segmented-scan note applies to monster
    * users. */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    val segs = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + lit(300000000L)).as("e"))
      .withColumn("prev_max_e", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_seg",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("new_seg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("seg"))
      .agg(min(col("s")).as("s0"), max(col("e")).as("e1"))
    segs.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("e1") - col("s0")).cast("long").as("covered_us"))
  }

  private val intervalUnionSql =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + 300000000 AS e
      |  FROM events),
      |f AS (
      |  SELECT user_id, s, e,
      |    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_seg,
      |    event_id
      |  FROM iv),
      |g AS (
      |  SELECT user_id, s, e,
      |    sum(new_seg) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS UNBOUNDED PRECEDING) AS seg
      |  FROM f),
      |segs AS (
      |  SELECT user_id, seg, min(s) AS s0, max(e) AS e1
      |  FROM g GROUP BY user_id, seg)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_segments,
      |  CAST(sum(e1 - s0) AS BIGINT) AS covered_us
      |FROM segs GROUP BY user_id""".stripMargin

  // ---- q266: week-over-week change ----------------------------------------

  /** q266: WoW CHANGE — the reporting staple: each (type, week)'s count
    * against the PREVIOUS OBSERVED week (the stated contract — a dark
    * week makes the next comparison span the gap, which a dashboard
    * should see, not silently skip), with the delta as an exact ppm
    * integral quotient. One aggregate + one lag over the bounded
    * (type, week) frame. */
  def wowChange(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("week", col("ts")).as("w"))
      .agg(count(lit(1)).as("n"))
    weekly
      .withColumn("prev", lag(col("n"), 1).over(
        Window.partitionBy(col("event_type")).orderBy(col("w"))))
      .where(col("prev").isNotNull)
      .selectExpr("event_type", "date_format(w, 'yyyy-MM-dd') AS week_s",
        "n", "prev",
        "CAST(((CAST(n AS DECIMAL(38,0)) - prev) * 1000000) div prev" +
          " AS BIGINT) AS delta_ppm")
  }

  private val wowChangeSql =
    """WITH weekly AS (
      |  SELECT event_type, date_trunc('week', ts) AS w,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, w, n,
      |    lag(n) OVER (PARTITION BY event_type ORDER BY w) AS prev
      |  FROM weekly)
      |SELECT event_type, strftime(w, '%Y-%m-%d') AS week_s, n, prev,
      |  CAST((n::HUGEINT - prev) * 1000000 // prev::HUGEINT AS BIGINT)
      |    AS delta_ppm
      |FROM l WHERE prev IS NOT NULL""".stripMargin

  // ---- q268: hour-of-day seasonality profile ------------------------------

  /** q268: SEASONALITY PROFILE — each event type's hour-of-day activity
    * share in exact ppm: the capacity-planning/anomaly-baseline view
    * ("what does a normal 3am look like"). One (type, hour) aggregate +
    * a type-total window over the bounded 24·|types| frame. */
  def hourProfile(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("tot", sum(col("n")).over(
        Window.partitionBy(col("event_type"))))
      .selectExpr("event_type", "hod", "n",
        "CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div tot AS BIGINT)" +
          " AS share_ppm")
  }

  private val hourProfileSql =
    """WITH cells AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, hod, n,
      |  CAST(n::HUGEINT * 1000000
      |    // sum(n) OVER (PARTITION BY event_type)::HUGEINT AS BIGINT)
      |    AS share_ppm
      |FROM cells""".stripMargin

  // ---- q272: box-plot series ----------------------------------------------

  /** q272: BOX-PLOT SERIES — per (type, day) the five-number summary
    * (min, q1, median, q3, max) of event values in exact cents: the
    * monitoring dashboard's distribution-over-time strip. Exact
    * interpolated percentiles of integers are multiples of 0.5 (the q233
    * argument), so all five numbers cross engines bitwise. One grouped
    * sort-aggregate per (type, day) — groups are small and numerous, the
    * shape exact percentiles parallelize best. */
  def boxplotSeries(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day_s"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy(col("event_type"), col("day_s"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"),
        expr("percentile(cents, 0.25)").as("q1"),
        expr("percentile(cents, 0.5)").as("med"),
        expr("percentile(cents, 0.75)").as("q3"),
        max(col("cents")).as("hi"))

  private val boxplotSeriesSql =
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day_s,
      |  count(*) AS n,
      |  min(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS lo,
      |  quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
      |    0.25) AS q1,
      |  quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
      |    0.5) AS med,
      |  quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
      |    0.75) AS q3,
      |  max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS hi
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---- q292: additive seasonal decomposition ------------------------------

  /** q292: SEASONAL DECOMPOSITION — the classical additive split of the
    * daily event series into trend + weekly seasonality + residual
    * (capacity planning / anomaly baselining: "is Monday's dip seasonal
    * or real?"). Trend = centered 7-row moving average (full windows
    * only); seasonal = the per-day-of-week mean of the detrended series;
    * residual = observed − trend − seasonal.
    *
    * Cross-engine exactness: every division operates on EXACT integer
    * sums — trend is Σn/7.0, and the per-dow seasonal mean avg(n − S₇/7)
    * is algebraically rewritten to Σn/cnt − ΣS₇/(7·cnt), so no
    * order-sensitive double accumulation exists anywhere; the residual is
    * then a fixed per-row chain of three IEEE ops written identically in
    * both engines. Day-of-week is epoch-day mod 7 (engine-neutral — the
    * engines disagree on dayofweek() numbering).
    *
    * At 100 TB: the global window runs on the DAY-GRAIN series — the
    * |days|-row output of the first aggregate, planning-scale no matter
    * the corpus size — so the single-partition window is a deliberate,
    * safe choice (the fact scan itself shuffles once, on the day key). */
  def seasonalDecomp(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("d")).rowsBetween(-3, 3)
    val f = daily
      .withColumn("s7", sum(col("n")).over(w))
      .withColumn("c7", count(lit(1)).over(w))
      .where(col("c7") === 7)
      .withColumn("dow",
        datediff(col("d"), lit(java.sql.Date.valueOf("1970-01-01"))) % 7)
    val seas = f.groupBy(col("dow"))
      .agg((sum(col("n")).cast("double") / count(lit(1)) -
        sum(col("s7")).cast("double") / (count(lit(1)) * lit(7L)))
        .as("seasonal"))
    f.join(broadcast(seas), Seq("dow")) // ≤7 rows
      .select(date_format(col("d"), "yyyy-MM-dd").as("day_s"), col("n"),
        (col("s7").cast("double") / lit(7.0)).as("trend"), col("seasonal"),
        ((col("n").cast("double") - col("s7").cast("double") / lit(7.0))
          - col("seasonal")).as("residual"))
  }

  private val seasonalDecompSql =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT d, n,
      |    CAST(sum(n) OVER (ORDER BY d
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
      |    count(*) OVER (ORDER BY d
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      |  FROM daily),
      |f AS (
      |  SELECT d, n, s7, (d - DATE '1970-01-01') % 7 AS dow
      |  FROM w WHERE c7 = 7),
      |seas AS (
      |  SELECT dow,
      |    CAST(sum(n) AS DOUBLE) / count(*)
      |      - CAST(sum(s7) AS DOUBLE) / (count(*) * 7) AS seasonal
      |  FROM f GROUP BY 1)
      |SELECT strftime(f.d, '%Y-%m-%d') AS day_s, f.n,
      |  CAST(f.s7 AS DOUBLE) / 7.0 AS trend, seas.seasonal,
      |  (CAST(f.n AS DOUBLE) - CAST(f.s7 AS DOUBLE) / 7.0) - seas.seasonal
      |    AS residual
      |FROM f JOIN seas ON f.dow = seas.dow""".stripMargin

  // ---- q300: ordered multi-step funnel -------------------------------------

  /** q300: EVENT FUNNEL — the product-analytics staple: how many users
    * completed view → click → purchase IN ORDER, each step within 7 days
    * of the previous. Sequential dependency is resolved by three chained
    * conditional-min windows over ONE user partitioning (the q119
    * shared-exchange discipline: same partition key → the planner reuses
    * a single shuffle): v = first view; c = first click in (v, v+7d];
    * p = first purchase in (c, c+7d]. All event-time arithmetic in exact
    * integer microseconds; the per-user triple collapses by max (the
    * windows make v/c/p constant within a user) and one global aggregate
    * counts each stage. Strictly-after semantics (>) at every step so
    * same-timestamp events never self-satisfy a later stage. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val week = 604800000000L // 7 days in microseconds
    val w = Window.partitionBy(col("user_id"))
    val staged = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("v",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("us") > col("v") &&
          col("us") <= col("v") + week, col("us"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("us") > col("c") &&
          col("us") <= col("c") + week, col("us"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(max(col("v")).as("v"), max(col("c")).as("c"), max(col("p")).as("p"))
      .agg(count(lit(1)).as("n_users"),
        count(col("v")).as("n_view"),
        count(col("c")).as("n_click"),
        count(col("p")).as("n_purchase"))
  }

  private val funnelStepsSql =
    """WITH s AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v1 AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
      |    OVER (PARTITION BY user_id) AS v
      |  FROM s),
      |v2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND us > v
      |      AND us <= v + 604800000000 THEN us END)
      |    OVER (PARTITION BY user_id) AS c
      |  FROM v1),
      |v3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > c
      |      AND us <= c + 604800000000 THEN us END)
      |    OVER (PARTITION BY user_id) AS p
      |  FROM v2),
      |u AS (
      |  SELECT user_id, max(v) AS v, max(c) AS c, max(p) AS p
      |  FROM v3 GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(count(v) AS BIGINT) AS n_view,
      |  CAST(count(c) AS BIGINT) AS n_click,
      |  CAST(count(p) AS BIGINT) AS n_purchase
      |FROM u""".stripMargin

  // ---- q307: lead-lag cross-correlation of two event series ---------------

  /** q307: CROSS-CORRELATION FUNCTION — does one series LEAD another?
    * Pearson correlation of daily click vs purchase counts at every lag
    * in [-7, +7] (the marketing/ops question "do clicks predict
    * purchases k days out"). Exact sufficient statistics per lag: the
    * lag join is an equi join on shifted day index over the DAY-GRAIN
    * frames (planning-scale at any corpus size — the corpus-sized work
    * is the two daily aggregates), all sums integer in DECIMAL(38,0),
    * and corr is emitted as the exact integer numerator n·Σxy − ΣxΣy
    * plus the two variance terms — the hash gate needs no sqrt and no
    * tolerance; `ccf_sq` = num²/(dena·denb) is the fixed two-quotient
    * chain of q295 (the squared correlation; `num` carries the sign). */
  def crossCorrelation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    def daily(t: String, cn: String) = Tables(spark, dir, "events")
      .where(col("event_type") === t)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .agg(count(lit(1)).as(cn))
      .select(datediff(col("d"),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as(s"x_$cn"),
        col(cn))
    val a = daily("click", "ca")
    val b = daily("purchase", "cb")
    val lags = spark.range(-7, 8).select(col("id").as("lag"))
    a.crossJoin(broadcast(lags))
      .join(b, col("x_ca") + col("lag") === col("x_cb"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("ca").cast(dec)).as("sa"), sum(col("cb").cast(dec)).as("sb"),
        sum(col("ca").cast(dec) * col("ca")).as("saa"),
        sum(col("cb").cast(dec) * col("cb")).as("sbb"),
        sum(col("ca").cast(dec) * col("cb")).as("sab"))
      .select(col("lag"),
        col("n"),
        (col("n").cast(dec) * col("sab") - col("sa") * col("sb")).as("num"),
        (col("n").cast(dec) * col("saa") - col("sa") * col("sa")).as("dena"),
        (col("n").cast(dec) * col("sbb") - col("sb") * col("sb")).as("denb"))
      .select(col("lag"), col("n"),
        col("num").cast("long").as("num"),
        col("dena").cast("long").as("dena"),
        col("denb").cast("long").as("denb"),
        ((col("num").cast("double") / col("dena").cast("double")) *
          (col("num").cast("double") / col("denb").cast("double")))
          .as("ccf_sq"))
  }

  private val crossCorrelationSql =
    """WITH a AS (
      |  SELECT (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01')
      |    AS x, count(*) AS ca
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |b AS (
      |  SELECT (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01')
      |    AS x, count(*) AS cb
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |l AS (SELECT range AS lag FROM range(-7, 8)),
      |s AS (
      |  SELECT lag, count(*) AS n,
      |    sum(ca::HUGEINT) AS sa, sum(cb::HUGEINT) AS sb,
      |    sum(ca::HUGEINT * ca) AS saa, sum(cb::HUGEINT * cb) AS sbb,
      |    sum(ca::HUGEINT * cb) AS sab
      |  FROM a JOIN l ON TRUE JOIN b ON a.x + l.lag = b.x
      |  GROUP BY 1),
      |c AS (
      |  SELECT lag, n, n::HUGEINT * sab - sa * sb AS num,
      |    n::HUGEINT * saa - sa * sa AS dena,
      |    n::HUGEINT * sbb - sb * sb AS denb
      |  FROM s)
      |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
      |  CAST(num AS BIGINT) AS num, CAST(dena AS BIGINT) AS dena,
      |  CAST(denb AS BIGINT) AS denb,
      |  (CAST(num AS DOUBLE) / CAST(dena AS DOUBLE))
      |    * (CAST(num AS DOUBLE) / CAST(denb AS DOUBLE)) AS ccf_sq
      |FROM c""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q307_cross_correlation", crossCorrelation,
      Some(crossCorrelationSql)),
    QueryDef("q300_funnel", funnelSteps, Some(funnelStepsSql)),
    QueryDef("q292_seasonal_decomp", seasonalDecomp, Some(seasonalDecompSql)),
    QueryDef("q272_boxplot_series", boxplotSeries, Some(boxplotSeriesSql)),
    QueryDef("q268_hour_profile", hourProfile, Some(hourProfileSql)),
    QueryDef("q265_interval_union", intervalUnion, Some(intervalUnionSql)),
    QueryDef("q266_wow_change", wowChange, Some(wowChangeSql)),
    QueryDef("q263_new_returning", newVsReturning, Some(newVsReturningSql)),
    QueryDef("q259_streaks", streaks, Some(streaksSql)),
    QueryDef("q258_ewma_series", ewmaSeries, Some(ewmaSeriesSql)),
    QueryDef("q240_markov", markovTransitions, Some(markovTransitionsSql)),
    QueryDef("q241_twap", twap, Some(twapSql)),
    QueryDef("q242_cusum", cusum, Some(cusumSql)),
    QueryDef("q238_ab_test", abTest, Some(abTestSql)),
    QueryDef("q190_decayed_counts", decayedCounts, Some(decayedCountsSql)),
    QueryDef("q101_anomalies", anomalies, Some(anomaliesSql)),
    QueryDef("q92_resample", resample, Some(resampleSql)),
    QueryDef("q93_forward_fill", forwardFill, Some(forwardFillSql)))
}
