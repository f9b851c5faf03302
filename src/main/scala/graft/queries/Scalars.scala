package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function coverage: string, date, math, JSON, conditional. All
  * `org.apache.spark.sql.functions` built-ins (codegen'd, no UDFs). Integer
  * outputs are aligned to BIGINT because DuckDB's length/year/ceil return
  * 64-bit. Computed monetary values are cast to DECIMAL at the scale where
  * the true value is exact (product of two 2-dp columns -> 4 dp), never
  * `round()`ed — engines' double rounding implementations differ at
  * boundaries, exact-decimal casts don't.
  */
object Scalars {
  import Exact._

  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      lower(col("p_type")).as("type_l"),
      substring(col("p_name"), 1, 8).as("name8"),
      length(col("p_name")).cast("long").as("name_len"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      regexp_extract(col("p_name"), "[0-9]+", 0).as("first_num"))

  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("tot"))

  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1.0) + col("l_tax")))
        .cast(DecimalType(27, 4)).cast("double").as("gross"),
      abs(col("l_discount") - lit(0.05)).as("dd"),
      ceil(col("l_quantity")).as("qc"),
      floor(col("l_quantity")).as("qf"),
      sqrt(col("l_quantity")).as("qs"))

  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"))

  def caseWhen(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("big").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("tot"))

  /** Array-function coverage over the embedding vectors: size, min/max,
    * slice, element search — all codegen'd built-ins on ArrayType. The
    * sliced head is emitted as three scalar double columns (not an array):
    * the driver's row checker sorts with pandas, which cannot hash
    * array-typed cells, and doubles hash exactly while float->string
    * serialization would not be cross-engine stable. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("head3", expr("slice(v, 1, 3)"))
      .select(col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        array_max(col("v")).as("mx"),
        array_min(col("v")).as("mn"),
        element_at(col("head3"), 1).as("h1"),
        element_at(col("head3"), 2).as("h2"),
        element_at(col("head3"), 3).as("h3"),
        expr("array_position(v, array_max(v))").as("pos_max"))

  /** Aggregate extras: min_by/max_by (deterministic via an exact integer
    * composite of (acctbal, custkey) — 2-dp decimal*100 stays exact),
    * count_if, and a sorted distinct collect. The collected set is
    * serialized with array_join (integer elements, so the string form is
    * cross-engine exact) because the driver's pandas row sorter cannot
    * hash array-typed cells. */
  def aggExtras(spark: SparkSession, dir: String): DataFrame = {
    val ordKey = (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
      .cast("long") * lit(10000000L) + col("c_custkey")
    Tables(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("c_name"), ordKey).as("top_cust"),
        min_by(col("c_name"), ordKey).as("bottom_cust"),
        count_if(col("c_acctbal") > 0).as("n_pos"),
        array_sort(collect_set(col("c_nationkey"))).as("nations_arr"))
      .withColumn("nations",
        expr("array_join(transform(nations_arr, x -> cast(x AS string)), ',')"))
      .drop("nations_arr")
  }

  /** Sketch aggregates — approx_count_distinct (HyperLogLog++) and
    * approx_percentile: at 100 TB these replace exact distinct/percentile
    * (which need a full shuffle of the key space) with fixed-size mergeable
    * sketches. No SQL oracle: sketch estimates are engine-specific, so the
    * driver records a rows-only check; `QueriesSmokeSpec` bounds the error
    * against exact values. */
  /** q47: the sketch-aggregate surface (HLL++ distinct count +
    * approx_percentile), oracle-gated on the properties COMPLEMENTARY to
    * q47b's: the p99 estimate must sit inside the exact p97..p995 value
    * band (approx_percentile's 1/1000 rank guarantee makes the true band
    * p989..p991 — p97..p995 leaves slack without weakening the gate on a
    * broken sketch), the estimates must be internally consistent
    * (p50 ≤ p99), and the HLL estimate within 3 rsd of exact. The exact
    * columns re-compute in DuckDB; the booleans are literal TRUE — any
    * sketch drift flips one and fails the hash compare. */
  def sketchAggs(spark: SparkSession, dir: String): DataFrame =
    sketchCompanion(spark, dir)
      .select(col("l_returnflag"), col("nd_exact"),
        (col("p99_approx") >= col("p97") && col("p99_approx") <= col("p995"))
          .as("p99_in_band"),
        (col("p50_approx") <= col("p99_approx")).as("pcts_ordered"),
        (abs(col("nd_approx") - col("nd_exact")).cast("double") /
          col("nd_exact") < 0.15).as("nd_within_rsd"))

  /** ONE exact+sketch companion shared by q47 and q47b (via [[Memo]], so
    * whichever runs first pays the scans and the other reuses the 3-row
    * checkpointed result — `Bench` clears the memo between passes). The
    * two gates previously re-ran overlapping exact `count(distinct)` +
    * exact-percentile subplans per query (the one >2x per-query cost
    * regression of round 8); here every exact percentile the two gates
    * need comes out of a single `percentile(.., array(...))` buffer —
    * one value buffering per group for all four ranks — and the exact
    * distinct stays in its own hash-aggregate pair. (Mixing countDistinct
    * with object-hash agg functions in ONE aggregate would force
    * Catalyst's Expand rewrite: every input row duplicated and the whole
    * aggregate falls back to sort-based exec over 2x rows — measured
    * 4.3s vs 1.5s. Two clean aggregates + a 3-row broadcast join keeps
    * each path in its fast operator.) */
  private def sketchCompanion(spark: SparkSession, dir: String): DataFrame =
    Memo("sketch_companion", spark, dir) {
      sketchCompanionPlan(spark, dir).localCheckpoint()
    }

  /** The companion's un-checkpointed plan, exposed for `PlanSpec`'s shape
    * gate (broadcast join + partial aggregation — invisible from the
    * consumers once checkpointed to a LogicalRDD). */
  private[graft] def sketchCompanionPlan(spark: SparkSession,
      dir: String): DataFrame = {
      val li = Tables(spark, dir, "lineitem")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_exact"))
      val rest = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.05).as("nd_approx"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("p50_approx"),
          expr("approx_percentile(l_quantity, 0.99, 1000)").as("p99_approx"),
          expr("percentile(l_quantity, array(0.45, 0.55, 0.97, 0.995))")
            .as("pct"))
      exact.join(broadcast(rest), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("nd_exact"), col("nd_approx"),
          col("p50_approx"), col("p99_approx"),
          col("pct")(0).as("p45"), col("pct")(1).as("p55"),
          col("pct")(2).as("p97"), col("pct")(3).as("p995"))
  }

  private val sketchAggsSql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_exact,
      |  TRUE AS p99_in_band, TRUE AS pcts_ordered, TRUE AS nd_within_rsd
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Error-bound companion to q47: the sketches are GRADED, not just
    * smoke-tested. Spark computes both the exact answers and the sketch
    * estimates, and emits booleans asserting the estimates sit inside
    * their published bounds (HLL++ within 3x the 5% rsd it was configured
    * with — rsd is ONE standard deviation of the estimator, not a hard
    * bound, so ~1/3 of dataset/group draws land outside 1 rsd and a
    * 1-rsd gate would deterministically fail on some inputs; 3 rsd keeps
    * false-failure odds negligible while still catching a broken sketch.
    * approx_percentile(.., 1000)'s rank guarantee keeps its p50 inside
    * the exact p45..p55 value band). The oracle recomputes the exact
    * columns and expects literal TRUE for the bound columns — a drifting
    * sketch flips a boolean and fails the driver's hash compare. */
  def sketchBounds(spark: SparkSession, dir: String): DataFrame =
    sketchCompanion(spark, dir)
      .select(col("l_returnflag"), col("nd_exact"),
        (abs(col("nd_approx") - col("nd_exact")).cast("double") /
          col("nd_exact") < 0.15).as("nd_within_rsd"),
        (col("p50_approx") >= col("p45") &&
          col("p50_approx") <= col("p55")).as("p50_in_band"))

  private val sketchBoundsSql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_exact,
      |  TRUE AS nd_within_rsd, TRUE AS p50_in_band
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q145: sketch ROLLUP — the property that makes sketches matter at
    * 100 TB is not the single estimate but MERGEABILITY: a fixed-size
    * partial state that unions across partitions, days, and retention
    * tiers without ever re-reading raw data. Here per-day HyperLogLog
    * sketches of distinct users (Apache DataSketches `hll_sketch_agg`,
    * a persistable BINARY column — the incremental-matview shape) are
    * union-merged per ISO week (`hll_union_agg`): the weekly estimate
    * reads |days| sketch rows, not |events| raw rows. Graded like q47b:
    * the merged estimate must land within 5% of the exact per-week
    * distinct (lgK=12 rsd ≈ 1.6%, so 5% ≈ 3 rsd — negligible
    * false-failure odds, still catches a broken merge), emitted as a
    * boolean the oracle expects to be literally TRUE — a drifting or
    * double-counting union flips it and fails the hash compare. */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(date_trunc("week", col("ts")).as("week"),
        date_trunc("day", col("ts")).as("day"), col("user_id"))
    val daySketch = ev.groupBy(col("week"), col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val weekly = daySketch.groupBy(col("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"))
    val exact = ev.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(broadcast(weekly), Seq("week"))
      .select(col("week"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users") < 0.05).as("merged_within_bound"))
  }

  private[queries] val sketchRollupSql =
    """SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
      |  count(DISTINCT user_id) AS exact_users, TRUE AS merged_within_bound
      |FROM events GROUP BY 1""".stripMargin

  /** q151: SLIDING-window distinct via pane-merged sketches — the
    * dashboard query ("7-day active users, daily") that naively
    * reprocesses every event 7 times. The pane decomposition: one HLL
    * sketch per day (the q145 panes), then a WINDOW aggregate unions the
    * trailing 7 panes per row — |days| rows and |days|·7 kilobyte-sized
    * merges total, with raw events read exactly once, at any scale. The
    * union runs as `hll_union_agg` OVER a ROWS frame: a
    * TypedImperativeAggregate evaluated in a window frame, the
    * sketch-state counterpart of q33's moving average. Graded like
    * q145: the pane-merged estimate must sit within 5% (≈3 rsd) of the
    * exact trailing-7-day distinct, as an oracle-checked TRUE. */
  def slidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
    val panes = ev.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    // the un-partitioned window runs over the PANE table — |days| rows,
    // calendar-sized — never over event rows (the q142 gate's concern).
    // RANGE over the epoch-day number, NOT a ROWS frame: with gaps in
    // the calendar, "6 preceding rows" would union panes older than 7
    // days (the AnalyticsExtrasSpec gapped-calendar case pins this).
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dn")).rangeBetween(-6, 0)
    val approx = panes
      .withColumn("dn", expr("unix_date(CAST(day AS DATE))").cast("long"))
      .withColumn("approx_7d",
        expr("hll_union_agg(sk)").over(w))
      .withColumn("approx_7d", expr("hll_sketch_estimate(approx_7d)"))
      .select(col("day"), col("approx_7d"))
    val days = ev.select(col("day")).distinct()
    val exact = days.join(ev.select(col("day").as("d2"), col("user_id")),
        col("d2") <= col("day") && col("d2") >= col("day") - expr("INTERVAL 6 DAYS"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("exact_users_7d"))
    exact.join(broadcast(approx), Seq("day"))
      .select(col("day"), col("exact_users_7d"),
        (abs(col("approx_7d") - col("exact_users_7d")).cast("double") /
          col("exact_users_7d") < 0.05).as("pane_within_bound"))
  }

  private val slidingDistinctSql =
    """WITH e AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      |  FROM events),
      |d AS (SELECT DISTINCT day FROM e)
      |SELECT d.day, count(DISTINCT e.user_id) AS exact_users_7d,
      |  TRUE AS pane_within_bound
      |FROM d JOIN e ON e.day <= d.day AND e.day >= d.day - INTERVAL 6 DAY
      |GROUP BY d.day""".stripMargin

  /** q156: the VARIANT type (Spark 4's open semi-structured column) —
    * `parse_json` into a binary-encoded variant once, then typed
    * `variant_get` path extraction, replacing repeated string re-parsing
    * (`get_json_object`, q43's path) with a parse-once/extract-many
    * encoding: at 100 TB the JSON text is decoded a single time per row
    * however many fields downstream operators pull. The aggregate
    * (per event type: row count, sum/max of the extracted key, count of
    * rows where the path is absent) is exact integers, so the DuckDB
    * JSON-function oracle hash-matches. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"),
        count_if(col("k").isNull).as("n_missing"))

  private val variantExtractSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
      |  max(CAST(props->>'$.k' AS BIGINT)) AS k_max,
      |  count(*) FILTER (WHERE props->>'$.k' IS NULL) AS n_missing
      |FROM events GROUP BY event_type""".stripMargin

  /** q157: MULTI-LEVEL sketch rollup — `ROLLUP(week, day)` over the
    * stored day panes: one grouping pass yields the day, week, and
    * grand-total distinct-user estimates, every coarser level a UNION
    * of the same fixed-size HLL buffers (never a re-scan of events) —
    * the OLAP-hierarchy composition that makes sketch panes a
    * materialized-view substrate rather than a one-off. The exact
    * side rolls up with `countDistinct` under the same grouping; a
    * null-safe key join lines up the (NULL) subtotal rows, and every
    * level must sit inside the q145 5% bound, oracle-checked as
    * literal TRUEs. */
  def sketchCube(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(date_trunc("week", col("ts")).as("week"),
        date_trunc("day", col("ts")).as("day"), col("user_id"))
    val approx = ev
      .groupBy(col("week"), col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .rollup(col("week"), col("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"))
      .select(col("week").as("wa"), col("day").as("da"),
        col("approx_users"))
    val exact = ev.rollup(col("week"), col("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(broadcast(approx),
        col("week") <=> col("wa") && col("day") <=> col("da"))
      .select(col("week"), col("day"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users") < 0.05).as("rollup_within_bound"))
  }

  private val sketchCubeSql =
    """WITH e AS (
      |  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
      |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      |  FROM events)
      |SELECT week, day, count(DISTINCT user_id) AS exact_users,
      |  TRUE AS rollup_within_bound
      |FROM e GROUP BY ROLLUP(week, day)""".stripMargin

  /** Exact interpolated percentiles (median + quartiles) per group. Unlike
    * q47's sketches this buffers the group's values — right only when the
    * per-group cardinality is bounded; the oracle works because both engines
    * use linear interpolation and the inputs are integer-valued doubles
    * (every interpolated result is binary-exact). */
  def percentileExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))

  private val percentileExactSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q118: bivariate statistical aggregates — corr / covar_pop /
    * covar_samp / regr_slope / regr_intercept / regr_r2 of
    * (l_quantity, l_extendedprice) per return flag — the q101 exact-moment
    * technique applied to the two-variable family. Native `corr`/`covar_*`
    * accumulate doubles in partition order (non-deterministic across
    * engines AND across partitionings), so instead the five moments
    * Σx, Σy, Σx², Σy², Σxy are summed EXACTLY over integer cents
    * (DECIMAL(38,0) in Spark, HUGEINT in DuckDB — both exact), cast to
    * double once, and every statistic is derived through an IDENTICAL
    * single-IEEE-op expression tree in both engines (+,−,×,÷,sqrt are all
    * correctly rounded, so identical trees give identical bits). The
    * degenerate-variance guards are exact and overflow-free at ANY scale:
    * a variance is zero iff min = max within the group. One partial-agg
    * shuffle over |return flags| groups; scales like any hash aggregate. */
  def bivariateStats(spark: SparkSession, dir: String): DataFrame = {
    val xi = (col("l_quantity").cast(DecimalType(12, 2)) * 100).cast("long")
    val yi = (col("l_extendedprice").cast(DecimalType(12, 2)) * 100).cast("long")
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    def sq(c: org.apache.spark.sql.Column) =
      (c.cast(d19) * c.cast(d19)).cast(d38)
    val m = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), xi.as("xi"), yi.as("yi"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        // first moments as DECIMAL(38,0) too: a plain long sum wraps
        // silently past 2^63 (~1e12 rows of 1e7-cent values) while the
        // oracle's HUGEINT does not
        sum(col("xi").cast(d38)).as("sx"), sum(col("yi").cast(d38)).as("sy"),
        sum(sq(col("xi"))).as("sxx"), sum(sq(col("yi"))).as("syy"),
        sum((col("xi").cast(d19) * col("yi").cast(d19)).cast(d38)).as("sxy"),
        min(col("xi")).as("xmin"), max(col("xi")).as("xmax"),
        min(col("yi")).as("ymin"), max(col("yi")).as("ymax"))
    val nd = col("n").cast("double")
    // cents → units: one exact double scale per moment ( /100, /10000 )
    val sxd = col("sx").cast("double") / 100d
    val syd = col("sy").cast("double") / 100d
    val sxxd = col("sxx").cast("double") / 10000d
    val syyd = col("syy").cast("double") / 10000d
    val sxyd = col("sxy").cast("double") / 10000d
    val mx = sxd / nd
    val my = syd / nd
    val covp = sxyd / nd - mx * my
    val varx = sxxd / nd - mx * mx
    val vary = syyd / nd - my * my
    val corrC = covp / sqrt(varx * vary)
    val slope = covp / varx
    // exact, overflow-free non-degeneracy guards: variance = 0 iff the
    // group is constant (n·Σx² − (Σx)² products would overflow 38 digits
    // exactly at the scales where the exactness matters most)
    m.where(col("xmin") < col("xmax") && col("ymin") < col("ymax"))
      .select(col("l_returnflag"), col("n"),
        mx.as("mean_x"), my.as("mean_y"),
        covp.as("covar_pop"),
        ((sxyd - sxd * syd / nd) / (nd - 1.0)).as("covar_samp"),
        corrC.as("corr"),
        slope.as("regr_slope"),
        (my - slope * mx).as("regr_intercept"),
        (corrC * corrC).as("regr_r2"))
  }

  /** Built from named fragments so every repetition of a moment or
    * statistic is LITERALLY the same expression tree — the bit-exactness
    * contract (identical IEEE trees in both engines) is then maintained
    * by construction, not by hand-synchronizing eight copies. */
  private val bivariateStatsSql = {
    val xc = "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
    val yc = "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    val covp = "sxyd / nd - (sxd / nd) * (syd / nd)"
    val varx = "(sxxd / nd - (sxd / nd) * (sxd / nd))"
    val vary = "(syyd / nd - (syd / nd) * (syd / nd))"
    val corr = s"($covp) / sqrt($varx * $vary)"
    val slope = s"($covp) / $varx"
    s"""WITH m AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    sum($xc) AS sx, sum($yc) AS sy,
       |    sum(CAST($xc AS HUGEINT) * $xc) AS sxx,
       |    sum(CAST($yc AS HUGEINT) * $yc) AS syy,
       |    sum(CAST($xc AS HUGEINT) * $yc) AS sxy,
       |    min($xc) AS xmin, max($xc) AS xmax,
       |    min($yc) AS ymin, max($yc) AS ymax
       |  FROM lineitem GROUP BY l_returnflag),
       |d AS (
       |  SELECT l_returnflag, n,
       |    CAST(n AS DOUBLE) AS nd,
       |    CAST(sx AS DOUBLE) / 100 AS sxd, CAST(sy AS DOUBLE) / 100 AS syd,
       |    CAST(sxx AS DOUBLE) / 10000 AS sxxd,
       |    CAST(syy AS DOUBLE) / 10000 AS syyd,
       |    CAST(sxy AS DOUBLE) / 10000 AS sxyd,
       |    xmin, xmax, ymin, ymax
       |  FROM m)
       |SELECT l_returnflag, n,
       |  sxd / nd AS mean_x, syd / nd AS mean_y,
       |  $covp AS covar_pop,
       |  (sxyd - sxd * syd / nd) / (nd - 1.0) AS covar_samp,
       |  $corr AS corr,
       |  $slope AS regr_slope,
       |  syd / nd - ($slope) * (sxd / nd) AS regr_intercept,
       |  ($corr) * ($corr) AS regr_r2
       |FROM d WHERE xmin < xmax AND ymin < ymax""".stripMargin
  }

  /** MapType + structured JSON surface: `from_json` parses the event props
    * into a typed struct (schema-on-read, codegen'd — the scalable JSON
    * path vs per-field string extraction), and a map built from arrays is
    * probed with `element_at`/`map_keys`. Outputs are flat scalars so the
    * oracle (which computes the same values straight from the JSON) is
    * exact. */
  def mapJsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("parsed", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k LONG, tag STRING")))
      .withColumn("m", map_from_arrays(
        array(lit("k2"), lit("id")),
        array(col("parsed.k") * 2, col("event_id"))))
      .select(col("event_id"),
        col("parsed.k").as("k"),
        col("parsed.tag").as("tag"),
        element_at(col("m"), "k2").as("k2"),
        size(map_keys(col("m"))).cast("long").as("n_keys"))

  private val mapJsonFuncsSql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  json_extract_string(props, '$.tag') AS tag,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k2,
      |  CAST(2 AS BIGINT) AS n_keys
      |FROM events""".stripMargin

  // ---- q207: weekly user churn via theta DIFFERENCE -----------------------

  /** q207: WEEKLY NEW-USER CHURN by theta-sketch set DIFFERENCE — the
    * third operation of the theta algebra (q198 exercised intersection;
    * HLL can do neither). "Users active this week who were not active
    * last week" is a set difference per consecutive week pair: the exact
    * path re-joins the full (week, user) index per pair, while the
    * sketch path differences two kilobyte-sized buffers — the reason
    * engagement dashboards over 100 TB event logs run on sketch stores.
    * One distinct (week, user) index feeds BOTH paths (localCheckpoint —
    * two consumers), the per-week sketch table is |weeks| rows (the lag
    * window over it is driver-scale by construction), and the pair is
    * pinned to strictly consecutive calendar weeks so a gap week can't
    * masquerade as churn.
    *
    * Grading, q198-style: exact n_users / n_new hash-graded outright;
    * `within_bound` pins the sketch estimate to max(16, 5%·n_users) —
    * exact below nominal k (exact mode), honest once estimation engages. */
  def thetaChurn(spark: SparkSession, dir: String): DataFrame =
    thetaChurnWith(spark, dir, None)

  /** The q207 pipeline with the weekly sketch table OPTIONALLY supplied by
    * a caller — q212 passes the sketches accumulated in the STREAMING
    * state store (theta is set-semantics, so sketching raw arrivals or
    * the distinct index is the same sketch); exact companions always come
    * from the batch index. One grading path for both executions. */
  private[graft] def thetaChurnWith(spark: SparkSession, dir: String,
      sketches: Option[DataFrame]): DataFrame = {
    val wu = Tables(spark, dir, "events")
      .select(date_trunc("week", col("ts")).as("week"), col("user_id"))
      .distinct().localCheckpoint()
    val counts = wu.groupBy(col("week")).agg(count(lit(1)).as("n_users"))
    val wk = sketches match {
      case Some(sk) => counts.join(sk, Seq("week"))
      case None => counts.join(
        wu.groupBy(col("week"))
          .agg(expr("theta_sketch_agg(user_id)").as("sk")), Seq("week"))
    }
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("week"))
    val pairs = wk
      .withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("prev_sk", lag(col("sk"), 1).over(w))
      .where(col("prev_week") === col("week") - expr("INTERVAL 7 DAYS"))
    val prev = wu.select(
      (col("week") + expr("INTERVAL 7 DAYS")).as("week"),
      col("user_id"))
    val exactNew = wu.join(prev, Seq("week", "user_id"), "left_anti")
      .groupBy(col("week")).agg(count(lit(1)).as("n_new"))
    // LEFT + zero-fill: a week where every user was already active last
    // week has NO row in exactNew — dropping it from the report is the
    // q176 zero-fill trap (zero churn IS the answer, not a missing row)
    pairs.join(exactNew, Seq("week"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .select(col("week"), col("n_users"), col("n_new"),
        (abs(expr("theta_sketch_estimate(theta_difference(sk, prev_sk))") -
          col("n_new")) <=
          greatest(lit(16L), expr("(n_users * 5) div 100")))
          .as("within_bound"))
  }

  private[graft] def thetaChurnOracleSql: String = thetaChurnSql

  private val thetaChurnSql =
    """WITH wu AS (
      |  SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
      |    user_id FROM events),
      |wk AS (SELECT week, CAST(count(*) AS BIGINT) AS n_users
      |  FROM wu GROUP BY week),
      |pairs AS (
      |  SELECT a.week, a.n_users FROM wk a
      |  JOIN wk b ON b.week = a.week - INTERVAL 7 DAY),
      |nw AS (
      |  SELECT a.week, CAST(count(*) AS BIGINT) AS n_new
      |  FROM wu a LEFT JOIN wu b
      |    ON b.user_id = a.user_id AND b.week = a.week - INTERVAL 7 DAY
      |  WHERE b.user_id IS NULL GROUP BY a.week)
      |SELECT p.week, p.n_users,
      |  CAST(coalesce(nw.n_new, 0) AS BIGINT) AS n_new,
      |  TRUE AS within_bound
      |FROM pairs p LEFT JOIN nw ON nw.week = p.week""".stripMargin

  // ---- q255: correlation matrix -------------------------------------------

  /** Variables of the q255 matrix: short name -> (column, its exact
    * decimal-cents expression is shared by both engines). All four are
    * raw ≤2-dp doubles, so the integer-cents moments are exact. */
  private val corrVars = Seq("qty" -> "l_quantity", "price" -> "l_extendedprice",
    "disc" -> "l_discount", "tax" -> "l_tax")
  private val corrPairs = for {
    (a, i) <- corrVars.map(_._1).zipWithIndex
    b <- corrVars.map(_._1).drop(i + 1)
  } yield (a, b)

  /** q255: CORRELATION MATRIX — all six pairwise correlations of
    * (quantity, price, discount, tax) in ONE scan: the q118 exact-moment
    * technique widened to the full moment vector (4 sums, 4 squares, 6
    * cross-products, all DECIMAL(38,0)/HUGEINT-exact), then every
    * correlation derived through literally the same IEEE expression tree
    * in both engines. This is the feature-analysis shape (feature
    * redundancy, leakage screens) where calling native `corr` 6 times
    * would be 6 scans of non-deterministic accumulation — here it is one
    * map-side-partial aggregate and 6 rows of planning-scale arithmetic.
    * Degenerate (constant) variables drop their pairs via the exact
    * min<max guard, q118's overflow-free test. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    def cents(c: String) = (col(c).cast(DecimalType(12, 2)) * 100).cast("long")
    // 26 decimal aggregates fuse onto this scan — ONE task on the
    // unsplittable single-file input (2.1 s measured); project to the 4
    // cents columns, then rebalance (guide §2.5, no-op on split inputs)
    val base = Tables.spread(spark, dir, "lineitem",
      Tables(spark, dir, "lineitem")
        .select(corrVars.map { case (n, c) => cents(c).as(n) }: _*))
    val aggs =
      corrVars.flatMap { case (n, _) => Seq(
        sum(col(n).cast(d38)).as(s"s_$n"),
        sum((col(n).cast(d19) * col(n).cast(d19)).cast(d38)).as(s"ss_$n"),
        min(col(n)).as(s"lo_$n"), max(col(n)).as(s"hi_$n"))
      } ++ corrPairs.map { case (a, b) =>
        sum((col(a).cast(d19) * col(b).cast(d19)).cast(d38)).as(s"sp_${a}_$b")
      }
    val m = base.agg(count(lit(1)).as("n"), aggs: _*)
    val nd = col("n").cast("double")
    def sd(v: String) = col(s"s_$v").cast("double") / 100d
    def ssd(v: String) = col(s"ss_$v").cast("double") / 10000d
    def spd(a: String, b: String) = col(s"sp_${a}_$b").cast("double") / 10000d
    val rows = corrPairs.map { case (a, b) =>
      val covp = spd(a, b) / nd - (sd(a) / nd) * (sd(b) / nd)
      val varA = ssd(a) / nd - (sd(a) / nd) * (sd(a) / nd)
      val varB = ssd(b) / nd - (sd(b) / nd) * (sd(b) / nd)
      struct(lit(a).as("var_x"), lit(b).as("var_y"), col("n").as("n"),
        (covp / sqrt(varA * varB)).as("corr"),
        (col(s"lo_$a") < col(s"hi_$a") && col(s"lo_$b") < col(s"hi_$b"))
          .as("ok"))
    }
    m.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .where(col("ok")).drop("ok")
  }

  private val corrMatrixSql = {
    def xc(c: String) = s"CAST(CAST($c AS DECIMAL(12,2)) * 100 AS BIGINT)"
    val moments =
      corrVars.flatMap { case (n, c) => Seq(
        s"sum(${xc(c)}) AS s_$n",
        s"sum(CAST(${xc(c)} AS HUGEINT) * ${xc(c)}) AS ss_$n",
        s"min(${xc(c)}) AS lo_$n", s"max(${xc(c)}) AS hi_$n")
      } ++ corrPairs.map { case (a, b) =>
        val (ca, cb) = (corrVars.toMap.apply(a), corrVars.toMap.apply(b))
        s"sum(CAST(${xc(ca)} AS HUGEINT) * ${xc(cb)}) AS sp_${a}_$b"
      }
    val doubles =
      corrVars.flatMap { case (n, _) => Seq(
        s"CAST(s_$n AS DOUBLE) / 100 AS sd_$n",
        s"CAST(ss_$n AS DOUBLE) / 10000 AS ssd_$n",
        s"lo_$n", s"hi_$n")
      } ++ corrPairs.map { case (a, b) =>
        s"CAST(sp_${a}_$b AS DOUBLE) / 10000 AS spd_${a}_$b"
      }
    val selects = corrPairs.map { case (a, b) =>
      val covp = s"spd_${a}_$b / nd - (sd_$a / nd) * (sd_$b / nd)"
      val varA = s"(ssd_$a / nd - (sd_$a / nd) * (sd_$a / nd))"
      val varB = s"(ssd_$b / nd - (sd_$b / nd) * (sd_$b / nd))"
      s"""SELECT '$a' AS var_x, '$b' AS var_y, n,
         |  ($covp) / sqrt($varA * $varB) AS corr
         |FROM d WHERE lo_$a < hi_$a AND lo_$b < hi_$b""".stripMargin
    }
    s"""WITH m AS (
       |  SELECT count(*) AS n, ${moments.mkString(",\n    ")}
       |  FROM lineitem),
       |d AS (
       |  SELECT n, CAST(n AS DOUBLE) AS nd, ${doubles.mkString(",\n    ")}
       |  FROM m)
       |${selects.mkString("\nUNION ALL\n")}""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q255_corr_matrix", corrMatrix, Some(corrMatrixSql)),
    QueryDef("q207_theta_churn", thetaChurn, Some(thetaChurnSql)),
    QueryDef("q49_map_json", mapJsonFuncs, Some(mapJsonFuncsSql)),
    QueryDef("q118_bivariate_stats", bivariateStats, Some(bivariateStatsSql)),
    QueryDef("q48_percentile_exact", percentileExact, Some(percentileExactSql)),
    QueryDef("q40_string_funcs", stringFuncs, Some(
      """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
        |  substring(p_name, 1, 8) AS name8, length(p_name) AS name_len,
        |  concat(p_brand, '#', p_type) AS brand_type,
        |  regexp_extract(p_name, '[0-9]+') AS first_num
        |FROM part""".stripMargin)),
    QueryDef("q41_date_funcs", dateFuncs, Some(
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
         |  count(*) AS n, ${sqlSum2("o_totalprice")} AS tot
         |FROM orders GROUP BY 1, 2""".stripMargin)),
    QueryDef("q42_math_funcs", mathFuncs, Some(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1.0 + l_tax) AS DECIMAL(27,4)) AS DOUBLE) AS gross,
        |  abs(l_discount - 0.05) AS dd,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qc,
        |  CAST(floor(l_quantity) AS BIGINT) AS qf,
        |  sqrt(l_quantity) AS qs
        |FROM lineitem""".stripMargin)),
    QueryDef("q43_json_funcs", jsonFuncs, Some(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type""".stripMargin)),
    QueryDef("q44_case_when", caseWhen, Some(
      s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
         |  WHEN o_totalprice < 300000 THEN 'mid' ELSE 'big' END AS bucket,
         |  count(*) AS n, ${sqlSum2("o_totalprice")} AS tot
         |FROM orders GROUP BY 1""".stripMargin)),
    QueryDef("q45_array_funcs", arrayFuncs, Some(
      """SELECT vec_id, CAST(len(v) AS BIGINT) AS dim, list_max(v) AS mx,
        |  list_min(v) AS mn, v[1] AS h1, v[2] AS h2, v[3] AS h3,
        |  CAST(list_position(v, list_max(v)) AS BIGINT) AS pos_max
        |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)""".stripMargin)),
    QueryDef("q46_agg_extras", aggExtras, Some(
      """SELECT c_mktsegment,
        |  max_by(c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    * 10000000 + c_custkey) AS top_cust,
        |  min_by(c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    * 10000000 + c_custkey) AS bottom_cust,
        |  CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_pos,
        |  array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations
        |FROM customer GROUP BY c_mktsegment""".stripMargin)),
    QueryDef("q47_sketch_aggs", sketchAggs, Some(sketchAggsSql)),
    QueryDef("q47b_sketch_bounds", sketchBounds, Some(sketchBoundsSql)),
    QueryDef("q145_sketch_rollup", sketchRollup, Some(sketchRollupSql)),
    QueryDef("q151_sliding_distinct", slidingDistinct,
      Some(slidingDistinctSql)),
    QueryDef("q156_variant", variantExtract, Some(variantExtractSql)),
    QueryDef("q157_sketch_cube", sketchCube, Some(sketchCubeSql)))
}
