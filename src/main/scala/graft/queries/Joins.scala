package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join surface: broadcast-hash, shuffle (sort-merge), multi-way star join,
  * semi/anti, outer, and an equi+range join. The reference has no joins at
  * all (SURVEY.md §2.2) — this is north-star breadth, designed for scale:
  * dimension tables are explicitly `broadcast()` so the fact scan never
  * shuffles for them; only genuinely large-large joins (lineitem⋈orders)
  * shuffle, on their natural key, with AQE free to pick SMJ/SHJ.
  */
object Joins {
  import Exact._

  /** Facts ⋈ broadcast dimension; aggregation keyed on the dim attribute. */
  def revenueBySegment(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .join(broadcast(Tables(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(dsum2(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))

  /** Large⋈large on the natural key — shuffle join, partial agg above it. */
  def revenueByStatusYear(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  /** TPC-H Q5-shaped star join: one big fact chain + broadcast dims. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  def custWithOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))

  /** Customers with no order since 2001 (anti join against a filtered,
    * pushed-down right side). */
  def custWithoutRecentOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(
        Tables(spark, dir, "orders")
          .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  def ordersPerCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))

  /** Equi key + range predicate: ships-within-a-week lineitems. The equi key
    * carries the shuffle; the range is a post-join filter — the scalable
    * shape for interval joins with a natural equi component. */
  def shippedWithinWeek(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  /** As-of join: each event matched to the same customer's most recent
    * order day at-or-before the event time. Implemented as union + ordered
    * window (last non-null carry-forward) — ONE shuffle+sort on the key,
    * never the quadratic equi+range join; this is the shape that survives
    * 100 TB (a range join would explode on hot keys, this stays linear).
    * Order rows sort before event rows at equal timestamps so `>=`
    * (inclusive) as-of semantics hold. */
  def lastOrderAsOf(spark: SparkSession, dir: String): DataFrame = {
    val dayOrders = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("t"))
      .agg(dsum2(col("o_totalprice")).as("day_spend"))
    val ord = dayOrders.select(col("key"), col("t"), lit(0).as("tag"),
      lit(null).cast("long").as("event_id"), col("day_spend"))
    val ev = Tables(spark, dir, "events").select(col("user_id").as("key"),
      col("ts").as("t"), lit(1).as("tag"), col("event_id"),
      lit(null).cast("double").as("day_spend"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("t").asc, col("tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("asof_day",
        last(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w))
      .withColumn("asof_spend",
        last(col("day_spend"), ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col("event_id"), col("key").as("user_id"),
        col("asof_day"), col("asof_spend"))
  }

  /** q27b: the SAME as-of semantics through the engine's native physical
    * operator (graft.plans.AsOfJoinExec — logical node + strategy + exec):
    * both sides co-partition on the key (one exchange each, the
    * distribution a shuffle join pays anyway), sort locally by (key, time),
    * and a single forward merge streams the match — no union row-blowup, no
    * window state carrying payload columns, per-partition memory = one
    * buffered build row. Gated by the same DuckDB ASOF JOIN oracle as q27,
    * so the two implementations can never drift. */
  def lastOrderAsOfNative(spark: SparkSession, dir: String): DataFrame = {
    val dayOrders = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("t"))
      .agg(dsum2(col("o_totalprice")).as("day_spend"))
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoin(ev, dayOrders, "user_id", "key", "ts", "t")
      .select(col("event_id"), col("user_id"),
        col("t").as("asof_day"), col("day_spend").as("asof_spend"))
  }

  /** q135: SCD TYPE-2 dimension build — the warehouse versioning pattern:
    * each (customer, day) spend observation becomes a validity INTERVAL
    * [valid_from, valid_to) with the current row open-ended, so any fact
    * can as-of join the version that was true at its timestamp. One
    * window (`lead` over the change key) on one shuffle — the standard
    * build; the intervals are exactly what q27/q27b resolve against.
    * `is_current` as exact integer (BOOLEAN casts differ across engines'
    * sort/hash paths less predictably than a 0/1). */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("valid_from").asc)
    Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("valid_from"))
      .agg(dsum2(col("o_totalprice")).as("day_spend"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
  }

  /** q133: STREAMING point-in-time enrichment — each arriving micro-batch
    * of events is as-of joined against the static day-spend table through
    * the native operator, inside `foreachBatch` (the feature-store lookup
    * every online-training pipeline runs). Stateless per batch: append
    * mode, idempotent batchId-keyed sink, no watermark, no stream state —
    * the static side would be a broadcast-cached table on a cluster. The
    * union of per-batch joins over a finite replay IS the batch as-of
    * join, so q27's DuckDB ASOF oracle gates the whole streaming path. */
  def streamAsOf(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.boundedEventPerBatchRun(spark, dir,
      batch => {
        val s = batch.sparkSession
        val dayOrders = Tables(s, dir, "orders")
          .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("t"))
          .agg(dsum2(col("o_totalprice")).as("day_spend"))
        graft.plans.AsOfJoin(
          batch.select(col("event_id"), col("user_id"), col("ts")),
          dayOrders, "user_id", "key", "ts", "t")
          .select(col("event_id"), col("user_id"),
            col("t").as("asof_day"), col("day_spend").as("asof_spend"))
      })

  /** Skew-mitigated join via DIFFERENTIATED salting: only detected hot
    * keys are treated. A seeded sample of the probe side estimates per-key
    * frequency (at 100 TB you never full-scan just to find skew); keys over
    * the threshold form a small broadcast hot set. Hot probe rows get a
    * deterministic salt in [0, S); hot build rows are replicated S ways;
    * cold rows on BOTH sides pass through once with salt 0. Replication
    * volume is |hot build rows| x S — independent of the table size —
    * unlike naive salting, which replicates the entire build side S ways
    * and multiplies 100 TB of shuffle by S. Result is provably identical
    * to the unsalted join for ANY hot-set choice (the oracle IS the
    * unsalted join); AQE's skew-join covers moderate skew, this is the
    * pattern for pathological keys. */
  def revenueByPrioritySalted(spark: SparkSession, dir: String): DataFrame = {
    val S = 8
    val li = Tables(spark, dir, "lineitem")
    val hot = li.sample(withReplacement = false, 0.25, seed = 42)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2) // est >= ~8 rows/key at 4x sampling
      .select(col("l_orderkey").as("hot_key"))
    val probe = li
      .join(broadcast(hot), col("l_orderkey") === col("hot_key"), "left")
      .withColumn("salt",
        when(col("hot_key").isNotNull, pmod(col("l_linenumber"), lit(S)))
          .otherwise(lit(0)))
      .drop("hot_key")
    val build = Tables(spark, dir, "orders")
      .join(broadcast(hot), col("o_orderkey") === col("hot_key"), "left")
      .withColumn("salt", explode(
        when(col("hot_key").isNotNull, lit((0 until S).toArray))
          .otherwise(array(lit(0)))))
      .drop("hot_key")
    probe.join(build,
        probe("l_orderkey") === build("o_orderkey") &&
          probe("salt") === build("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(dsum2(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
  }

  /** Bucketed co-located join: both sides written bucketBy(8) + sortBy on
    * the join key, then joined as SMJ (merge hint, so the test-SF data
    * doesn't broadcast) — bucketing satisfies the join's distribution
    * requirement, so the plan has NO shuffle exchange on either side. The
    * 100 TB pattern for repeatedly-joined tables: pay the shuffle once at
    * write time, never again per query. The write is part of the query so
    * the driver exercises the full path (idempotent overwrite). */
  def revenueBySegmentBucketed(spark: SparkSession, dir: String): DataFrame = {
    val orders = Warehouse.materializeBucketed(spark,
      Tables(spark, dir, "orders"),
      "graft_orders_bucketed", 8, Seq("o_custkey"))
    val customer = Warehouse.materializeBucketed(spark,
      Tables(spark, dir, "customer"),
      "graft_customer_bucketed", 8, Seq("c_custkey"))
    orders.hint("merge")
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(dsum2(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
  }

  /** q144: GLOBAL interval-overlap join — error incidents [ts, ts+300s)
    * against purchase activity windows [ts, ts+300s), with NO equi key:
    * "which purchases happened while an error was live, platform-wide".
    * The interval-interval generalization of q26's point-in-interval
    * range join, and the shape (incident correlation, conflict
    * detection, co-occurring spans) that a naive planner turns into a
    * cartesian product with a post-filter.
    *
    * Scale design — GRID BUCKETING: time is cut into 600 s cells (≥ max
    * interval length, so each interval spans at most 2 cells); each side
    * explodes to its spanned cells (bounded ×2 fan-out), the join is a
    * plain EQUI join on the cell id, and each surviving pair is counted
    * exactly once by the first-shared-cell rule (cell ==
    * max(start_a, start_b) div W — no distinct pass). Work is
    * Σ_cell |A_cell|·|B_cell| — interval density², never |A|·|B| — and
    * the cell key is a plain shuffle key, so AQE's skew split handles an
    * incident storm in one hot cell. All arithmetic is exact integer
    * epoch-microseconds (unix_micros / epoch_us), half-open overlap
    * `sa < eb AND sb < ea`, so the pair set hash-matches the oracle's
    * quadratic reference join bit-for-bit. */
  def intervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val W = 600000000L // 600 s grid, micros
    val ev = Tables(spark, dir, "events")
    def side(t: String, idName: String, s: String, e: String): DataFrame =
      ev.where(col("event_type") === t)
        .select(col("event_id").as(idName),
          unix_micros(col("ts")).as(s),
          (unix_micros(col("ts")) + 300000000L).as(e))
    val a = side("error", "err_id", "sa", "ea")
      .withColumn("bk", explode(expr(s"sequence(sa div $W, (ea - 1) div $W)")))
    val b = side("purchase", "buy_id", "sb", "eb")
      .withColumn("bk", explode(expr(s"sequence(sb div $W, (eb - 1) div $W)")))
    a.join(b, Seq("bk"))
      .where(col("sa") < col("eb") && col("sb") < col("ea") &&
        col("bk") === expr(s"greatest(sa, sb) div $W"))
      .select(col("err_id"), col("buy_id"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
          .as("overlap_us"))
  }

  private val intervalOverlapSql =
    """WITH a AS (
      |  SELECT event_id AS err_id, epoch_us(ts) AS sa,
      |    epoch_us(ts) + 300000000 AS ea
      |  FROM events WHERE event_type = 'error'),
      |b AS (
      |  SELECT event_id AS buy_id, epoch_us(ts) AS sb,
      |    epoch_us(ts) + 300000000 AS eb
      |  FROM events WHERE event_type = 'purchase')
      |SELECT err_id, buy_id,
      |  least(ea, eb) - greatest(sa, sb) AS overlap_us
      |FROM a JOIN b ON sa < eb AND sb < ea""".stripMargin

  /** q152: LAST-TOUCH ATTRIBUTION — each purchase credited to the same
    * user's most recent click if it happened within the 7-day window,
    * otherwise organic; daily conversion totals. The canonical funnel
    * workload, and the second consumer of the engine's NATIVE as-of
    * physical operator (q27b's `AsOfJoinExec`: co-partitioned streaming
    * merge, one buffered build row per partition) — the windowing is a
    * post-match filter on the matched TIME, so hot users never expand
    * into an equi+range pair space. Only the matched time (not the click
    * row) feeds the output, so build-side timestamp ties cannot
    * introduce nondeterminism. All counts exact integers. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("ck"), col("ts").as("ct"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val within7d = col("ct").isNotNull &&
      (unix_micros(col("ts")) - unix_micros(col("ct")) <= 604800000000L)
    graft.plans.AsOfJoin(purchases, clicks, "user_id", "ck", "ts", "ct")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        count_if(within7d).as("n_attributed"),
        count_if(!within7d).as("n_organic"))
  }

  private val attributionSql =
    """WITH c AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase')
      |SELECT CAST(date_trunc('day', p.ts) AS TIMESTAMP) AS day,
      |  count(*) AS n_purchases,
      |  count(*) FILTER (WHERE c.ts IS NOT NULL
      |    AND epoch_us(p.ts) - epoch_us(c.ts) <= 604800000000)
      |    AS n_attributed,
      |  count(*) FILTER (WHERE c.ts IS NULL
      |    OR epoch_us(p.ts) - epoch_us(c.ts) > 604800000000) AS n_organic
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |GROUP BY 1""".stripMargin

  // ---- q214: runtime bloom-filter join pushdown ---------------------------

  /** q214: RUNTIME FILTER pushdown — Spark's bloom-filter semi-join
    * reduction, the mechanism that saves a shuffle-join's probe side at
    * warehouse scale: the optimizer plans a `bloom_filter_agg` over the
    * selective build side's join keys and injects `might_contain` into
    * the PROBE SIDE'S SCAN FILTER, so probe rows that cannot match die
    * at the scan instead of crossing the exchange. This matters exactly
    * when the dim side is too large to broadcast (a broadcast join needs
    * no runtime filter) — here that regime is forced scoped-ly, and the
    * small-SF-only scan-size threshold is lowered because the feature
    * self-selects via a 10 GB default at production scan sizes. The
    * confs live on a DEDICATED CLONED SESSION (same SparkContext, own
    * SQLConf) that the returned frame is bound to — so EVERY consumer
    * plan of this frame (Verify's write re-plan, AQE re-optimization)
    * executes under them, not just a pre-forced QueryExecution; the
    * caller's session conf is never touched, which is the same
    * side-effect discipline as save/restore without the window where a
    * re-plan escapes the feature. `PlanSpec` pins the injected
    * might_contain/bloom_filter_agg pair and the SMJ; the oracle is the
    * plain join-aggregate — a filter that wrongly drops a matching row
    * (bloom filters must never false-negative) fails the hash.
    * Quantities are whole-valued, so the aggregate stays in exact longs. */
  def runtimeFilterJoin(spark: SparkSession, dir: String): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables(s2, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val ord = Tables(s2, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  private val runtimeFilterJoinSql =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag""".stripMargin

  // ---- q291: statistics-driven star-join planning (cost-based order) ------

  /** q291: COST-BASED STAR-JOIN ORDER — the consumer that closes the
    * optimizer-statistics family (q239 histogram, q282 CMS join
    * cardinality, q283 range selectivity, q284 skew keys): an ANALYZE
    * pass per dimension feeds a System-R-style planner that picks the
    * JOIN ORDER and the BROADCAST decisions, instead of trusting the
    * order the query was written in.
    *
    * The query is deliberately authored WORST-first (supplier — no
    * filter — then orders, then part); the planner re-derives the order
    * from statistics: each dimension's POST-FILTER cardinality is
    * estimated by the System-R uniform-NDV rule rows × 1/ndv(filterCol)
    * (the NDVs come from one exact count-distinct per dim — at 100 TB
    * that's HLL, q47's sketch, same decision; the estimate is integer
    * rows·10⁶/ndv so the oracle can recompute it exactly), joins are
    * ordered smallest-estimate-first (name as the deterministic
    * tiebreak), and a dimension is broadcast only when its
    * ESTIMATED post-filter bytes (rows/ndv × schema default row width)
    * clear the 8 MB budget — the q127 size-gate discipline applied to
    * join planning. The chosen order is emitted as `join_order` and the
    * ORACLE RECOMPUTES IT in SQL from the same statistics — the planner's
    * decision, not just the join result, is hash-graded cross-engine.
    * `PlanSpec` pins the physical plan: scans appear in planned order and
    * every under-budget dim is a broadcast build side.
    *
    * At 100 TB: ANALYZE is one aggregate per dimension (amortized across
    * queries in a real deployment); ordering most-selective-first
    * minimizes the intermediate fact width after each join — the
    * difference between shuffling the full fact three times and
    * shrinking it 50× at the first join. */
  def cboStarJoin(spark: SparkSession, dir: String): DataFrame = {
    final case class DimSpec(name: String, dimKey: String, factKey: String,
        filterCol: Option[String], pred: DataFrame => DataFrame)
    // authored order is deliberately bad: unfiltered supplier first
    val specs = Seq(
      DimSpec("supplier", "s_suppkey", "l_suppkey", None, identity),
      DimSpec("orders", "o_orderkey", "l_orderkey", Some("o_orderstatus"),
        _.where(col("o_orderstatus") === "F")),
      DimSpec("part", "p_partkey", "l_partkey", Some("p_size"),
        _.where(col("p_size") === 3)))
    // ANALYZE: rows + filter-column NDV per dim — one tiny agg each
    val analyzed = specs.map { s =>
      val full = Tables(spark, dir, s.name)
      val (rows, ndv) = s.filterCol match {
        case Some(c) =>
          val r = full.agg(count(lit(1)), countDistinct(col(c))).head()
          (r.getLong(0), r.getLong(1))
        case None =>
          (full.agg(count(lit(1))).head().getLong(0), 1L)
      }
      (s, full, rows, ndv)
    }
    // plan: smallest estimated post-filter cardinality first, name tiebreak
    // (integer rows·10⁶/ndv — the exact arithmetic the oracle recomputes)
    val planned = analyzed.sortBy { case (s, _, rows, ndv) =>
      (rows * 1000000L / math.max(ndv, 1L), s.name)
    }
    val budgetBytes = 8L << 20
    val joined = planned.foldLeft(Tables(spark, dir, "lineitem")) {
      case (acc, (s, full, rows, ndv)) =>
        val estBytes = (rows / math.max(ndv, 1L)) *
          full.schema.map(_.dataType.defaultSize).sum
        val dim = s.pred(full)
        val side = if (estBytes <= budgetBytes) broadcast(dim) else dim
        acc.join(side, col(s.factKey) === col(s.dimKey))
    }
    val orderSig = planned.map(_._1.name).mkString(",")
    joined.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .select(col("p_brand"), col("n"), col("revenue"),
        lit(orderSig).as("join_order"))
  }

  private val cboStarJoinSql =
    s"""WITH sig AS (
       |  SELECT string_agg(d, ',' ORDER BY est, d) AS join_order FROM (
       |    SELECT 'part' AS d,
       |      (SELECT count(*) * 1000000 // COUNT(DISTINCT p_size) FROM part) AS est
       |    UNION ALL SELECT 'orders',
       |      (SELECT count(*) * 1000000 // COUNT(DISTINCT o_orderstatus) FROM orders)
       |    UNION ALL SELECT 'supplier',
       |      (SELECT count(*) * 1000000 FROM supplier)))
       |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  sig.join_order
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_size = 3
       |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
       |JOIN supplier ON l_suppkey = s_suppkey
       |CROSS JOIN sig
       |GROUP BY 1, 4""".stripMargin

  // ---- q294: the join reorder as an OPTIMIZER RULE -------------------------

  /** q294: RULE-LEVEL JOIN REORDER — q291's planning decision moved into
    * the engine itself (`graft.plans.JoinReorderRule`, injected via
    * `GraftExtensions`): the star is authored WORST-first with plain
    * `.join(...)` calls — no planner helper, no hints — and the optimizer
    * fixes it, exactly like Spark's own CBO does for ANALYZEd catalog
    * tables. An ANALYZE pass per dimension registers (rows, ndv) into the
    * rule's session-keyed statistics registry; the rule rewrites the
    * left-deep inner chain smallest-estimate-first under the star guard
    * (every condition binds fact + own leg only). The decision is read
    * BACK from the OPTIMIZED plan — the dims' scan order — and emitted as
    * `join_order`, which the oracle recomputes in SQL from the same
    * statistics: the driver hash-grades what the optimizer actually did,
    * not what the code intended. The result is materialized before the
    * registrations are dropped, so the statistics never leak into other
    * registry entries' plans. */
  def cboRuleReorder(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.JoinReorderRule
    val dims = Seq("part" -> Seq("p_size"), "orders" -> Seq("o_orderstatus"),
      "supplier" -> Seq.empty[String])
    dims.foreach { case (t, cols) =>
      JoinReorderRule.analyze(spark, s"$dir/$t.parquet", cols)
    }
    try {
      // authored order deliberately worst-first; no hints, no helper
      val agg = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders").where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(spark, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables(spark, dir, "part").where(col("p_size") === 3),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
      // the decision the optimizer MADE: dim scans in plan order
      val order = agg.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.head.getName.stripSuffix(".parquet")
            case _ => ""
          }
      }.filter(t => dims.exists(_._1 == t))
      val materialized = agg.localCheckpoint() // plan decided; pin it
      materialized.select(col("p_brand"), col("n"), col("revenue"),
        lit(order.mkString(",")).as("join_order"))
    } finally dims.foreach { case (t, _) =>
      JoinReorderRule.drop(spark, s"$dir/$t.parquet")
    }
  }

  private val cboRuleReorderSql =
    s"""WITH sig AS (
       |  SELECT string_agg(d, ',' ORDER BY est, d) AS join_order FROM (
       |    SELECT 'part' AS d,
       |      (SELECT count(*) * 1000000 // COUNT(DISTINCT p_size) FROM part) AS est
       |    UNION ALL SELECT 'orders',
       |      (SELECT count(*) * 1000000 // COUNT(DISTINCT o_orderstatus) FROM orders)
       |    UNION ALL SELECT 'supplier',
       |      (SELECT count(*) * 1000000 FROM supplier)))
       |SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  sig.join_order
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_size = 3
       |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
       |JOIN supplier ON l_suppkey = s_suppkey
       |CROSS JOIN sig
       |GROUP BY 1, 4""".stripMargin

  // ---- q312: the SNOWFLAKE hop through the reorder rule ---------------------

  /** q312: SNOWFLAKE JOIN REORDER — q294's rule decision extended to the
    * dim-of-dim shape: customer hangs off ORDERS (`o_custkey = c_custkey`
    * binds no lineitem column), so the chain is not a pure star and the
    * round-11 rule declined it. The rule now fuses the snowflake child to
    * its parent and permutes UNITS — authored worst-first
    * (orders→customer first, filtered part last), the optimizer moves the
    * cheap part leg ahead of the fused orders+customer block. The
    * decision is read back from the OPTIMIZED plan and hash-graded by an
    * oracle that recomputes the unit estimates (leg products) from the
    * same statistics in SQL — the q294 discipline on the new shape. */
  def cboSnowflakeReorder(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.JoinReorderRule
    val dims = Seq("orders" -> Seq("o_orderstatus"),
      "customer" -> Seq.empty[String], "part" -> Seq("p_size"))
    dims.foreach { case (t, cols) =>
      JoinReorderRule.analyze(spark, s"$dir/$t.parquet", cols)
    }
    try {
      val agg = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders").where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey")) // the snowflake hop
        .join(Tables(spark, dir, "part").where(col("p_size") === 3),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
      val order = agg.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.head.getName.stripSuffix(".parquet")
            case _ => ""
          }
      }.filter(t => dims.exists(_._1 == t))
      val materialized = agg.localCheckpoint()
      materialized.select(col("c_mktsegment"), col("n"), col("revenue"),
        lit(order.mkString(",")).as("join_order"))
    } finally dims.foreach { case (t, _) =>
      JoinReorderRule.drop(spark, s"$dir/$t.parquet")
    }
  }

  private val cboSnowflakeReorderSql =
    s"""WITH e AS (
       |  SELECT (SELECT CAST(count(*) AS HUGEINT) * 1000000
       |            // COUNT(DISTINCT p_size) FROM part) AS p,
       |         (SELECT CAST(count(*) AS HUGEINT) * 1000000
       |            // COUNT(DISTINCT o_orderstatus) FROM orders) AS o,
       |         (SELECT CAST(count(*) AS HUGEINT) * 1000000
       |            FROM customer) AS c),
       |-- the rule's Selinger prefix cost, enumerated over the three
       |-- topological orders of this forest (customer depends on orders)
       |sig AS (
       |  SELECT CASE
       |    WHEN p + p*o + p*o*c <= o + o*p + o*p*c
       |     AND p + p*o + p*o*c <= o + o*c + o*c*p
       |      THEN 'part,orders,customer'
       |    WHEN o + o*p + o*p*c <= o + o*c + o*c*p
       |      THEN 'orders,part,customer'
       |    ELSE 'orders,customer,part' END AS join_order
       |  FROM e)
       |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  sig.join_order
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
       |JOIN customer ON o_custkey = c_custkey
       |JOIN part ON l_partkey = p_partkey AND p_size = 3
       |CROSS JOIN sig
       |GROUP BY 1, 4""".stripMargin

  // ---- q327: Selinger DP over a two-branch dependency forest ----------------

  /** q327: BOUNDED-DP JOIN REORDER — the shape the pre-DP rule declined:
    * TWO dependent branches (customer off orders, nation off supplier)
    * hanging from one fact chain. The Selinger DP enumerates every
    * topological order of the forest and minimizes the System-R prefix
    * cost; here the cheap supplier→nation branch must land BEFORE the
    * filtered-but-still-larger orders→customer branch. The chosen order
    * is read from the OPTIMIZED plan and graded by the oracle, which
    * re-enumerates all six feasible orders and their exact HUGEINT costs
    * in SQL — a cost-model or tie-break divergence is a hash mismatch.
    * At 100 TB: multi-branch snowflakes are the norm (fact → dim → dim
    * per leg); ordering branches by authored position instead of cost
    * can carry a 1000× larger intermediate through every later join. */
  def cboForestReorder(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.JoinReorderRule
    val dims = Seq("orders" -> Seq("o_orderstatus"),
      "customer" -> Seq.empty[String], "supplier" -> Seq.empty[String],
      "nation" -> Seq.empty[String])
    dims.foreach { case (t, cols) =>
      JoinReorderRule.analyze(spark, s"$dir/$t.parquet", cols)
    }
    try {
      val agg = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders").where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey")) // branch 1 hop
        .join(Tables(spark, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables(spark, dir, "nation"),
          col("s_nationkey") === col("n_nationkey")) // branch 2 hop
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
      val order = agg.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.head.getName.stripSuffix(".parquet")
            case _ => ""
          }
      }.filter(t => dims.exists(_._1 == t))
      val materialized = agg.localCheckpoint()
      materialized.select(col("n_name"), col("n"), col("revenue"),
        lit(order.mkString(",")).as("join_order"))
    } finally dims.foreach { case (t, _) =>
      JoinReorderRule.drop(spark, s"$dir/$t.parquet")
    }
  }

  private val cboForestReorderSql =
    s"""WITH e AS (
       |  SELECT (SELECT CAST(count(*) AS HUGEINT) * 1000000
       |            // COUNT(DISTINCT o_orderstatus) FROM orders) AS o,
       |         (SELECT CAST(count(*) AS HUGEINT) * 1000000 FROM customer) AS c,
       |         (SELECT CAST(count(*) AS HUGEINT) * 1000000 FROM supplier) AS s,
       |         (SELECT CAST(count(*) AS HUGEINT) * 1000000 FROM nation) AS n),
       |-- all six topological orders of the forest {orders<customer,
       |-- supplier<nation}, each with its exact Selinger prefix cost
       |costs AS (
       |  SELECT 'supplier,nation,orders,customer' AS ord,
       |         s + s*n + s*n*o + s*n*o*c AS cost FROM e
       |  UNION ALL SELECT 'supplier,orders,nation,customer',
       |         s + s*o + s*o*n + s*o*n*c FROM e
       |  UNION ALL SELECT 'supplier,orders,customer,nation',
       |         s + s*o + s*o*c + s*o*c*n FROM e
       |  UNION ALL SELECT 'orders,supplier,nation,customer',
       |         o + o*s + o*s*n + o*s*n*c FROM e
       |  UNION ALL SELECT 'orders,supplier,customer,nation',
       |         o + o*s + o*s*c + o*s*c*n FROM e
       |  UNION ALL SELECT 'orders,customer,supplier,nation',
       |         o + o*c + o*c*s + o*c*s*n FROM e),
       |sig AS (SELECT ord AS join_order FROM costs ORDER BY cost, ord LIMIT 1)
       |SELECT n_name, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  sig.join_order
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |CROSS JOIN sig
       |GROUP BY 1, 4""".stripMargin

  // ---- q328: histogram range selectivity in the reorder cost model ----------

  /** q328: HISTOGRAM-DRIVEN REORDER — the estimate the NDV model cannot
    * make: a RANGE predicate (`o_totalprice > 485000`, the top ~3% of
    * orders) has selectivity 1 under equality-NDV statistics, so the
    * authored-order chain keeps the big filtered orders leg late and the
    * 13%-sized part dimension first. ANALYZE with a histogram column
    * builds the q239 exact equi-depth histogram (through the distributed
    * rank — no single-partition window) and [[graft.plans.JoinReorderRule]]
    * prices the range conjunct with the q283 estimator (full bins +
    * exact-integer interpolation in the straddling bin); the DP then
    * puts orders FIRST. The oracle rebuilds the same 10-bin histogram
    * and estimator in SQL — bin bounds, interpolation floors, and the
    * final order comparison are all exact integer arithmetic, so the
    * DECISION is under the hash, not just the row values. At 100 TB:
    * time-range and amount-range predicates dominate real filters;
    * pricing them at 1 forfeits most of the reorder win. */
  def cboHistogramReorder(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.JoinReorderRule
    JoinReorderRule.analyze(spark, s"$dir/orders.parquet", Nil,
      histCols = Seq("o_totalprice"))
    JoinReorderRule.analyze(spark, s"$dir/part.parquet", Nil)
    try {
      val agg = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders")
            .where(col("o_totalprice") > lit(485000.0)),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(spark, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
      val order = agg.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.head.getName.stripSuffix(".parquet")
            case _ => ""
          }
      }.filter(t => t == "orders" || t == "part")
      val materialized = agg.localCheckpoint()
      materialized.select(col("o_orderpriority"), col("n"), col("revenue"),
        lit(order.mkString(",")).as("join_order"))
    } finally {
      JoinReorderRule.drop(spark, s"$dir/orders.parquet")
      JoinReorderRule.drop(spark, s"$dir/part.parquet")
    }
  }

  private val cboHistogramReorderSql =
    s"""WITH pts AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p
       |  FROM orders WHERE o_totalprice IS NOT NULL),
       |hist AS (
       |  SELECT bin, count(*) AS n, min(p) AS lo, max(p) AS hi FROM (
       |    SELECT p, ntile(10) OVER (ORDER BY p) AS bin FROM pts) b
       |  GROUP BY 1),
       |-- the rule's estimator at thr = 48500000 cents (the q283 formula)
       |sel AS (
       |  SELECT sum(CASE WHEN lo > 48500000 THEN n::HUGEINT
       |    WHEN hi <= 48500000 THEN 0
       |    ELSE (n::HUGEINT * (hi - 48500000)) // (hi - lo) END) AS s,
       |    sum(n::HUGEINT) AS total
       |  FROM hist),
       |e AS (
       |  SELECT ((SELECT count(*)::HUGEINT FROM orders) * 1000000 * s)
       |           // total AS est_o,
       |         (SELECT count(*)::HUGEINT * 1000000 FROM part) AS est_p
       |  FROM sel),
       |sig AS (
       |  SELECT CASE WHEN est_o <= est_p THEN 'orders,part'
       |    ELSE 'part,orders' END AS join_order FROM e)
       |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  sig.join_order
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey AND o_totalprice > 485000.0
       |JOIN part ON l_partkey = p_partkey
       |CROSS JOIN sig
       |GROUP BY 1, 4""".stripMargin

  // ---- q316: ANALYZE-informed broadcast hints from the rule ----------------

  /** q316: STATISTICS-DRIVEN BROADCAST — the decision Spark's size-only
    * threshold cannot make: with `autoBroadcastJoinThreshold = -1` (no
    * size-based broadcast at all, the stand-in for "the raw file is too
    * big"), the reorder rule hints BROADCAST on legs whose ESTIMATED
    * post-filter bytes (file size × the registered-NDV selectivity) fit
    * the budget. The gate reads BOTH levels: the optimizer's join hints
    * (2 legs hinted with stats, 0 without) and the physical plan
    * (BroadcastHashJoin appears only with statistics registered) — then
    * the values are graded by the oracle as always. At 100 TB this is
    * the difference between shuffling a 2 TB dimension and broadcasting
    * the 50 MB that survive its filter. */
  def cboBroadcastHint(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.JoinReorderRule
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join => LJoin}
    val dims = Seq("part" -> Seq("p_size"), "supplier" -> Seq.empty[String])
    dims.foreach { case (t, c) =>
      JoinReorderRule.analyze(spark, s"$dir/$t.parquet", c)
    }
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thrKey)
    spark.conf.set(thrKey, "-1")
    try {
      def chain = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "part").where(col("p_size") === 3),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(spark, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
      def hintedJoins(df: DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case j: LJoin
              if j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) => j
        }.length
      def physBroadcasts(df: DataFrame): Boolean =
        df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
      val withStats = chain
      val hinted = hintedJoins(withStats)
      val phys = physBroadcasts(withStats)
      val materialized = withStats.localCheckpoint()
      dims.foreach { case (t, _) =>
        JoinReorderRule.drop(spark, s"$dir/$t.parquet")
      }
      val control = chain
      val ok = hinted == 2 && phys &&
        hintedJoins(control) == 0 && !physBroadcasts(control)
      materialized.select(col("p_brand"), col("n"), col("revenue"),
        lit(ok).as("stats_broadcast"))
    } finally {
      spark.conf.set(thrKey, saved)
      dims.foreach { case (t, _) =>
        JoinReorderRule.drop(spark, s"$dir/$t.parquet")
      }
    }
  }

  private val cboBroadcastHintSql =
    s"""SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  TRUE AS stats_broadcast
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_size = 3
       |JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY 1""".stripMargin

  // ---- q293: grid-bucketed spatial radius join -----------------------------

  /** q293: SPATIAL RADIUS JOIN — the 2-D member of the grid-bucketing
    * family (q144 buckets one axis for interval overlap; here both axes
    * bucket a planar point set). Each user gets a deterministic position
    * on a 100×100 plane (integer TENTHS — `user_id·37 mod 1000`,
    * `user_id·91 mod 1000` — so every coordinate, distance, and cell is
    * exact integer arithmetic, no trig/libm cross-engine hazard; at
    * production scale the same shape carries real projected coordinates
    * and a haversine refine). Radius r = 10 units = one cell: a point's
    * candidates live in its 3×3 cell neighborhood, so the probe side
    * explodes to 9 (cell, point) rows, joins the build side's home cell,
    * and refines on exact squared distance — O(n·density) candidates
    * instead of the O(n²) cross join. The ORACLE IS THE BRUTE FORCE
    * (DuckDB's full self-join): every run re-proves the grid lost no
    * pair, the q279 completeness discipline. */
  def gridRadiusJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables(spark, dir, "events")
      .select(col("user_id")).distinct()
      .select(col("user_id"),
        (col("user_id") * 37 % 1000).as("x"), // tenths of a unit
        (col("user_id") * 91 % 1000).as("y"))
    // home cell: 100 tenths = 10 units = r, integer division
    val home = pts
      .withColumn("cx", expr("x div 100")).withColumn("cy", expr("y div 100"))
    val offsets = spark.range(1).select(explode(array(
      (for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)).as("o"))
    val probe = home.crossJoin(broadcast(offsets))
      .select(col("user_id").as("a"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    val build = home.select(col("user_id").as("b"), col("x").as("bx"),
      col("y").as("by"), col("cx"), col("cy"))
    probe.join(build, Seq("cx", "cy"))
      .where(col("a") =!= col("b") &&
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")) <= lit(10000L))
      .groupBy(col("a").as("user_id"))
      .agg(count(lit(1)).as("n_near"),
        min((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))).as("min_d2"))
      .select(col("user_id"), col("n_near"), col("min_d2"))
  }

  private val gridRadiusJoinSql =
    """WITH pts AS (
      |  SELECT DISTINCT user_id, (user_id * 37) % 1000 AS x,
      |    (user_id * 91) % 1000 AS y
      |  FROM events)
      |SELECT a.user_id,
      |  CAST(count(*) AS BIGINT) AS n_near,
      |  min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS min_d2
      |FROM pts a JOIN pts b ON a.user_id <> b.user_id
      |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 10000
      |GROUP BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q291_cbo_star", cboStarJoin, Some(cboStarJoinSql)),
    QueryDef("q293_grid_radius", gridRadiusJoin, Some(gridRadiusJoinSql)),
    QueryDef("q294_cbo_rule", cboRuleReorder, Some(cboRuleReorderSql)),
    QueryDef("q312_cbo_snowflake", cboSnowflakeReorder,
      Some(cboSnowflakeReorderSql)),
    QueryDef("q316_cbo_broadcast", cboBroadcastHint,
      Some(cboBroadcastHintSql)),
    QueryDef("q327_cbo_forest", cboForestReorder,
      Some(cboForestReorderSql)),
    QueryDef("q328_cbo_histogram", cboHistogramReorder,
      Some(cboHistogramReorderSql)),
    QueryDef("q214_runtime_filter", runtimeFilterJoin, Some(runtimeFilterJoinSql)),
    QueryDef("q144_interval_join", intervalOverlap, Some(intervalOverlapSql)),
    QueryDef("q152_attribution", attribution, Some(attributionSql)),
    QueryDef("q20_join_broadcast", revenueBySegment, Some(
      s"""SELECT c_mktsegment, ${sqlSum2("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin)),
    QueryDef("q21_join_shuffle", revenueByStatusYear, Some(
      s"""SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1, 2""".stripMargin)),
    QueryDef("q22_join_star", revenueByNation, Some(
      s"""SELECT r_name, n_name,
         |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin)),
    QueryDef("q23_join_semi", custWithOrders, Some(
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment""".stripMargin)),
    QueryDef("q24_join_anti", custWithoutRecentOrders, Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin)),
    QueryDef("q25_join_outer", ordersPerCustomer, Some(
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin)),
    QueryDef("q26_join_range", shippedWithinWeek, Some(
      """SELECT o_orderpriority, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderpriority""".stripMargin)),
    QueryDef("q27_join_asof", lastOrderAsOf, Some(
      s"""WITH d AS (
         |  SELECT o_custkey AS key, o_orderdate AS t,
         |    ${sqlSum2("o_totalprice")} AS day_spend
         |  FROM orders GROUP BY 1, 2)
         |SELECT e.event_id, e.user_id, d.t AS asof_day, d.day_spend AS asof_spend
         |FROM events e ASOF LEFT JOIN d
         |  ON e.user_id = d.key AND e.ts >= d.t""".stripMargin)),
    QueryDef("q27b_asof_native", lastOrderAsOfNative, Some(
      s"""WITH d AS (
         |  SELECT o_custkey AS key, o_orderdate AS t,
         |    ${sqlSum2("o_totalprice")} AS day_spend
         |  FROM orders GROUP BY 1, 2)
         |SELECT e.event_id, e.user_id, d.t AS asof_day, d.day_spend AS asof_spend
         |FROM events e ASOF LEFT JOIN d
         |  ON e.user_id = d.key AND e.ts >= d.t""".stripMargin)),
    QueryDef("q133_stream_asof", streamAsOf, Some(
      s"""WITH d AS (
         |  SELECT o_custkey AS key, o_orderdate AS t,
         |    ${sqlSum2("o_totalprice")} AS day_spend
         |  FROM orders GROUP BY 1, 2)
         |SELECT e.event_id, e.user_id, d.t AS asof_day, d.day_spend AS asof_spend
         |FROM events e ASOF LEFT JOIN d
         |  ON e.user_id = d.key AND e.ts >= d.t""".stripMargin)),
    QueryDef("q135_scd2_build", scd2Build, Some(
      s"""SELECT key, valid_from, day_spend,
         |  lead(valid_from) OVER (PARTITION BY key ORDER BY valid_from)
         |    AS valid_to,
         |  CAST(CASE WHEN lead(valid_from) OVER (
         |    PARTITION BY key ORDER BY valid_from) IS NULL
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM (
         |  SELECT o_custkey AS key, o_orderdate AS valid_from,
         |    ${sqlSum2("o_totalprice")} AS day_spend
         |  FROM orders GROUP BY 1, 2) d""".stripMargin)),
    QueryDef("q29_join_bucketed", revenueBySegmentBucketed, Some(
      s"""SELECT c_mktsegment, ${sqlSum2("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin)),
    QueryDef("q28_join_salted", revenueByPrioritySalted, Some(
      s"""SELECT o_orderpriority, ${sqlSum2("l_quantity")} AS qty, count(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin)))
}
