package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface: scan/filter/project, aggregation (the
  * reference's core capability, O7/O10/O11), distinct, sort/limit, set ops,
  * rollup/cube. All declarative — Catalyst pushes the filters/projections
  * into the parquet scan and plans partial+final hash aggregation, which is
  * precisely the reference's per-chunk-reduce + add-merge model at scale.
  */
object Relational {
  import Exact._

  /** TPC-H Q1-shaped pricing summary: partial+final hash agg over ~4 groups;
    * at 100 TB this is a map-side-combine-dominated scan, the ideal shape. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        davg2(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val pricingSummarySql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum2("l_quantity")} AS sum_qty,
       |  ${sqlSum2("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlAvg2("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Filter+projection pushed to the parquet scan (PushedFilters/ReadSchema). */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("2000-06-01").cast("timestamp") &&
        col("l_discount") > 0.07)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_shipdate"))

  def distinctFlags(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    * no global sort; the only shape that survives 100 TB ordering. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  private def custNk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").select(col("c_nationkey").as("nk"))
  private def suppNk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "supplier").select(col("s_nationkey").as("nk"))

  def unionNations(spark: SparkSession, dir: String): DataFrame =
    custNk(spark, dir).union(suppNk(spark, dir)).distinct()

  def intersectNations(spark: SparkSession, dir: String): DataFrame =
    custNk(spark, dir).intersect(suppNk(spark, dir))

  /** Customers ordering in 1995 but never since 1999 (non-trivial EXCEPT). */
  def exceptLapsedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    orders.where(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("ck")).distinct()
      .except(orders.where(year(col("o_orderdate")) >= 1999)
        .select(col("o_custkey").as("ck")).distinct())
  }

  /** q121: the MULTISET set operations — `EXCEPT ALL` / `INTERSECT ALL`
    * keep per-row multiplicity (a partkey returned 3 times and kept 1 time
    * survives EXCEPT ALL twice), a different operator from the DISTINCT
    * forms of q15/q16: Spark plans them as a count-aggregate + replicate
    * (Generate) instead of a dedup join. Both branches in one result via
    * an op tag; multiplicities are engine-exact because both engines
    * implement the identical bag semantics. */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val a = li.where(col("l_returnflag") === "A").select(col("l_partkey"))
    val r = li.where(col("l_returnflag") === "R").select(col("l_partkey"))
    a.exceptAll(r).withColumn("op", lit("except_all"))
      .unionByName(a.intersectAll(r).withColumn("op", lit("intersect_all")))
  }

  private val setOpsAllSql =
    """SELECT l_partkey, 'except_all' AS op FROM (
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      |  EXCEPT ALL
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
      |UNION ALL
      |SELECT l_partkey, 'intersect_all' AS op FROM (
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      |  INTERSECT ALL
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')""".stripMargin

  /** q122: DATA-QUALITY AUDIT — the validation pass every production
    * pipeline runs before trusting a table: row count, key cardinality,
    * per-column null counts, domain-rule violations, and a referential
    * integrity check (lineitems whose order does not exist, via left
    * anti join). Every output is an exact integer count, so the audit is
    * bit-identical cross-engine with no float laundering. Plan shape: one
    * partial+final aggregate over the fact scan, one broadcast-side
    * anti-join count folded in by a 1×1 broadcast cross join — the fact
    * table is scanned twice and shuffled never. */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    val stats = li.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orderkeys"),
      count(when(col("l_quantity").isNull, 1)).as("n_null_qty"),
      count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1))
        .as("n_bad_discount"),
      count(when(col("l_shipdate").isNull, 1)).as("n_null_shipdate"))
    val orphans = li
      .join(orders, li("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    stats.crossJoin(broadcast(orphans))
  }

  private val dqAuditSql =
    """SELECT s.n_rows, s.n_orderkeys, s.n_null_qty, s.n_bad_discount,
      |  s.n_null_shipdate, o.n_orphans
      |FROM (
      |  SELECT count(*) AS n_rows,
      |    count(DISTINCT l_orderkey) AS n_orderkeys,
      |    count(CASE WHEN l_quantity IS NULL THEN 1 END) AS n_null_qty,
      |    count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END)
      |      AS n_bad_discount,
      |    count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS n_null_shipdate
      |  FROM lineitem) s,
      |  (SELECT count(*) AS n_orphans FROM lineitem l
      |   WHERE NOT EXISTS (
      |     SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) o""".stripMargin

  def rollupLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))

  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum2(col("o_totalprice")).as("tot"), count(lit(1)).as("cnt"))

  /** Explicit GROUPING SETS (beyond rollup/cube): (flag,status), (flag), ().
    * Catalyst plans one Expand + single hash agg — one shuffle for all sets. */
  def groupingSetsLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))

  /** Pivot: customer counts per market segment × region. Catalyst rewrites
    * pivot to a single hash agg with one conditional-count per pivot value —
    * one shuffle regardless of pivot width; the explicit value list keeps the
    * plan static (no driver-side distinct scan to discover columns). */
  def pivotSegments(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    val joined = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    joined.groupBy(col("c_mktsegment"))
      .pivot("n_regionkey", Seq(0, 1, 2, 3, 4))
      .count()
      .select(col("c_mktsegment") +:
        (0 to 4).map(r => coalesce(col(s"$r"), lit(0L)).as(s"r$r")): _*)
  }

  private val pivotSql =
    """SELECT c_mktsegment,
      |  count(*) FILTER (WHERE n_regionkey = 0) AS r0,
      |  count(*) FILTER (WHERE n_regionkey = 1) AS r1,
      |  count(*) FILTER (WHERE n_regionkey = 2) AS r2,
      |  count(*) FILTER (WHERE n_regionkey = 3) AS r3,
      |  count(*) FILTER (WHERE n_regionkey = 4) AS r4
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY c_mktsegment""".stripMargin

  /** Unpivot (wide metrics -> long): the inverse reshape, a zero-shuffle
    * Expand over the already-aggregated rows. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("n_rows"), col("n_orders")), "metric", "value")

  private val unpivotSql =
    """WITH a AS (
      |  SELECT l_returnflag, count(*) AS n_rows,
      |    count(DISTINCT l_orderkey) AS n_orders
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM a
      |UNION ALL
      |SELECT l_returnflag, 'n_orders' AS metric, n_orders AS value FROM a""".stripMargin

  /** Deterministic hash sampling (~5%): reproducible across runs, engines,
    * and partitionings — unlike rand()-based TABLESAMPLE. At 100 TB the
    * predicate is evaluated in the scan, so a sample costs one pass with no
    * shuffle, and downstream stages see a stable subset. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .where(conv(substring(md5(col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long") % 20 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val sampleHashSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 20 = 0""".stripMargin

  /** Uncorrelated scalar subquery: Catalyst executes the subquery once
    * (a tiny max-agg job), injects the literal, and the outer predicate
    * pushes into the scan. max/min are order-insensitive, so the boundary
    * is deterministic under any partitioning (avg of doubles is not). */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 0.95 * (SELECT max(o_totalprice) FROM orders)""".stripMargin)
  }

  /** Correlated scalar subquery (each customer's max-price order): Catalyst
    * de-correlates to an aggregate + join — the only shape that scales
    * (a per-row re-scan would be O(n²)). */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  /** q154: LATERAL correlated subquery — each customer cross-applied to
    * their 2 most recent orders ("top-N per key" in its SQL-standard
    * form). Exercises the planner's lateral-join decorrelation: Spark
    * rewrites the correlated LIMIT subquery into a join + per-key limit
    * (the same shape q30 writes by hand), so the declarative form pays
    * the declarative price — no nested loop per customer at scale. Total
    * (o_orderdate desc, o_orderkey) order makes the picked rows exact. */
  def lateralTopOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "customer").createOrReplaceTempView("customer_v")
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c.c_custkey, l.o_orderkey, l.o_orderdate
        |FROM customer_v c,
        |LATERAL (
        |  SELECT o_orderkey, o_orderdate FROM orders_v o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey LIMIT 2) l""".stripMargin)
  }

  private val lateralTopOrdersSql =
    """SELECT c.c_custkey, l.o_orderkey, l.o_orderdate
      |FROM customer c,
      |LATERAL (
      |  SELECT o_orderkey, o_orderdate FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_orderdate DESC, o_orderkey LIMIT 2) l""".stripMargin

  /** q155: RECURSIVE CTE (Spark 4 `WITH RECURSIVE`) — climb the decimal
    * trie of part keys (parent = key div 10) from every part to its
    * single-digit root: the org-chart/bill-of-materials traversal shape,
    * executed by the engine's iterative recursion operator rather than a
    * driver loop (contrast q130, which drives the iteration by hand for
    * the frontier-pruning a dense graph needs). UNION ALL recursion is
    * safe here because the climb is strictly decreasing — acyclic by
    * construction; each step is one join-free projection, so the
    * recursion cost is depth × |parts| rows. Exact integers throughout. */
  def recursiveHierarchy(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "part").createOrReplaceTempView("part_v")
    spark.sql(
      """WITH RECURSIVE h(p, node, depth) AS (
        |  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT) FROM part_v
        |  UNION ALL
        |  SELECT p, node div 10, depth + 1 FROM h WHERE node >= 10)
        |SELECT p AS p_partkey, max(depth) AS chain_len,
        |  min(CASE WHEN node < 10 THEN node END) AS root_digit
        |FROM h GROUP BY p""".stripMargin)
  }

  private val recursiveHierarchySql =
    """WITH RECURSIVE h(p, node, depth) AS (
      |  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT) FROM part
      |  UNION ALL
      |  SELECT p, node // 10, depth + 1 FROM h WHERE node >= 10)
      |SELECT p AS p_partkey, max(depth) AS chain_len,
      |  min(CASE WHEN node < 10 THEN node END) AS root_digit
      |FROM h GROUP BY p""".stripMargin

  // ---- q201: data-quality constraint audit --------------------------------

  /** q201: the Deequ-shaped DATA-QUALITY AUDIT every pipeline runs before
    * a table feeds training — one result row per declared constraint:
    * primary-key uniqueness, referential integrity, null rates, value
    * domains, and derived-column consistency, across five tables.
    *
    * Shape discipline: each table's scalar constraints compute in ONE
    * aggregate pass over that table (map-side-combined counts), then
    * `stack` unpivots the 1-row aggregate into constraint rows — no scan
    * per constraint. Referential integrity is a LEFT ANTI join counted to
    * one row: the honest 100 TB plan (keyed shuffle on the FK; AQE may
    * broadcast the dim side when it fits — both fine), never a collected
    * key set. `observed` is the exact violation count, `passed` its
    * zero-test, so the audit is fully hash-graded — and a drifted
    * generator (a null o_custkey, an out-of-domain returnflag, an
    * n_chars that stops matching length(text)) flips a row visibly
    * instead of corrupting downstream queries silently. */
  def dataAudit(spark: SparkSession, dir: String): DataFrame = {
    def one(table: String, agg: DataFrame, n: Int): DataFrame =
      agg.selectExpr(s"stack($n, ${(1 to n).flatMap(i =>
        Seq(s"c$i", s"v$i")).mkString(", ")}) AS (constraint, observed)")
        .withColumn("table_name", lit(table))
    val cnt = (p: org.apache.spark.sql.Column) =>
      sum(when(p, 1L).otherwise(0L))
    val orders = one("orders", Tables(spark, dir, "orders").agg(
      lit("pk_unique").as("c1"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v1"),
      lit("custkey_nonnull").as("c2"), cnt(col("o_custkey").isNull).as("v2"),
      lit("totalprice_positive").as("c3"),
      cnt(col("o_totalprice") <= 0).as("v3")), 3)
    val li = one("lineitem", Tables(spark, dir, "lineitem").agg(
      lit("quantity_in_1_50").as("c1"),
      cnt(col("l_quantity") < 1 || col("l_quantity") > 50).as("v1"),
      lit("discount_in_0_1").as("c2"),
      cnt(col("l_discount") < 0 || col("l_discount") > 1).as("v2"),
      lit("returnflag_domain").as("c3"),
      cnt(!col("l_returnflag").isin("A", "N", "R")).as("v3")), 3)
    val docs = one("documents", Tables(spark, dir, "documents").agg(
      lit("pk_unique").as("c1"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("v1"),
      lit("text_nonnull").as("c2"), cnt(col("text").isNull).as("v2"),
      lit("n_chars_consistent").as("c3"),
      cnt(col("n_chars") =!= length(col("text"))).as("v3")), 3)
    val ev = one("events", Tables(spark, dir, "events").agg(
      lit("ts_nonnull").as("c1"), cnt(col("ts").isNull).as("v1"),
      lit("user_nonnull").as("c2"), cnt(col("user_id").isNull).as("v2")), 2)
    def fk(table: String, name: String, fact: DataFrame, dim: DataFrame,
        keys: (String, String)): DataFrame =
      one(table, fact.join(dim,
          fact(keys._1) === dim(keys._2), "left_anti")
        .agg(lit(name).as("c1"), count(lit(1)).as("v1")), 1)
    val fks = Seq(
      fk("lineitem", "fk_orders",
        Tables(spark, dir, "lineitem").select(col("l_orderkey")),
        Tables(spark, dir, "orders").select(col("o_orderkey")),
        ("l_orderkey", "o_orderkey")),
      fk("orders", "fk_customer",
        Tables(spark, dir, "orders").select(col("o_custkey")),
        Tables(spark, dir, "customer").select(col("c_custkey")),
        ("o_custkey", "c_custkey")),
      fk("customer", "fk_nation",
        Tables(spark, dir, "customer").select(col("c_nationkey")),
        Tables(spark, dir, "nation").select(col("n_nationkey")),
        ("c_nationkey", "n_nationkey")))
    (Seq(orders, li, docs, ev) ++ fks).reduce(_.unionByName(_))
      .select(col("table_name"), col("constraint"),
        col("observed").cast("long").as("observed"),
        (col("observed") === 0).as("passed"))
  }

  private val dataAuditSql =
    """WITH x AS (
      |  SELECT 'orders' AS table_name, 'pk_unique' AS "constraint",
      |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS observed
      |  FROM orders
      |  UNION ALL SELECT 'orders', 'custkey_nonnull',
      |    CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'orders', 'totalprice_positive',
      |    CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'lineitem', 'quantity_in_1_50',
      |    CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'lineitem', 'discount_in_0_1',
      |    CAST(count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'lineitem', 'returnflag_domain',
      |    CAST(count(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'documents', 'pk_unique',
      |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM documents
      |  UNION ALL SELECT 'documents', 'text_nonnull',
      |    CAST(count(CASE WHEN text IS NULL THEN 1 END) AS BIGINT) FROM documents
      |  UNION ALL SELECT 'documents', 'n_chars_consistent',
      |    CAST(count(CASE WHEN n_chars <> length(text) THEN 1 END) AS BIGINT) FROM documents
      |  UNION ALL SELECT 'events', 'ts_nonnull',
      |    CAST(count(CASE WHEN ts IS NULL THEN 1 END) AS BIGINT) FROM events
      |  UNION ALL SELECT 'events', 'user_nonnull',
      |    CAST(count(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT) FROM events
      |  UNION ALL SELECT 'lineitem', 'fk_orders',
      |    CAST(count(*) AS BIGINT) FROM lineitem
      |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |  UNION ALL SELECT 'orders', 'fk_customer',
      |    CAST(count(*) AS BIGINT) FROM orders
      |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL SELECT 'customer', 'fk_nation',
      |    CAST(count(*) AS BIGINT) FROM customer
      |    WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
      |SELECT table_name, "constraint", observed, observed = 0 AS passed
      |FROM x""".stripMargin

  // ---- q236: skyline (Pareto frontier) ------------------------------------

  /** q236: SKYLINE — the orders no other order dominates on
    * (price, recency): b dominates a iff b is >= on BOTH axes and > on at
    * least one. Computed distributed-skyline style — the textbook
    * two-phase: (1) LOCAL frontiers inside price bands (window partitioned
    * by band — fully parallel), which discards almost everything, because
    * a point dominated within its own band is certainly dominated
    * globally; (2) the GLOBAL frontier over the surviving candidates
    * (expected skyline size on real data is polylog — the global pass is
    * planning-scale). Dominance transitivity makes the composition exact:
    * a local eliminator is itself dominated only by other candidates.
    * Within a phase the frontier needs no self-join: group to distinct
    * prices (max date each), then one running-max window ordered by price
    * DESC — a point survives iff its date beats every strictly-higher
    * price's best date and is its own price's best. Ties (equal price AND
    * equal date) are mutually non-dominating and all kept — exactly the
    * NOT EXISTS oracle's semantics. Prices in exact integer cents.
    *
    * At 100 TB: phase 1 is one band-keyed shuffle + per-band windows;
    * phase 2 touches only candidates. The O(n²) NOT EXISTS the oracle
    * runs is what this operator exists to avoid. */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("p"),
        col("o_orderdate").as("d"))
      .withColumn("band", expr("p div 1000000")) // $10k bands
    /** The frontier of `in` within each `parts` group (Nil = global). */
    def frontier(in: DataFrame, parts: Seq[String]): DataFrame = {
      val w = (if (parts.isEmpty) Window.orderBy(col("p").desc)
        else Window.partitionBy(parts.map(col): _*).orderBy(col("p").desc))
        .rowsBetween(Window.unboundedPreceding, -1)
      val perP = in.groupBy((parts :+ "p").map(col): _*)
        .agg(max(col("d")).as("dmax_p"))
        .withColumn("dmax_hi", max(col("dmax_p")).over(w))
      in.join(perP, parts :+ "p")
        .where((col("dmax_hi").isNull || col("dmax_hi") < col("d")) &&
          col("d") === col("dmax_p"))
        .drop("dmax_p", "dmax_hi")
    }
    frontier(frontier(pts, Seq("band")), Nil)
      .select(col("o_orderkey"), col("p"),
        date_format(col("d"), "yyyy-MM-dd HH:mm:ss").as("d_s"))
  }

  private val skylineSql =
    """WITH pts AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p,
      |    o_orderdate AS d
      |  FROM orders)
      |SELECT a.o_orderkey, a.p, strftime(a.d, '%Y-%m-%d %H:%M:%S') AS d_s
      |FROM pts a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts b
      |  WHERE b.p >= a.p AND b.d >= a.d AND (b.p > a.p OR b.d > a.d))""".stripMargin

  // ---- q239: exact equi-depth histogram -----------------------------------

  /** q239: EQUI-DEPTH HISTOGRAM — ten bins with (near-)equal row counts
    * and their exact [lo, hi] cent bounds, the optimizer-statistics shape
    * (selectivity estimation wants equal-mass, not equal-width, bins).
    * `ntile` over a TOTAL order (price, then orderkey as the unique
    * tiebreak) makes bin assignment deterministic in both engines —
    * ntile's only cross-engine hazard is tie order, and a unique key
    * removes ties entirely. This is the sort-based exact construction
    * (same honest cost class as q48's exact percentiles: one global
    * sort); the sketch tier (q47 KLL-style quantiles) is the at-scale
    * approximation when exactness isn't required. */
  def equiDepthHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables(spark, dir, "orders")
      .select(
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("p"),
        col("o_orderkey"))
      .withColumn("bin",
        ntile(10).over(Window.orderBy(col("p"), col("o_orderkey"))).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("p")).as("lo"), max(col("p")).as("hi"))
  }

  private val equiDepthHistSql =
    """WITH pts AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p,
      |    o_orderkey
      |  FROM orders),
      |b AS (
      |  SELECT p, ntile(10) OVER (ORDER BY p, o_orderkey) AS bin FROM pts)
      |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
      |  min(p) AS lo, max(p) AS hi
      |FROM b GROUP BY 1""".stripMargin

  // ---- q283: selectivity estimation from the equi-depth histogram ---------

  /** q283: RANGE-SELECTIVITY ESTIMATION — the consumer the q239 histogram
    * exists for: predict |σ(p > X)| for a sweep of thresholds from the
    * 10-bin equi-depth histogram alone, graded against the exact counts.
    * Completes the optimizer-statistics trio (q282 join cardinality,
    * q239 the histogram itself, q283 the predicate estimator an
    * optimizer actually calls). Estimator: full bins above X contribute
    * n, bins below contribute 0, the straddling bin interpolates
    * linearly on its [lo, hi] value range — all integer arithmetic with
    * DECIMAL(38,0) products (n·(hi−X) crosses 2^63 at warehouse row
    * counts), so the estimate itself hash-matches cross-engine and the
    * grade needs no tolerance. Equi-DEPTH is the right shape because the
    * estimator's worst case is one bin's mass, i.e. ~10% of rows by
    * construction regardless of value skew — the property equi-width
    * histograms lose on skewed data.
    *
    * 100 TB posture: estimation is metadata-only (10 histogram rows ×
    * |thresholds|); the exact companion exists for grading and costs one
    * conditional-aggregate scan; the histogram build is q239's honest
    * global sort with the q47 sketch drop-in at scale. */
  def selectivityEst(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val thrCents = Seq(50000L, 1000000L, 5000000L, 10000000L,
      20000000L, 30000000L)
    val hist = equiDepthHist(spark, dir)
    val thr = hist.sparkSession.range(1)
      .select(explode(array(thrCents.map(lit): _*)).as("thr"))
    // integer-div interpolation (both engines truncate toward zero; the
    // straddle branch is non-negative by construction), never decimal `/`
    // (Spark rounds it)
    val est = hist.crossJoin(broadcast(thr))
      .selectExpr("thr",
        """CAST(CASE WHEN lo > thr THEN n
          |  WHEN hi <= thr THEN 0
          |  ELSE (CAST(n AS DECIMAL(38,0)) * (hi - thr)) div (hi - lo)
          |END AS DECIMAL(38,0)) AS c""".stripMargin)
      .groupBy(col("thr"))
      .agg(sum(col("c")).as("est_d"))
    val exact = Tables(spark, dir, "orders")
      .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("p"))
      .crossJoin(broadcast(thr))
      .groupBy(col("thr"))
      .agg(sum(when(col("p") > col("thr"), 1L).otherwise(0L)).as("exact_rows"))
    est.join(exact, Seq("thr"))
      .select(col("thr"), col("est_d").cast("long").as("est_rows"),
        col("exact_rows"),
        expr("""CAST(CASE WHEN exact_rows = 0 THEN NULL ELSE
          |(CAST(est_d AS DECIMAL(38,0)) - exact_rows) * 1000000
          |  div exact_rows END AS BIGINT)""".stripMargin).as("err_ppm"))
  }

  private val selectivityEstSql =
    """WITH pts AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p,
      |    o_orderkey
      |  FROM orders),
      |hist AS (
      |  SELECT bin, count(*) AS n, min(p) AS lo, max(p) AS hi FROM (
      |    SELECT p, ntile(10) OVER (ORDER BY p, o_orderkey) AS bin FROM pts) b
      |  GROUP BY 1),
      |thr AS (SELECT unnest([50000, 1000000, 5000000, 10000000,
      |  20000000, 30000000]) AS thr),
      |est AS (
      |  SELECT thr, sum(CASE
      |      WHEN lo > thr THEN n::HUGEINT
      |      WHEN hi <= thr THEN 0::HUGEINT
      |      ELSE (n::HUGEINT * (hi - thr)) // (hi - lo) END) AS est_d
      |  FROM hist, thr GROUP BY 1),
      |ex AS (
      |  SELECT thr, sum(CASE WHEN p > thr THEN 1 ELSE 0 END)::BIGINT
      |    AS exact_rows
      |  FROM pts, thr GROUP BY 1)
      |SELECT CAST(est.thr AS BIGINT) AS thr,
      |  CAST(est_d AS BIGINT) AS est_rows, exact_rows,
      |  CAST(CASE WHEN exact_rows = 0 THEN NULL ELSE
      |    ((est_d - exact_rows) * 1000000) // exact_rows END AS BIGINT)
      |    AS err_ppm
      |FROM est JOIN ex ON est.thr = ex.thr""".stripMargin

  // ---- q257: share-of-parent drill-down -----------------------------------

  /** q257: SHARE-OF-PARENT — the BI drill-down contract: every
    * (nation, segment) cell reports its share of the nation AND of the
    * grand total, in exact ppm (the integral-quotient discipline — BI
    * percentages rendered from exact integers never disagree between
    * engines or refreshes). One aggregate over the fact table, then two
    * window sums over the bounded cells frame; the same shape serves any
    * dimension pair. */
  def shareOfParent(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables(spark, dir, "customer")
      .groupBy(col("c_nationkey").cast("string").as("nation_s"),
        col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"))
      .withColumn("nation_n", sum(col("n")).over(
        Window.partitionBy(col("nation_s"))))
      .withColumn("total_n", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .selectExpr("nation_s", "seg", "n",
        "CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div nation_n AS BIGINT)" +
          " AS ppm_of_nation",
        "CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div total_n AS BIGINT)" +
          " AS ppm_of_total")
  }

  private val shareOfParentSql =
    """WITH cells AS (
      |  SELECT CAST(c_nationkey AS VARCHAR) AS nation_s,
      |    c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2)
      |SELECT nation_s, seg, n,
      |  CAST(n::HUGEINT * 1000000
      |    // sum(n) OVER (PARTITION BY nation_s)::HUGEINT AS BIGINT)
      |    AS ppm_of_nation,
      |  CAST(n::HUGEINT * 1000000 // sum(n) OVER ()::HUGEINT AS BIGINT)
      |    AS ppm_of_total
      |FROM cells""".stripMargin

  // ---- q261: Gini coefficient ---------------------------------------------

  /** q261: GINI — spend-concentration inequality across customers, the
    * single number every marketplace tracks. The rank formulation
    * G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over ascending-sorted exact
    * cents is TIE-INSENSITIVE (within an equal-value block Σi is the
    * same under any permutation), so the statistic is exact without even
    * needing the tiebreak — which the total order supplies anyway. All
    * products in DECIMAL38/HUGEINT, reported as exact ppm. One
    * customer-grain aggregate, one global rank sort (q239's cost class),
    * one reduction. */
  def gini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spend = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")).cast("long").as("cents"))
    spend
      .withColumn("i", row_number().over(
        Window.orderBy(col("cents"), col("o_custkey"))).cast("long"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"),
        sum(col("i").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("cents")).as("s1"))
      .selectExpr("n", "CAST(s AS BIGINT) AS total_cents",
        "CAST(((2 * s1 - (CAST(n AS DECIMAL(38,0)) + 1) * s) * 1000000)" +
          " div (CAST(n AS DECIMAL(38,0)) * s) AS BIGINT) AS gini_ppm")
  }

  private val giniSql =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT cents, CAST(row_number() OVER (ORDER BY cents, o_custkey)
      |    AS BIGINT) AS i
      |  FROM spend)
      |SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST((2 * sum(i::HUGEINT * cents)
      |      - (count(*)::HUGEINT + 1) * sum(cents)::HUGEINT) * 1000000
      |    // (count(*)::HUGEINT * sum(cents)::HUGEINT) AS BIGINT)
      |    AS gini_ppm
      |FROM r""".stripMargin

  // ---- q262: ABC / Pareto classification ----------------------------------

  /** q262: ABC CLASSIFICATION — the 80/15/5 Pareto split of parts by
    * revenue (inventory and assortment planning's standard view): parts
    * sorted by revenue DESC, cumulative share as an exact ppm integral
    * quotient, class A while cum ≤ 80%, B to 95%, C beyond. Determinism:
    * the (revenue DESC, partkey) total order fixes every cumulative sum,
    * and the ppm floor-quotient thresholds compare identically in both
    * engines — boundary parts land in the same class bit-for-bit.
    * Output is the per-class rollup (parts, revenue, revenue share). */
  def abcClassification(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast("long")).cast("long").as("cents"))
    rev
      .withColumn("cum", sum(col("cents")).over(
        Window.orderBy(col("cents").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("cents")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("cum_ppm", expr(
        "CAST((CAST(cum AS DECIMAL(38,0)) * 1000000) div tot AS BIGINT)"))
      .withColumn("cls", when(col("cum_ppm") <= 800000, "A")
        .when(col("cum_ppm") <= 950000, "B").otherwise("C"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("cents")).cast("long").as("revenue_cents"))
  }

  private val abcClassificationSql =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT cents,
      |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(cents) OVER () AS tot
      |  FROM rev),
      |k AS (
      |  SELECT cents,
      |    CASE WHEN cum::HUGEINT * 1000000 // tot::HUGEINT <= 800000 THEN 'A'
      |      WHEN cum::HUGEINT * 1000000 // tot::HUGEINT <= 950000 THEN 'B'
      |      ELSE 'C' END AS cls
      |  FROM c)
      |SELECT cls, count(*) AS n_parts,
      |  CAST(sum(cents) AS BIGINT) AS revenue_cents
      |FROM k GROUP BY cls""".stripMargin

  // ---- q269: frequency of frequencies -------------------------------------

  /** q269: FREQUENCY-OF-FREQUENCIES — how many customers placed exactly
    * k orders, the degree-distribution/Zipf diagnostic (and the input to
    * Good-Turing smoothing): two stacked aggregates, each map-side-
    * partial — the first collapses the fact table to customer grain, the
    * second collapses that to the ≤|max-degree| histogram. */
  def freqOfFreq(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_customers"))

  private val freqOfFreqSql =
    """SELECT k, count(*) AS n_customers FROM (
      |  SELECT o_custkey, count(*) AS k FROM orders GROUP BY 1)
      |GROUP BY k""".stripMargin

  // ---- q270: association rules --------------------------------------------

  /** q270: ASSOCIATION RULES — market-basket support/confidence/lift for
    * part pairs, the retail-analytics classic (and q234's PMI moved from
    * document to BASKET grain): presence sets per order, pair counts by
    * order-keyed self-join, then per DIRECTED rule A→B the confidence
    * n_ab·10⁶ div n_a and lift n_ab·N·10⁶ div (n_a·n_b) — exact ppm
    * integral quotients, no floats. Both directions emitted (confidence
    * is asymmetric; lift repeats by construction — the consumer's
    * sanity check). Support floor bounds the output to recurring pairs.
    *
    * At 100 TB: pair volume is Σ basket² — bounded by basket width, the
    * q234 bound; item counts broadcast back onto the pair frame. */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val nOrders = items.select(countDistinct(col("o")).as("nn"))
    val np = items.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
    val half = items.as("x").join(items.as("y"), Seq("o"))
      .where(col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= 5)
    val rules = half.select(col("a"), col("b"), col("n_ab"))
      .unionByName(half.select(col("b").as("a"), col("a").as("b"), col("n_ab")))
    rules
      .join(np.select(col("p").as("a"), col("n_p").as("n_a")), Seq("a"))
      .join(np.select(col("p").as("b"), col("n_p").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nOrders))
      .selectExpr("a AS antecedent", "b AS consequent", "n_ab", "n_a",
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * 1000000) div n_a AS BIGINT)" +
          " AS conf_ppm",
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * nn * 1000000)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) AS lift_ppm")
  }

  private val assocRulesSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |nn AS (SELECT count(DISTINCT o) AS n FROM items),
      |np AS (SELECT p, CAST(count(*) AS BIGINT) AS n_p
      |  FROM items GROUP BY 1),
      |half AS (
      |  SELECT x.p AS a, y.p AS b, CAST(count(*) AS BIGINT) AS n_ab
      |  FROM items x JOIN items y ON x.o = y.o AND x.p < y.p
      |  GROUP BY 1, 2 HAVING count(*) >= 5),
      |rules AS (
      |  SELECT a, b, n_ab FROM half
      |  UNION ALL SELECT b, a, n_ab FROM half)
      |SELECT r.a AS antecedent, r.b AS consequent, r.n_ab, na.n_p AS n_a,
      |  CAST(r.n_ab::HUGEINT * 1000000 // na.n_p::HUGEINT AS BIGINT)
      |    AS conf_ppm,
      |  CAST(r.n_ab::HUGEINT * nn.n * 1000000
      |    // (na.n_p::HUGEINT * nb.n_p) AS BIGINT) AS lift_ppm
      |FROM rules r
      |JOIN np na ON r.a = na.p
      |JOIN np nb ON r.b = nb.p, nn""".stripMargin

  // ---- q271: cohort LTV curves --------------------------------------------

  /** q271: COHORT LTV — cumulative revenue per acquisition cohort by age,
    * the growth-accounting triangle behind every payback model: customers
    * cohorted by FIRST-order quarter, ages as exact integer quarter
    * indexes (year·4 + quarter — no interval arithmetic crosses engines),
    * revenue in exact cents, cumulative per cohort by an ordered window
    * over the bounded cohort×age frame. */
  def ltvCurve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("ck"),
        (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")))
          .cast("long").as("qi"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          * 100).cast("long").as("cents"))
    val first = o.groupBy(col("ck")).agg(min(col("qi")).as("q0"))
    o.join(first, Seq("ck"))
      .groupBy(col("q0").as("cohort_q"), (col("qi") - col("q0")).as("age"))
      .agg(countDistinct(col("ck")).as("active"),
        sum(col("cents")).cast("long").as("rev_cents"))
      .withColumn("cum_cents", sum(col("rev_cents")).over(
        Window.partitionBy(col("cohort_q")).orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
  }

  private val ltvCurveSql =
    """WITH o AS (
      |  SELECT o_custkey AS ck,
      |    CAST(year(o_orderdate) * 4 + quarter(o_orderdate) AS BIGINT) AS qi,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |f AS (SELECT ck, min(qi) AS q0 FROM o GROUP BY 1),
      |c AS (
      |  SELECT f.q0 AS cohort_q, o.qi - f.q0 AS age,
      |    count(DISTINCT o.ck) AS active,
      |    CAST(sum(o.cents) AS BIGINT) AS rev_cents
      |  FROM o JOIN f ON o.ck = f.ck
      |  GROUP BY 1, 2)
      |SELECT cohort_q, age, active, rev_cents,
      |  CAST(sum(rev_cents) OVER (PARTITION BY cohort_q ORDER BY age
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |FROM c""".stripMargin

  // ---- q273: deterministic MODE -------------------------------------------

  /** q273: MODE — the most frequent order priority per status, with the
    * tie rule IN THE CONTRACT (highest count, then lexicographically
    * smallest value): native `mode()` in both engines is
    * tie-nondeterministic, so the operator is counts + an exact composite
    * argmax instead — the only way a mode is reproducible at all. The
    * composite key folds the value's ordering into the count via a
    * reversible rank (count·K − dense value rank), all integers. */
  def modePerGroup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"))
      // dense rank of the value within the group: the smaller value must
      // WIN ties, so it subtracts less
      .withColumn("vr", dense_rank().over(
        Window.partitionBy(col("status")).orderBy(col("prio"))).cast("long"))
    counts.groupBy(col("status"))
      .agg(max_by(col("prio"), col("n") * 1000L - col("vr")).as("mode_prio"),
        max_by(col("n"), col("n") * 1000L - col("vr")).as("n_mode"))
  }

  private val modePerGroupSql =
    """WITH c AS (
      |  SELECT o_orderstatus AS status, o_orderpriority AS prio,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(dense_rank() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_orderpriority) AS BIGINT) AS vr
      |  FROM orders GROUP BY 1, 2)
      |SELECT status,
      |  max_by(prio, n * 1000 - vr) AS mode_prio,
      |  max_by(n, n * 1000 - vr) AS n_mode
      |FROM c GROUP BY status""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q273_mode", modePerGroup, Some(modePerGroupSql)),
    QueryDef("q270_assoc_rules", assocRules, Some(assocRulesSql)),
    QueryDef("q271_ltv_curve", ltvCurve, Some(ltvCurveSql)),
    QueryDef("q269_freq_of_freq", freqOfFreq, Some(freqOfFreqSql)),
    QueryDef("q261_gini", gini, Some(giniSql)),
    QueryDef("q262_abc", abcClassification, Some(abcClassificationSql)),
    QueryDef("q257_share_of_parent", shareOfParent, Some(shareOfParentSql)),
    QueryDef("q201_data_audit", dataAudit, Some(dataAuditSql)),
    QueryDef("q154_lateral_topn", lateralTopOrders, Some(lateralTopOrdersSql)),
    QueryDef("q155_recursive_cte", recursiveHierarchy,
      Some(recursiveHierarchySql)),
    QueryDef("q10_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    QueryDef("q11_filter_project", filterProject, Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00' AND l_discount > 0.07""".stripMargin)),
    QueryDef("q12_distinct", distinctFlags, Some(
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),
    QueryDef("q13_top_orders", topOrders, Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),
    QueryDef("q14_union", unionNations, Some(
      "SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier")),
    QueryDef("q15_intersect", intersectNations, Some(
      "SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier")),
    QueryDef("q16_except", exceptLapsedCustomers, Some(
      """SELECT DISTINCT o_custkey AS ck FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT DISTINCT o_custkey AS ck FROM orders WHERE year(o_orderdate) >= 1999""".stripMargin)),
    QueryDef("q121_setops_all", setOpsAll, Some(setOpsAllSql)),
    QueryDef("q122_dq_audit", dqAudit, Some(dqAuditSql)),
    QueryDef("q236_skyline", skyline, Some(skylineSql)),
    QueryDef("q239_equidepth_hist", equiDepthHist, Some(equiDepthHistSql)),
    QueryDef("q283_selectivity_est", selectivityEst, Some(selectivityEstSql)),
    QueryDef("q17_rollup", rollupLineitem, Some(
      s"""SELECT l_returnflag, l_linestatus, ${sqlSum2("l_quantity")} AS sum_qty,
         |  count(*) AS cnt
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),
    QueryDef("q18_cube", cubeOrders, Some(
      s"""SELECT o_orderstatus, o_orderpriority, ${sqlSum2("o_totalprice")} AS tot,
         |  count(*) AS cnt
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),
    QueryDef("q19_grouping_sets", groupingSetsLineitem, Some(
      s"""SELECT l_returnflag, l_linestatus, ${sqlSum2("l_quantity")} AS sum_qty,
         |  count(*) AS cnt
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)),
    QueryDef("q35_pivot", pivotSegments, Some(pivotSql)),
    QueryDef("q36_unpivot", unpivotMetrics, Some(unpivotSql)),
    QueryDef("q37_sample_hash", sampleHash, Some(sampleHashSql)),
    QueryDef("q38_scalar_subquery", scalarSubquery, Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 0.95 * (SELECT max(o_totalprice) FROM orders)""".stripMargin)),
    QueryDef("q39_corr_subquery", correlatedSubquery, Some(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)))
}
