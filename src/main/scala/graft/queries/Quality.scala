package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-quality operators: column profiling, constraint validation, and
  * entity resolution — the governance tier a warehouse runs BEFORE any
  * analytics query is trusted. The reference engine has no quality layer
  * (its jobs assume clean TSV input, `MapRunner.java` just splits lines);
  * at 100 TB nothing can be assumed, so profiling/validation become
  * first-class scans with the same shuffle discipline as the queries they
  * guard.
  */
object Quality {

  // ---- q227: one-pass column profiling ------------------------------------

  /** q227: COLUMN PROFILING — per-column row count, null count, distinct
    * count, and min/max (rendered to engine-neutral strings) for every
    * column of `orders`, computed in ONE pass: a single wide aggregate
    * (Catalyst plans the multi-distinct via one Expand — still one scan of
    * the table, map-side partials for every non-distinct metric), then the
    * 1-row wide result is pivoted to the long (col_name, metrics) shape a
    * catalog stores. Rendering discipline: integers/strings cast directly,
    * doubles through the exact DECIMAL(18,2) contract (`graft.Exact`),
    * timestamps through an explicit format — every rendering is
    * bit-identical across engines, so the profile is hash-gated, not
    * approximated.
    *
    * At 100 TB: one scan, no joins; the Expand multiplies rows by the
    * number of DISTINCT metrics before the partial aggregate, which is the
    * standard cost of exact NDV — the sketch tier (q47 HLL) is the
    * at-scale alternative when approximate NDV suffices. Output is
    * |columns| rows. */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    // the Expand×7 multi-distinct partial aggregate fuses onto the scan;
    // on the single-file input that is ONE task (measured 3.0 s of a
    // 4.6 s query at local[32]) — rebalance first (guide §2.5, no-op on
    // multi-split inputs)
    val o = Tables.spread(spark, dir, "orders", Tables(spark, dir, "orders"))
    val wide = o.agg(
      count(lit(1)).as("n"),
      count(col("o_orderkey")).as("nn1"), countDistinct(col("o_orderkey")).as("nd1"),
      min(col("o_orderkey")).cast("string").as("lo1"),
      max(col("o_orderkey")).cast("string").as("hi1"),
      count(col("o_custkey")).as("nn2"), countDistinct(col("o_custkey")).as("nd2"),
      min(col("o_custkey")).cast("string").as("lo2"),
      max(col("o_custkey")).cast("string").as("hi2"),
      count(col("o_orderstatus")).as("nn3"), countDistinct(col("o_orderstatus")).as("nd3"),
      min(col("o_orderstatus")).as("lo3"), max(col("o_orderstatus")).as("hi3"),
      count(col("o_totalprice")).as("nn4"), countDistinct(col("o_totalprice")).as("nd4"),
      min(col("o_totalprice")).cast(DecimalType(18, 2)).cast("string").as("lo4"),
      max(col("o_totalprice")).cast(DecimalType(18, 2)).cast("string").as("hi4"),
      count(col("o_orderdate")).as("nn5"), countDistinct(col("o_orderdate")).as("nd5"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("lo5"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("hi5"),
      count(col("o_orderpriority")).as("nn6"), countDistinct(col("o_orderpriority")).as("nd6"),
      min(col("o_orderpriority")).as("lo6"), max(col("o_orderpriority")).as("hi6"))
    def row(name: String, i: Int): Column = struct(
      lit(name).as("col_name"), col("n").as("n_rows"),
      (col("n") - col(s"nn$i")).as("n_null"), col(s"nd$i").as("n_distinct"),
      col(s"lo$i").as("min_s"), col(s"hi$i").as("max_s"))
    wide.select(explode(array(
        row("o_orderkey", 1), row("o_custkey", 2), row("o_orderstatus", 3),
        row("o_totalprice", 4), row("o_orderdate", 5), row("o_orderpriority", 6)))
      .as("p")).select(col("p.*"))
  }

  private def profileColSql(name: String, minS: String, maxS: String) =
    s"""SELECT '$name' AS col_name, count(*) AS n_rows,
       |  count(*) - count($name) AS n_null,
       |  count(DISTINCT $name) AS n_distinct, $minS AS min_s, $maxS AS max_s
       |FROM orders""".stripMargin
  private val profileSql = Seq(
    profileColSql("o_orderkey",
      "CAST(min(o_orderkey) AS VARCHAR)", "CAST(max(o_orderkey) AS VARCHAR)"),
    profileColSql("o_custkey",
      "CAST(min(o_custkey) AS VARCHAR)", "CAST(max(o_custkey) AS VARCHAR)"),
    profileColSql("o_orderstatus", "min(o_orderstatus)", "max(o_orderstatus)"),
    profileColSql("o_totalprice",
      "CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)",
      "CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)"),
    profileColSql("o_orderdate",
      "strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S')",
      "strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')"),
    profileColSql("o_orderpriority", "min(o_orderpriority)", "max(o_orderpriority)"))
    .mkString("\nUNION ALL\n")

  // ---- q228: declarative constraint validation ----------------------------

  /** q228: CONSTRAINT VALIDATION (the Deequ/dbt-test shape) — a suite of
    * declarative checks over `orders` evaluated in one scan plus one
    * anti-join: not-null, key uniqueness, accepted-values domain, value
    * range, and referential integrity against `customer`. Results are the
    * long (constraint, violations, total, pass) shape a CI gate consumes;
    * metrics are exact BIGINT counts (ratios left to the consumer — cross-
    * engine decimal-division scales differ, counts never do).
    *
    * At 100 TB: the four scan-local checks share ONE aggregate (conditional
    * `count(when)` — map-side partials, no Expand since nothing here is
    * DISTINCT beyond the key check's single count-distinct); the FK check
    * is a left-anti join on the key — broadcast when `customer` fits (AQE
    * decides), shuffle-hash otherwise; both 1-row results cross-join
    * (broadcast, the scalar-attach idiom) into the suite frame. */
  def constraints(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val scanChecks = o.agg(
      count(lit(1)).as("total"),
      (count(lit(1)) - count(col("o_custkey"))).as("v_notnull"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"),
      count(when(not(col("o_orderstatus").isin("O", "F", "P")), lit(1))).as("v_domain"),
      count(when(col("o_totalprice") <= 0, lit(1))).as("v_range"))
    val fk = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk"))
    val wide = scanChecks.crossJoin(broadcast(fk))
    def row(name: String, v: String): Column = struct(
      lit(name).as("constraint"), col(v).as("violations"),
      col("total").as("total"), (col(v) === 0).as("pass"))
    wide.select(explode(array(
        row("not_null_o_custkey", "v_notnull"),
        row("unique_o_orderkey", "v_unique"),
        row("accepted_values_o_orderstatus", "v_domain"),
        row("positive_o_totalprice", "v_range"),
        row("fk_o_custkey_customer", "v_fk")))
      .as("p")).select(col("p.*"))
  }

  private val constraintsSql =
    """WITH s AS (
      |  SELECT count(*) AS total,
      |    count(*) - count(o_custkey) AS v_notnull,
      |    count(*) - count(DISTINCT o_orderkey) AS v_unique,
      |    count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS v_domain,
      |    count(*) FILTER (WHERE o_totalprice <= 0) AS v_range
      |  FROM orders),
      |f AS (
      |  SELECT count(*) AS v_fk FROM orders o
      |  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NULL),
      |w AS (SELECT * FROM s, f)
      |SELECT 'not_null_o_custkey' AS constraint, v_notnull AS violations,
      |  total, v_notnull = 0 AS pass FROM w
      |UNION ALL SELECT 'unique_o_orderkey', v_unique, total, v_unique = 0 FROM w
      |UNION ALL SELECT 'accepted_values_o_orderstatus', v_domain, total,
      |  v_domain = 0 FROM w
      |UNION ALL SELECT 'positive_o_totalprice', v_range, total, v_range = 0 FROM w
      |UNION ALL SELECT 'fk_o_custkey_customer', v_fk, total, v_fk = 0 FROM w""".stripMargin

  // ---- q229: entity resolution (block -> match -> cluster) ----------------

  /** q229: ENTITY RESOLUTION — the record-linkage pipeline: multi-source
    * records -> blocking -> pairwise matching -> connected components ->
    * golden-record rollup. Records are the customer table plus two
    * deterministic dirty variants derived IN-ENGINE (a 'web' record with
    * the prefix abbreviated, edit distance 4; an 'app' record with a
    * suffix appended, edit distance 3 — the variants are never pairwise
    * within threshold, so entities form only through their base record,
    * exercising real transitive clustering). Blocking key = (nation, last
    * 4 digits of the name's number): pair generation is a self-join INSIDE
    * blocks only — the all-pairs square never exists. Match rule =
    * banded `levenshtein <= 4` (the threshold form — O(len·k) not O(len²),
    * the q126 discipline) AND same nation AND account balance within 1.0;
    * matches feed the q208 large-star/small-star CC (O(log n) rounds), and
    * the golden record aggregates per entity. Cross-entity false matches
    * inside a block are possible BY DESIGN (that is what real ER precision
    * < 1 means) — both engines compute the identical edge set, so the
    * result is still hash-gated.
    *
    * At 100 TB: cost is Σ block² pairs, bounded by the blocking key's
    * cardinality design (~10⁴ entities per nation-suffix cell at any
    * scale); CC is edge-keyed with logarithmic rounds (q208's bound); the
    * rollup is one grouped aggregate on entity_id. */
  def entityResolution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val base = c.select((col("c_custkey") * 3).as("rec_id"), col("c_name").as("name"),
      col("c_nationkey").as("nation"), col("c_acctbal").as("bal"), lit("crm").as("src"))
    val v1 = c.where(col("c_custkey") % 3 === 0)
      .select((col("c_custkey") * 3 + 1).as("rec_id"),
        regexp_replace(col("c_name"), "^Customer#", "Cust#").as("name"),
        col("c_nationkey").as("nation"), col("c_acctbal").as("bal"), lit("web").as("src"))
    val v2 = c.where(col("c_custkey") % 6 === 0)
      .select((col("c_custkey") * 3 + 2).as("rec_id"),
        concat(col("c_name"), lit(" II")).as("name"),
        col("c_nationkey").as("nation"), col("c_acctbal").as("bal"), lit("app").as("src"))
    val recs = base.unionByName(v1).unionByName(v2)
      .withColumn("blk", concat_ws("|", col("nation"),
        expr("right(regexp_extract(name, '([0-9]+)', 1), 4)")))
      .localCheckpoint() // consumed three times (both pair sides + rollup)
    val a = recs.select(col("rec_id").as("a"), col("name").as("na"),
      col("blk"), col("bal").as("ba"))
    val b = recs.select(col("rec_id").as("b"), col("name").as("nb"),
      col("blk"), col("bal").as("bb"))
    val pairs = a.join(b, Seq("blk"))
      .where(col("a") < col("b"))
      .where(levenshtein(col("na"), col("nb"), 4) >= 0)
      .where(abs(col("ba") - col("bb")) <= 1.0)
      .select(col("a"), col("b"))
    val labels = Graph.ccStar(pairs)
    recs.join(labels, recs("rec_id") === labels("node"), "left")
      .withColumn("entity_id", coalesce(col("label"), col("rec_id")))
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("src")).as("n_sources"),
        min(col("name")).as("canonical_name"))
  }

  private val entityResolutionSql =
    """WITH RECURSIVE recs AS (
      |  SELECT c_custkey*3 AS rec_id, c_name AS name, c_nationkey AS nation,
      |    c_acctbal AS bal, 'crm' AS src FROM customer
      |  UNION ALL
      |  SELECT c_custkey*3+1, regexp_replace(c_name, '^Customer#', 'Cust#'),
      |    c_nationkey, c_acctbal, 'web' FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey*3+2, c_name || ' II', c_nationkey, c_acctbal, 'app'
      |  FROM customer WHERE c_custkey % 6 = 0),
      |blk AS (
      |  SELECT *, CAST(nation AS VARCHAR) || '|' ||
      |    right(regexp_extract(name, '([0-9]+)', 1), 4) AS blk
      |  FROM recs),
      |pairs AS (
      |  SELECT x.rec_id AS a, y.rec_id AS b
      |  FROM blk x JOIN blk y ON x.blk = y.blk AND x.rec_id < y.rec_id
      |  WHERE levenshtein(x.name, y.name) <= 4 AND abs(x.bal - y.bal) <= 1.0),
      |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
      |reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |comp AS (SELECT a AS rec_id, least(a, min(b)) AS entity_id
      |  FROM reach GROUP BY a)
      |SELECT coalesce(c.entity_id, r.rec_id) AS entity_id,
      |  count(*) AS n_records, count(DISTINCT r.src) AS n_sources,
      |  min(r.name) AS canonical_name
      |FROM blk r LEFT JOIN comp c ON r.rec_id = c.rec_id
      |GROUP BY 1""".stripMargin

  // ---- q231: PII detection + redaction ------------------------------------

  /** q231: PII REDACTION — the scrub pass every LLM training corpus runs:
    * detect emails and phone numbers by pattern, replace with typed
    * placeholders, count what was found. The corpus is `documents` with
    * deterministic PII injected IN-ENGINE for every 5th doc (the generated
    * corpus is clean — the q229 dirty-variant discipline: derive the mess,
    * never synthesize a table) so the detectors have real positives to
    * find AND real negatives to leave alone. Patterns are the RE2∩Java
    * common subset (char classes + counted repeats, no lookaround), so
    * both engines match identically; redacted text is compared by md5 —
    * the whole row is hash-gated, not just the counts.
    *
    * At 100 TB: scan-local (regexp_count + two regexp_replace per row, all
    * codegen'd), zero shuffles before the output — the shape that saturates
    * I/O rather than CPU; pattern-set growth (SSNs, cards, addresses) adds
    * columns, not passes. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val phone = "555-[0-9]{4}"
    Tables(spark, dir, "documents")
      .withColumn("t", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" reach user"), col("doc_id"),
          lit("@mail.com or call 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 4, "0")))
        .otherwise(col("text")))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(email)).as("n_emails"),
        regexp_count(col("t"), lit(phone)).as("n_phones"),
        md5(regexp_replace(regexp_replace(col("t"), email, "[EMAIL]"),
          phone, "[PHONE]")).as("clean_hash"))
  }

  private val piiRedactSql =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT)
      |    AS n_emails,
      |  CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(
      |    regexp_replace(t, '[a-z0-9]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g'),
      |    '555-[0-9]{4}', '[PHONE]', 'g')) AS clean_hash
      |FROM (
      |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN
      |    text || ' reach user' || CAST(doc_id AS VARCHAR) ||
      |    '@mail.com or call 555-' ||
      |    lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0')
      |  ELSE text END AS t
      |  FROM documents)""".stripMargin

  // ---- q232: k-anonymity generalization -----------------------------------

  /** q232: K-ANONYMITY — the release-gate shape of privacy-preserving
    * publication: quasi-identifiers (nation, market segment, account
    * balance generalized to a 1000-unit band) partition `customer` into
    * equivalence classes; classes of size >= k (k=5) publish their
    * generalized values, smaller classes are SUPPRESSED — collapsed into
    * one '*' class so no published row is distinguishable among fewer
    * than k individuals. The bucket arithmetic is a single IEEE divide +
    * floor (identical bits in both engines on the raw column), everything
    * else is integer/string — hash-gated end-to-end.
    *
    * At 100 TB: one grouped aggregate over the QI key (map-side partials),
    * then a driver-free split on class size — the suppressed rollup is a
    * second tiny aggregate over the sub-k classes only. The k-anonymity
    * CHECK (is any published class < k?) is the `pass`-style gate a
    * release pipeline asserts on. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val classes = Tables(spark, dir, "customer")
      .select(col("c_nationkey").cast("string").as("nation_s"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .groupBy(col("nation_s"), col("seg"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
    val published = classes.where(col("n") >= k)
      .select(col("nation_s"), col("seg"),
        col("bal_band").cast("string").as("band_s"), col("n"),
        lit(false).as("suppressed"))
    val suppressed = classes.where(col("n") < k)
      .agg(sum(col("n")).as("n"))
      .where(col("n").isNotNull)
      .select(lit("*").as("nation_s"), lit("*").as("seg"),
        lit("*").as("band_s"), col("n").cast("long").as("n"),
        lit(true).as("suppressed"))
    published.unionByName(suppressed)
  }

  private val kAnonymitySql =
    """WITH cls AS (
      |  SELECT CAST(c_nationkey AS VARCHAR) AS nation_s, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
      |    count(*) AS n
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT nation_s, seg, CAST(bal_band AS VARCHAR) AS band_s, n,
      |  FALSE AS suppressed
      |FROM cls WHERE n >= 5
      |UNION ALL
      |SELECT '*', '*', '*', CAST(sum(n) AS BIGINT), TRUE
      |FROM cls WHERE n < 5 HAVING sum(n) IS NOT NULL""".stripMargin

  // ---- q233: winsorization (robust outlier clamping) ----------------------

  /** q233: WINSORIZATION — robust statistics' answer to heavy tails:
    * per order-priority group, clamp `o_totalprice` into its own exact
    * [p5, p95] band and report the robust mean beside the bounds. All
    * arithmetic runs on integer CENTS (the q118 discipline): the exact
    * interpolated percentile of integers is a multiple of 0.5 — exactly
    * representable, so Spark's `percentile` and DuckDB's `quantile_cont`
    * agree bitwise; the clamped sum is a sum of halves bounded far below
    * 2^52, so double accumulation is EXACT and order-independent; the
    * final mean/rescale are single IEEE ops. No approximation anywhere —
    * hash-gated.
    *
    * At 100 TB: exact per-group percentiles need a sort-based aggregate
    * per group (the honest cost — q47's sketch quantiles are the
    * approximate escape hatch); the clamp pass re-joins the 5-row bounds
    * frame by broadcast, so the second scan is shuffle-free. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast("long").as("cents")
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"), cents)
    val bounds = o.groupBy(col("prio"))
      .agg(expr("percentile(cents, 0.05)").as("p05"),
        expr("percentile(cents, 0.95)").as("p95"))
    o.join(broadcast(bounds), Seq("prio"))
      .select(col("prio"),
        greatest(col("p05"), least(col("p95"), col("cents").cast("double")))
          .as("w"),
        col("p05"), col("p95"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"),
        max(col("p05")).as("p05_cents"), max(col("p95")).as("p95_cents"),
        (sum(col("w")) / 100).as("wsum"),
        (sum(col("w")) / count(lit(1)) / 100).as("wmean"))
  }

  private val winsorizeSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |b AS (
      |  SELECT prio, quantile_cont(cents, 0.05) AS p05,
      |    quantile_cont(cents, 0.95) AS p95
      |  FROM o GROUP BY prio)
      |SELECT o.prio, count(*) AS n,
      |  max(b.p05) AS p05_cents, max(b.p95) AS p95_cents,
      |  sum(greatest(b.p05, least(b.p95, CAST(o.cents AS DOUBLE)))) / 100
      |    AS wsum,
      |  sum(greatest(b.p05, least(b.p95, CAST(o.cents AS DOUBLE))))
      |    / count(*) / 100 AS wmean
      |FROM o JOIN b ON o.prio = b.prio
      |GROUP BY o.prio""".stripMargin

  // ---- q244: robust outliers by median/MAD --------------------------------

  /** q244: MEDIAN/MAD OUTLIERS — the robust companion to q233's
    * winsorization: per priority group, deviation is measured from the
    * exact MEDIAN and scaled by the exact MAD (median absolute
    * deviation) — the estimator pair a single corrupted batch cannot
    * drag, unlike mean/stddev. Integer-cents discipline throughout: the
    * median of integers is a multiple of 0.5, deviations are multiples
    * of 0.5, the MAD is a multiple of 0.25 — every quantity exactly
    * representable in double, so `percentile`/`quantile_cont` and the
    * 3×MAD comparisons agree bitwise across engines. Output per group:
    * n, median, MAD, and how many points sit beyond the 3-MAD fence.
    *
    * At 100 TB: two exact per-group percentile aggregates (the honest
    * sort cost, q48's class) with the tiny bounds frames re-attached by
    * broadcast — the fact table is scanned, never shuffled wide. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
    val med = b.groupBy(col("prio"))
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = b.join(broadcast(med), Seq("prio"))
      .withColumn("dev", abs(col("cents").cast("double") - col("med")))
    val mad = dev.groupBy(col("prio"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("prio"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        count(when(col("dev") > col("mad") * 3, lit(1))).as("n_outliers"))
  }

  private val madOutliersSql =
    """WITH b AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |m AS (SELECT prio, quantile_cont(cents, 0.5) AS med FROM b GROUP BY 1),
      |d AS (
      |  SELECT b.prio, abs(CAST(b.cents AS DOUBLE) - m.med) AS dev, m.med
      |  FROM b JOIN m ON b.prio = m.prio),
      |md AS (SELECT prio, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
      |SELECT d.prio, count(*) AS n, max(d.med) AS med, max(md.mad) AS mad,
      |  CAST(count(*) FILTER (WHERE d.dev > md.mad * 3) AS BIGINT)
      |    AS n_outliers
      |FROM d JOIN md ON d.prio = md.prio
      |GROUP BY d.prio""".stripMargin

  // ---- q245: gaps and islands ---------------------------------------------

  /** q245: GAPS-AND-ISLANDS — contiguous runs of present keys in a
    * filtered sequence (here: orderkeys in OPEN status), the classic
    * audit question "which ranges are complete, where do the holes
    * start". The island identity is the textbook constant
    * key − row_number(): consecutive present keys share it, any gap
    * shifts it. One ordered window + one grouped aggregate — no
    * self-join, no recursion.
    *
    * At 100 TB: the window is a global sort over the FILTERED keys (the
    * subset of interest, typically ≪ table); at extreme subset sizes the
    * q237 segmented-scan note applies. Output is |islands| rows. */
  def islands(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables(spark, dir, "orders")
      .where(col("o_orderstatus") === "O")
      .select(col("o_orderkey").as("k"))
      .withColumn("grp", col("k") -
        row_number().over(Window.orderBy(col("k"))).cast("long"))
      .groupBy(col("grp"))
      .agg(min(col("k")).as("run_start"), max(col("k")).as("run_end"),
        count(lit(1)).as("run_len"))
      .drop("grp")
  }

  private val islandsSql =
    """WITH k AS (
      |  SELECT o_orderkey AS k,
      |    o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS grp
      |  FROM orders WHERE o_orderstatus = 'O')
      |SELECT min(k) AS run_start, max(k) AS run_end,
      |  count(*) AS run_len
      |FROM k GROUP BY grp""".stripMargin

  // ---- q247: RFM customer segmentation ------------------------------------

  /** q247: RFM SEGMENTATION — the marketing-analytics standard: each
    * customer scored into quartiles of Recency (latest order), Frequency
    * (order count), and Monetary (exact cents total), composed into the
    * three-digit segment code. Every quartile assignment is `ntile(4)`
    * over a TOTAL order (metric, then custkey — the q239 tie discipline,
    * and recency ties over coarse order dates are COMMON, so the unique
    * tiebreak is what makes the segmentation reproducible at all).
    * Customers without orders are excluded (no RFM without activity).
    *
    * At 100 TB: one custkey aggregate over orders, then three global
    * ntile sorts over the |customers| frame — the aggregate, not the
    * fact table, is what gets sorted. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("r_date"),
        count(lit(1)).as("f_n"),
        sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long"))
          .as("m_cents"))
    per
      .withColumn("r_q", ntile(4).over(
        Window.orderBy(col("r_date"), col("custkey"))).cast("long"))
      .withColumn("f_q", ntile(4).over(
        Window.orderBy(col("f_n"), col("custkey"))).cast("long"))
      .withColumn("m_q", ntile(4).over(
        Window.orderBy(col("m_cents"), col("custkey"))).cast("long"))
      .select(col("custkey"), col("r_q"), col("f_q"), col("m_q"),
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("segment"))
  }

  /** q247b: RFM AT SCALE — the q239-histogram substitution q247's
    * scaladoc promises: the three global `ntile(4)` windows (each a
    * single-partition sort of the whole customer frame) replaced by
    * [[graft.operators.DistributedRank]] — exact global rank from a
    * range shuffle + per-partition ordinals, then the SQL-standard ntile
    * split recomputed arithmetically from (rank, N). Values are
    * BIT-IDENTICAL to q247 (same oracle; PlanSpec pins value equality
    * and that no single-partition window survives in the plan). At
    * 100 TB the difference is three range shuffles vs three
    * one-executor sorts of the customer dimension. */
  def rfmSegmentsDist(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.DistributedRank
    val per = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("r_date"),
        count(lit(1)).as("f_n"),
        sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long"))
          .as("m_cents"))
      .localCheckpoint() // three rankings + a count read one build
    val n = per.count()
    def quartile(order: Seq[org.apache.spark.sql.Column], out: String) =
      DistributedRank.withGlobalRank(per, order, "__rk")
        .select(col("custkey"),
          DistributedRank.ntileOfRank(col("__rk"), n, 4).as(out))
    quartile(Seq(col("r_date"), col("custkey")), "r_q")
      .join(quartile(Seq(col("f_n"), col("custkey")), "f_q"), Seq("custkey"))
      .join(quartile(Seq(col("m_cents"), col("custkey")), "m_q"), Seq("custkey"))
      .select(col("custkey"), col("r_q"), col("f_q"), col("m_q"),
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("segment"))
  }

  private val rfmSegmentsSql =
    """WITH per AS (
      |  SELECT o_custkey AS custkey, max(o_orderdate) AS r_date,
      |    CAST(count(*) AS BIGINT) AS f_n,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS m_cents
      |  FROM orders GROUP BY 1),
      |q AS (
      |  SELECT custkey,
      |    CAST(ntile(4) OVER (ORDER BY r_date, custkey) AS BIGINT) AS r_q,
      |    CAST(ntile(4) OVER (ORDER BY f_n, custkey) AS BIGINT) AS f_q,
      |    CAST(ntile(4) OVER (ORDER BY m_cents, custkey) AS BIGINT) AS m_q
      |  FROM per)
      |SELECT custkey, r_q, f_q, m_q,
      |  r_q * 100 + f_q * 10 + m_q AS segment
      |FROM q""".stripMargin

  // ---- q249: chi-square independence --------------------------------------

  /** q249: CHI-SQUARE INDEPENDENCE — is market segment independent of
    * nation? The r×c generalization of q238's 2×2 z² test, same exact-
    * integer discipline: per cell, the scaled residual (O·N − R·C)
    * clears every denominator, and the cell's χ² contribution is the
    * integral-ppm quotient (O·N − R·C)²·10⁶ div (R·C·N). The statistic
    * is DEFINED as the sum of per-cell floor-ppm contributions — exactly
    * reproducible in both engines (each true cell term is ≥ its floor by
    * < 1 ppm, so the definition differs from the textbook real by < rc
    * ppm — nothing a test at any sane α can feel). Output per cell:
    * observed, expected-ppm, contribution, plus the total and
    * dof = (r−1)(c−1) on every row for the consumer's critical-value
    * lookup.
    *
    * At 100 TB: one (nation, segment) aggregate over the fact scan; the
    * margins and totals are window sums over the |cells| frame — bounded
    * by the attribute domains, planning-scale. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val observed = Tables(spark, dir, "customer")
      .groupBy(col("c_nationkey").cast("string").as("nation_s"),
        col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("o"))
    // COMPLETE the grid: a (nation, segment) combination with zero
    // customers still contributes (0 − E)²/E — dropping absent cells
    // would silently understate the statistic exactly where dependence
    // is strongest
    val cells = observed.select(col("nation_s")).distinct()
      .crossJoin(observed.select(col("seg")).distinct())
      .join(observed, Seq("nation_s", "seg"), "left")
      .na.fill(0L, Seq("o"))
    val wAll = Window.partitionBy()
    cells
      .withColumn("r_tot", sum(col("o")).over(Window.partitionBy(col("nation_s"))))
      .withColumn("c_tot", sum(col("o")).over(Window.partitionBy(col("seg"))))
      .withColumn("n_tot", sum(col("o")).over(wAll))
      .withColumn("n_r", size(collect_set(col("nation_s")).over(wAll)).cast("long"))
      .withColumn("n_c", size(collect_set(col("seg")).over(wAll)).cast("long"))
      .withColumn("exp_ppm", expr(
        "CAST((CAST(r_tot AS DECIMAL(38,0)) * c_tot * 1000000) div n_tot AS BIGINT)"))
      .withColumn("chi_ppm", expr(
        """CAST(((CAST(o AS DECIMAL(38,0)) * n_tot - CAST(r_tot AS DECIMAL(38,0)) * c_tot)
          | * (CAST(o AS DECIMAL(38,0)) * n_tot - CAST(r_tot AS DECIMAL(38,0)) * c_tot)
          | * 1000000)
          | div (CAST(r_tot AS DECIMAL(38,0)) * c_tot * n_tot) AS BIGINT)""".stripMargin))
      .withColumn("total_chi_ppm", sum(col("chi_ppm")).over(wAll))
      .withColumn("dof", (col("n_r") - 1) * (col("n_c") - 1))
      .select(col("nation_s"), col("seg"), col("o"), col("exp_ppm"),
        col("chi_ppm"), col("total_chi_ppm"), col("dof"))
  }

  private val chiSquareSql =
    """WITH obs AS (
      |  SELECT CAST(c_nationkey AS VARCHAR) AS nation_s, c_mktsegment AS seg,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM customer GROUP BY 1, 2),
      |cells AS (
      |  SELECT g.nation_s, g.seg, CAST(coalesce(obs.o, 0) AS BIGINT) AS o
      |  FROM (SELECT DISTINCT a.nation_s, b.seg
      |        FROM obs a CROSS JOIN obs b) g
      |  LEFT JOIN obs ON g.nation_s = obs.nation_s AND g.seg = obs.seg),
      |m AS (
      |  SELECT nation_s, seg, o,
      |    sum(o) OVER (PARTITION BY nation_s) AS r_tot,
      |    sum(o) OVER (PARTITION BY seg) AS c_tot,
      |    sum(o) OVER () AS n_tot,
      |    count(DISTINCT nation_s) OVER () AS n_r,
      |    count(DISTINCT seg) OVER () AS n_c
      |  FROM cells),
      |x AS (
      |  SELECT nation_s, seg, o,
      |    CAST(r_tot::HUGEINT * c_tot * 1000000 // n_tot::HUGEINT AS BIGINT)
      |      AS exp_ppm,
      |    CAST((o::HUGEINT * n_tot - r_tot::HUGEINT * c_tot)
      |      * (o::HUGEINT * n_tot - r_tot::HUGEINT * c_tot) * 1000000
      |      // (r_tot::HUGEINT * c_tot * n_tot) AS BIGINT) AS chi_ppm,
      |    CAST((n_r - 1) * (n_c - 1) AS BIGINT) AS dof
      |  FROM m)
      |SELECT nation_s, seg, o, exp_ppm, chi_ppm,
      |  CAST(sum(chi_ppm) OVER () AS BIGINT) AS total_chi_ppm, dof
      |FROM x""".stripMargin

  // ---- q250: Benford first-digit audit ------------------------------------

  /** q250: BENFORD AUDIT — the fraud-detection classic: naturally
    * occurring amounts have first-digit frequency log10(1+1/d); fabricated
    * ones usually don't. The first digit is read from the DECIMAL-string
    * rendering (no log10 or power arithmetic crosses engines — the only
    * transcendentals live in the nine precomputed Benford ppm CONSTANTS,
    * identical literals in both queries). Observed share as exact ppm,
    * deviation = |obs − exp|; digits absent from the data are kept with
    * zero counts via the constants frame so the audit shape is always
    * nine rows. (TPC-H prices are uniform-ish, NOT Benford — the audit
    * honestly reports large deviations, which is the point: the operator
    * measures, the consumer judges.)
    *
    * At 100 TB: one scan-local digit extraction + a 9-group aggregate,
    * joined to a 9-row broadcast constants frame. */
  /** First-digit extraction shared by q250 and its streaming twin: the
    * digit of `amount` from its DECIMAL(18,2)-string rendering (null/0
    * for sub-unit amounts, filtered by the caller). */
  def firstDigit(amount: Column): Column =
    substring(amount.cast(DecimalType(18, 2)).cast("string"), 1, 1).cast("int")

  /** The audit layer over per-digit counts (digit, n): exact ppm shares
    * joined to the nine Benford constants, absent digits kept at zero.
    * Shared by the batch q250 and the streaming q253 so the twin pair
    * can only diverge in how the counts were ACCUMULATED. */
  def benfordFromCounts(spark: SparkSession, counts: DataFrame): DataFrame = {
    import spark.implicits._
    val benfordPpm = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
      9 -> 45757L).toDF("digit", "exp_ppm")
    val tot = counts.agg(sum(col("n")).as("n_tot"))
    benfordPpm.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .selectExpr("digit", "n", "exp_ppm",
        "CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div n_tot AS BIGINT) AS obs_ppm",
        "abs(CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div n_tot AS BIGINT)" +
          " - exp_ppm) AS dev_ppm")
  }

  def benford(spark: SparkSession, dir: String): DataFrame =
    benfordFromCounts(spark,
      Tables(spark, dir, "orders")
        .select(firstDigit(col("o_totalprice")).as("digit"))
        .where(col("digit") >= 1) // sub-dollar amounts render "0.xx"
        .groupBy(col("digit")).agg(count(lit(1)).as("n")))

  /** The q250 oracle parameterized by (amount column, table) — the
    * streaming twin q253 grades against the same template over events. */
  private[queries] def benfordSqlFor(amount: String, table: String): String =
    s"""WITH b(digit, exp_ppm) AS (VALUES
       |  (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
       |  (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
       |c AS (
       |  SELECT CAST(substr(CAST(CAST($amount AS DECIMAL(18,2))
       |      AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM $table GROUP BY 1),
       |t AS (SELECT sum(n) AS n_tot FROM c WHERE digit >= 1)
       |SELECT b.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
       |  CAST(b.exp_ppm AS BIGINT) AS exp_ppm,
       |  CAST(coalesce(c.n, 0)::HUGEINT * 1000000 // t.n_tot::HUGEINT
       |    AS BIGINT) AS obs_ppm,
       |  CAST(abs(coalesce(c.n, 0)::HUGEINT * 1000000 // t.n_tot::HUGEINT
       |    - b.exp_ppm) AS BIGINT) AS dev_ppm
       |FROM b LEFT JOIN c ON b.digit = c.digit AND c.digit >= 1, t""".stripMargin

  private val benfordSql = benfordSqlFor("o_totalprice", "orders")

  // ---- q254: constraint-enforcing write with quarantine -------------------

  /** q254: EXPECTATION-ENFORCED WRITE — the q228 constraint suite moved
    * from REPORTING to the WRITE PATH (the dbt-test/DLT "expectations"
    * shape): rows that pass land in the table, rows that fail are routed
    * to a QUARANTINE with their first failed rule attached — nothing is
    * silently dropped, nothing bad gets in. Defects are injected
    * in-engine (the q229/q231 dirty-derivation discipline: every 97th
    * order's price negated, every 101st's status broken) so both routes
    * carry real traffic. The result is computed from the FILES READ BACK,
    * so the split-write-reread cycle is what the oracle grades; rule
    * precedence (price before status) makes the reason deterministic for
    * rows failing both.
    *
    * At 100 TB: one scan evaluates all rules (codegen'd CASE), the two
    * writes partition the same pass — the quarantine write costs only
    * its own (tiny) row volume, and the good table is usable immediately
    * because the gate ran BEFORE the write, not as a later audit. */
  def enforceWrite(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_enforce")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val dirty = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("price"),
        when(col("o_orderkey") % 101 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("status"))
    val routed = dirty.withColumn("reason",
      when(col("price") <= 0, "nonpositive_price")
        .when(not(col("status").isin("O", "F", "P")), "bad_status"))
    routed.where(col("reason").isNull).drop("reason")
      .write.parquet(s"$out/good")
    routed.where(col("reason").isNotNull)
      .write.parquet(s"$out/quarantine")
    val good = spark.read.parquet(s"$out/good")
      .select(lit("good").as("dest"), lit("ok").as("reason"), col("price"))
    val quar = spark.read.parquet(s"$out/quarantine")
      .select(lit("quarantine").as("dest"), col("reason"), col("price"))
    good.unionByName(quar)
      .groupBy(col("dest"), col("reason"))
      .agg(count(lit(1)).as("n"),
        sum((col("price").cast(DecimalType(18, 2)) * 100).cast("long"))
          .cast("long").as("cents"))
  }

  private val enforceWriteSql =
    """WITH dirty AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
      |      ELSE o_totalprice END AS price,
      |    CASE WHEN o_orderkey % 101 = 0 THEN 'X'
      |      ELSE o_orderstatus END AS status
      |  FROM orders),
      |r AS (
      |  SELECT price,
      |    CASE WHEN price <= 0 THEN 'nonpositive_price'
      |      WHEN status NOT IN ('O','F','P') THEN 'bad_status' END AS reason
      |  FROM dirty)
      |SELECT CASE WHEN reason IS NULL THEN 'good' ELSE 'quarantine' END
      |    AS dest,
      |  coalesce(reason, 'ok') AS reason, count(*) AS n,
      |  CAST(sum(CAST(CAST(price AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM r GROUP BY 1, 2""".stripMargin

  // ---- q274: exact ROC AUC (Mann-Whitney with midranks) --------------------

  /** q274: CLASSIFIER EVALUATION — per-source ROC AUC of a quality score
    * against a binary relevance label, via the Mann-Whitney rank-sum
    * identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) with midranks for ties:
    * the probability a random positive outscores a random negative,
    * ties counting ½ — the one-number summary a pipeline reads before
    * trusting a quality gate (q276 is the per-threshold curve). Score =
    * the q182 type-token ratio in exact ppm; label = lang='en'; any
    * per-doc integer score / boolean label plugs in. No ROC curve is
    * materialized — the rank identity needs one sort per stratum, not a
    * threshold sweep.
    *
    * Exactness: midranks enter as integers (midrank×2 = 2·rank+ties−1),
    * so R₁×2 is an integer sum and AUC lands in ppm through one
    * DECIMAL(38,0) product + `div` truncation — no doubles anywhere
    * (the q211 discipline: per-source counts at the 100 TB design point
    * overflow int64 products). Strata with no positives or no negatives
    * have undefined AUC and are dropped. Scale: one window sort per
    * source stratum (bounded, balanced by construction — the q182
    * shape), then a partial-aggregated groupBy; output |sources| rows. */
  def aucExact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val wR = Window.partitionBy(col("source")).orderBy(col("score_ppm").asc)
    val wT = Window.partitionBy(col("source"), col("score_ppm"))
    Tables(spark, dir, "documents")
      .select(col("source"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("source"), col("pos"),
        expr("(size(array_distinct(toks)) * CAST(1000000 AS BIGINT)) div size(toks)")
          .as("score_ppm"))
      .withColumn("mr2",
        lit(2L) * rank().over(wR) + count(lit(1)).over(wT) - lit(1L))
      .groupBy(col("source"))
      .agg(sum(when(col("pos") === 1L, col("mr2")).otherwise(0L)).as("r1x2"),
        sum(col("pos")).as("n_pos"),
        sum(lit(1L) - col("pos")).as("n_neg"))
      .where(col("n_pos") > 0 && col("n_neg") > 0)
      .selectExpr("source", "n_pos", "n_neg",
        s"CAST(((CAST(r1x2 AS $d38) - CAST(n_pos AS $d38) * (n_pos + 1)) * 1000000)" +
          s" div (CAST(n_pos AS $d38) * n_neg * 2) AS BIGINT) AS auc_ppm")
  }

  private val aucExactSql =
    """WITH t AS (
      |  SELECT source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT source, pos,
      |    CAST(len(list_distinct(toks)) * 1000000 // len(toks) AS BIGINT)
      |      AS score_ppm
      |  FROM t WHERE len(toks) >= 1),
      |r AS (
      |  SELECT source, pos,
      |    2 * rank() OVER (PARTITION BY source ORDER BY score_ppm)
      |      + count(*) OVER (PARTITION BY source, score_ppm) - 1 AS mr2
      |  FROM s),
      |a AS (
      |  SELECT source, sum(CASE WHEN pos = 1 THEN mr2 ELSE 0 END) AS r1x2,
      |    sum(pos) AS n_pos, sum(1 - pos) AS n_neg
      |  FROM r GROUP BY source)
      |SELECT source, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_neg AS BIGINT) AS n_neg,
      |  CAST(((r1x2::HUGEINT - n_pos::HUGEINT * (n_pos + 1)) * 1000000)
      |    // (n_pos::HUGEINT * n_neg * 2) AS BIGINT) AS auc_ppm
      |FROM a WHERE n_pos > 0 AND n_neg > 0""".stripMargin

  // ---- q275: stratified k-fold assignment ----------------------------------

  /** q275: STRATIFIED K-FOLD split — every doc gets a fold in 0..k−1,
    * assigned round-robin along the per-stratum (lang) hash order, so
    * each fold carries an equal share of every stratum (per-stratum fold
    * counts differ by ≤1 by construction — what keeps per-fold eval
    * variance flat when strata are imbalanced; the evaluation-side
    * sibling of q194's leak-free TRAIN/TEST split, which cuts on cluster
    * boundaries rather than balancing folds). Deterministic: the order
    * is (md5(doc_id), doc_id) — re-runs, repartitions, and both engines
    * agree bit-for-bit; no RNG, no seed state to ship.
    *
    * Scale: one window sort per stratum (bounded/balanced — the q182
    * shape). At 100 TB with billions of rows per stratum the drop-in
    * replacement is fold = hash mod k — same contract, zero sorts,
    * stratified in expectation instead of exactly. */
  def kfoldStrata(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .select(col("doc_id"), col("lang"),
        ((row_number().over(w) - 1) % 5).cast("long").as("fold"))
  }

  private val kfoldStrataSql =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CAST((row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) - 1)
      |    % 5 AS BIGINT) AS fold
      |FROM h""".stripMargin

  // ---- q276: operating-point sweep (precision/recall/F1) -------------------

  /** q276: THRESHOLD SWEEP — precision/recall/F1 of the quality score as
    * a relevance classifier at each fixed ppm threshold (keep docs with
    * score ≥ t): the operating-point table a pipeline reads to choose
    * its quality gate (q274 folds the whole curve into one AUC; this is
    * the curve at the nine candidate gates). Exact: tp/fp/fn are
    * integer counts; precision/recall land in ppm via `div`; F1 is the
    * harmonic mean of the two ALREADY-TRUNCATED ppm values
    * (2·p·r div (p+r)) — a deterministic composition both engines
    * evaluate identically, so truncation order can never diverge.
    *
    * Scale: thresholds are a bounded generated array (9 values)
    * exploded map-side against the scored scan; the fan-out collapses
    * into partial (t, tp, fp, fn) counts before the exchange, so the
    * shuffle is 9 rows regardless of corpus size. */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Tables(spark, dir, "documents")
      .select(
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("pos"),
        expr("(size(array_distinct(toks)) * CAST(1000000 AS BIGINT)) div size(toks)")
          .as("score_ppm"))
      .select(col("pos"), col("score_ppm"),
        explode(expr("sequence(100000L, 900000L, 100000L)")).as("t"))
      .groupBy(col("t"))
      .agg(
        sum(when(col("score_ppm") >= col("t") && col("pos") === 1L, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("score_ppm") >= col("t") && col("pos") === 0L, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score_ppm") < col("t") && col("pos") === 1L, 1L)
          .otherwise(0L)).as("fn"))
      .selectExpr("t", "tp", "fp", "fn",
        s"CASE WHEN tp + fp > 0 THEN CAST((CAST(tp AS $d38) * 1000000)" +
          s" div (tp + fp) AS BIGINT) END AS precision_ppm",
        s"CASE WHEN tp + fn > 0 THEN CAST((CAST(tp AS $d38) * 1000000)" +
          s" div (tp + fn) AS BIGINT) END AS recall_ppm")
      .selectExpr("t", "tp", "fp", "fn", "precision_ppm", "recall_ppm",
        s"CASE WHEN precision_ppm IS NOT NULL AND recall_ppm IS NOT NULL" +
          s" AND precision_ppm + recall_ppm > 0" +
          s" THEN CAST((CAST(precision_ppm AS $d38) * recall_ppm * 2)" +
          s" div (precision_ppm + recall_ppm) AS BIGINT) END AS f1_ppm")
  }

  private val thresholdSweepSql =
    """WITH t0 AS (
      |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT pos,
      |    CAST(len(list_distinct(toks)) * 1000000 // len(toks) AS BIGINT)
      |      AS score_ppm
      |  FROM t0 WHERE len(toks) >= 1),
      |g AS (SELECT unnest(generate_series(100000, 900000, 100000)) AS t),
      |c AS (
      |  SELECT g.t,
      |    sum(CASE WHEN s.score_ppm >= g.t AND s.pos = 1 THEN 1 ELSE 0 END)
      |      AS tp,
      |    sum(CASE WHEN s.score_ppm >= g.t AND s.pos = 0 THEN 1 ELSE 0 END)
      |      AS fp,
      |    sum(CASE WHEN s.score_ppm < g.t AND s.pos = 1 THEN 1 ELSE 0 END)
      |      AS fn
      |  FROM s CROSS JOIN g GROUP BY g.t),
      |p AS (
      |  SELECT t, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |    CAST(fn AS BIGINT) AS fn,
      |    CASE WHEN tp + fp > 0 THEN
      |      CAST((tp::HUGEINT * 1000000) // (tp + fp) AS BIGINT)
      |      END AS precision_ppm,
      |    CASE WHEN tp + fn > 0 THEN
      |      CAST((tp::HUGEINT * 1000000) // (tp + fn) AS BIGINT)
      |      END AS recall_ppm
      |  FROM c)
      |SELECT t, tp, fp, fn, precision_ppm, recall_ppm,
      |  CASE WHEN precision_ppm IS NOT NULL AND recall_ppm IS NOT NULL
      |      AND precision_ppm + recall_ppm > 0
      |    THEN CAST((precision_ppm::HUGEINT * recall_ppm * 2)
      |      // (precision_ppm + recall_ppm) AS BIGINT) END AS f1_ppm
      |FROM p""".stripMargin

  // ---- q277: Cohen's kappa (chance-corrected signal agreement) -------------

  /** q277: COHEN'S KAPPA between two binary quality signals — the
    * chance-corrected complement of q193's raw consensus agreement: two
    * signals that both fire on 90% of docs agree 81% of the time by
    * luck alone, and kappa = (p₀ − pₑ)/(1 − pₑ) subtracts exactly that.
    * Signals here: A = type-token ratio ≥ 0.5 (the q182 score), B =
    * ≥ 5 tokens (a length gate) — any two per-doc boolean columns plug
    * in. Output is the full 2×2 contingency (n11/n10/n01/n00) plus
    * kappa in exact ppm, the table a weak-supervision pipeline reads to
    * decide whether two labeling functions are independent evidence or
    * one function counted twice.
    *
    * Exactness: p₀N² − pₑN² and N² − pₑN² are integer-valued, so kappa
    * = (po_num·N − pe_num)·10⁶ div (N² − pe_num) with every product in
    * DECIMAL(38,0) (N² overflows int64 long before 100 TB); both
    * engines truncate toward zero, so negative kappa (worse than
    * chance) crosses engines exactly. Scale: one scan, one 4-cell
    * aggregate — nothing shuffles but four counters. */
  def cohensKappa(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Tables(spark, dir, "documents")
      .select(expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(
        (expr("(size(array_distinct(toks)) * CAST(1000000 AS BIGINT)) div size(toks)")
          >= 500000L).cast("long").as("a"),
        (size(col("toks")) >= 5).cast("long").as("b"))
      .agg(
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
      .selectExpr("n11", "n10", "n01", "n00",
        s"""CAST((
           |  (CAST(n11 + n00 AS $d38) * (n11 + n10 + n01 + n00)
           |    - (CAST(n11 + n10 AS $d38) * (n11 + n01)
           |       + CAST(n01 + n00 AS $d38) * (n10 + n00))) * 1000000
           |) div (
           |  CAST(n11 + n10 + n01 + n00 AS $d38) * (n11 + n10 + n01 + n00)
           |    - (CAST(n11 + n10 AS $d38) * (n11 + n01)
           |       + CAST(n01 + n00 AS $d38) * (n10 + n00))
           |) AS BIGINT) AS kappa_ppm""".stripMargin)
  }

  private val cohensKappaSql =
    """WITH t AS (
      |  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '')
      |    AS toks
      |  FROM documents),
      |s AS (
      |  SELECT
      |    CASE WHEN CAST(len(list_distinct(toks)) * 1000000 // len(toks)
      |      AS BIGINT) >= 500000 THEN 1 ELSE 0 END AS a,
      |    CASE WHEN len(toks) >= 5 THEN 1 ELSE 0 END AS b
      |  FROM t WHERE len(toks) >= 1),
      |c AS (
      |  SELECT CAST(sum(a * b) AS BIGINT) AS n11,
      |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
      |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
      |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      |  FROM s)
      |SELECT n11, n10, n01, n00,
      |  CAST((
      |    ((n11 + n00)::HUGEINT * (n11 + n10 + n01 + n00)
      |      - ((n11 + n10)::HUGEINT * (n11 + n01)
      |         + (n01 + n00)::HUGEINT * (n10 + n00))) * 1000000
      |  ) // (
      |    (n11 + n10 + n01 + n00)::HUGEINT * (n11 + n10 + n01 + n00)
      |      - ((n11 + n10)::HUGEINT * (n11 + n01)
      |         + (n01 + n00)::HUGEINT * (n10 + n00))
      |  ) AS BIGINT) AS kappa_ppm
      |FROM c""".stripMargin

  // ---- q278: cumulative gains / lift table ---------------------------------

  /** q278: GAINS/LIFT TABLE — rank docs by the quality score, cut into
    * ten exact deciles, and report per decile the cumulative share of
    * positives captured (gain) and its ratio to the share of docs read
    * (lift): "the top 20% of the corpus by this score holds X% of the
    * relevant docs" — the budget-allocation curve a selection pipeline
    * reads when it can only afford to keep or review a fixed fraction
    * (q274 scores the ranking, q276 scores fixed thresholds; this
    * scores FRACTIONS of the ranking). Decile = ((rank−1)·10) div N on
    * the totalized (score desc, doc_id) order — NOT ntile, whose
    * uneven-group placement rule is an engine implementation detail;
    * this formula is engine-free arithmetic.
    *
    * Exactness: gains and lift are ppm floor-divisions of pure counts
    * with DECIMAL(38,0) products (cum_pos·N·10⁶ overflows int64 at
    * corpus scale). Scale: the one expensive piece is the global rank
    * over the scored doc frame (a single-partition window at this
    * size); at 100 TB the drop-in is decile-by-value from a broadcast
    * equi-depth histogram of the score (the q239 machinery — same
    * contract, no global sort), then the same 10-row aggregate +
    * running window over ten rows. */
  def gainsTable(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val wRank = Window.orderBy(col("score_ppm").desc, col("doc_id").asc)
    val wCum = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"), col("pos"),
        expr("(size(array_distinct(toks)) * CAST(1000000 AS BIGINT)) div size(toks)")
          .as("score_ppm"))
    val n = scored.groupBy().agg(
      count(lit(1)).as("n_total"), sum(col("pos")).as("pos_total"))
    scored
      .withColumn("rn", row_number().over(wRank))
      .crossJoin(broadcast(n)) // 1-row scalar attach
      .withColumn("decile", expr("((rn - 1) * 10) div n_total").cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"),
        max(col("n_total")).as("n_total"), max(col("pos_total")).as("pos_total"))
      .withColumn("cum_docs", sum(col("n_docs")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .selectExpr("decile", "n_docs", "n_pos", "cum_docs", "cum_pos",
        s"CASE WHEN pos_total > 0 THEN CAST((CAST(cum_pos AS $d38) * 1000000)" +
          s" div pos_total AS BIGINT) END AS gain_ppm",
        s"CASE WHEN pos_total > 0 THEN CAST((CAST(cum_pos AS $d38) * n_total" +
          s" * 1000000) div (CAST(pos_total AS $d38) * cum_docs) AS BIGINT)" +
          s" END AS lift_ppm")
  }

  /** q278b: GAINS TABLE AT SCALE — q278's corpus-wide
    * `row_number() OVER (ORDER BY score DESC)` (one executor sorting
    * every document) replaced by the exact distributed rank, and the
    * 10-row cumulative window by a decile×decile triangle self-join
    * (bounded by the decile count, not the corpus). Deciles, cumulative
    * counts, gain and lift are BIT-IDENTICAL to q278 — same oracle; the
    * two scalar totals ride a 1-row driver collect. */
  def gainsTableDist(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.DistributedRank
    val d38 = "decimal(38,0)"
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"), col("pos"),
        expr("(size(array_distinct(toks)) * CAST(1000000 AS BIGINT)) div size(toks)")
          .as("score_ppm"))
      .localCheckpoint()
    val totals = scored.groupBy().agg(
      count(lit(1)).as("n"), sum(col("pos")).as("p")).head()
    val (nTotal, posTotal) = (totals.getLong(0), totals.getLong(1))
    val deciles = DistributedRank.withGlobalRank(scored,
        Seq(col("score_ppm").desc, col("doc_id").asc), "__rk")
      .withColumn("decile", expr(s"(__rk * 10) div $nTotal").cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"))
      .localCheckpoint()
    deciles
      .join(broadcast(deciles.select(col("decile").as("d2"),
          col("n_docs").as("nd2"), col("n_pos").as("np2"))),
        col("d2") <= col("decile"))
      .groupBy(col("decile"))
      .agg(max(col("n_docs")).as("n_docs"), max(col("n_pos")).as("n_pos"),
        sum(col("nd2")).as("cum_docs"), sum(col("np2")).as("cum_pos"))
      .selectExpr("decile", "n_docs", "n_pos", "cum_docs", "cum_pos",
        s"CASE WHEN $posTotal > 0 THEN CAST((CAST(cum_pos AS $d38) * 1000000)" +
          s" div $posTotal AS BIGINT) END AS gain_ppm",
        s"CASE WHEN $posTotal > 0 THEN CAST((CAST(cum_pos AS $d38) * $nTotal" +
          s" * 1000000) div (CAST($posTotal AS $d38) * cum_docs) AS BIGINT)" +
          s" END AS lift_ppm")
  }

  private val gainsTableSql =
    """WITH t AS (
      |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, pos,
      |    CAST(len(list_distinct(toks)) * 1000000 // len(toks) AS BIGINT)
      |      AS score_ppm
      |  FROM t WHERE len(toks) >= 1),
      |n AS (SELECT count(*) AS n_total, sum(pos) AS pos_total FROM s),
      |r AS (
      |  SELECT pos,
      |    CAST(((row_number() OVER (ORDER BY score_ppm DESC, doc_id) - 1)
      |      * 10) // n.n_total AS BIGINT) AS decile,
      |    n.n_total, n.pos_total
      |  FROM s CROSS JOIN n),
      |d AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(pos) AS BIGINT) AS n_pos,
      |    CAST(max(n_total) AS BIGINT) AS n_total,
      |    CAST(max(pos_total) AS BIGINT) AS pos_total
      |  FROM r GROUP BY decile),
      |c AS (
      |  SELECT decile, n_docs, n_pos, n_total, pos_total,
      |    CAST(sum(n_docs) OVER (ORDER BY decile
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
      |    CAST(sum(n_pos) OVER (ORDER BY decile
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
      |  FROM d)
      |SELECT decile, n_docs, n_pos, cum_docs, cum_pos,
      |  CASE WHEN pos_total > 0 THEN
      |    CAST((cum_pos::HUGEINT * 1000000) // pos_total AS BIGINT)
      |    END AS gain_ppm,
      |  CASE WHEN pos_total > 0 THEN
      |    CAST((cum_pos::HUGEINT * n_total * 1000000)
      |      // (pos_total::HUGEINT * cum_docs) AS BIGINT) END AS lift_ppm
      |FROM c""".stripMargin

  // ---- q295: OLS trend fit (closed form, exact sufficient statistics) -----

  /** q295: ORDINARY LEAST SQUARES — the regression member of the
    * evaluation family (q274-q278 grade classifiers; nothing graded a
    * continuous fit): slope/intercept/R² of the daily event count against
    * the day index, by the closed-form normal equations. All sufficient
    * statistics (n, Σx, Σy, Σx², Σy², Σxy) are EXACT integer sums in
    * DECIMAL(38,0) — one aggregate over the day-grain series — and every
    * emitted double is a fixed chain of IEEE ops on exact operands,
    * written identically in both engines (slope = num/den; R² =
    * (num/den)·(num/denY), the two-quotient form that avoids squaring a
    * DECIMAL(38,0) near its precision cap). This is the map-side-combine
    * regression: at 100 TB the six sums are the only state, merged
    * associatively — the same shape MLlib's summarizers use. */
  def olsTrend(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = Tables(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .agg(count(lit(1)).as("y"))
      .select(datediff(col("d"),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("x"),
        col("y"))
    daily.agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"))
      .select(col("n").as("n_days"),
        (col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).as("den"),
        (col("n").cast(dec) * col("syy") - col("sy") * col("sy")).as("deny"),
        col("sx"), col("sy"), col("n"))
      .select(col("n_days"),
        (col("num").cast("double") / col("den").cast("double")).as("slope"),
        ((col("sy").cast("double") -
          (col("num").cast("double") / col("den").cast("double"))
            * col("sx").cast("double")) / col("n").cast("double"))
          .as("intercept"),
        ((col("num").cast("double") / col("den").cast("double"))
          * (col("num").cast("double") / col("deny").cast("double")))
          .as("r2"))
  }

  private val olsTrendSql =
    """WITH daily AS (
      |  SELECT (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') AS x,
      |    count(*) AS y
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT count(*) AS n, sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
      |    sum(x::HUGEINT * x) AS sxx, sum(y::HUGEINT * y) AS syy,
      |    sum(x::HUGEINT * y) AS sxy
      |  FROM daily),
      |c AS (
      |  SELECT n, n::HUGEINT * sxy - sx * sy AS num,
      |    n::HUGEINT * sxx - sx * sx AS den,
      |    n::HUGEINT * syy - sy * sy AS deny, sx, sy
      |  FROM s)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope,
      |  (CAST(sy AS DOUBLE) - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
      |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
      |  (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
      |    * (CAST(num AS DOUBLE) / CAST(deny AS DOUBLE)) AS r2
      |FROM c""".stripMargin

  // ---- q296: two-sample Kolmogorov-Smirnov statistic (exact) ---------------

  /** q296: TWO-SAMPLE KS — the distribution-drift test that needs no
    * binning (the q211 TV divergence bins; KS compares the full empirical
    * CDFs): D = max over observed values of |F₁(v) − F₂(v)| between the
    * click and view value samples. Exact by clearing denominators:
    * D = max |c₁·n₂ − c₂·n₁| / (n₁·n₂), where the cumulative counts come
    * from one window over the per-cent value grain — the max is found on
    * the INTEGER numerator, so no double comparison ever decides the
    * result; the emitted d is one division of exact integers. The window
    * runs on the distinct-cents grain (≤ 100k rows at any corpus size —
    * value is a bounded 2-dp measure), not the event grain. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir, "events")
      .where(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("v"))
    val byV = ev.groupBy(col("v"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("b"))
    val dec = DecimalType(38, 0)
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val whole = Window.partitionBy().rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byV
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .withColumn("n1", sum(col("a")).over(whole))
      .withColumn("n2", sum(col("b")).over(whole))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("ca").cast(dec) * col("n2") -
          col("cb").cast(dec) * col("n1"))).as("d_num_d"))
      .select(col("n1"), col("n2"),
        col("d_num_d").cast("long").as("d_num"),
        (col("d_num_d").cast("double") /
          (col("n1").cast(dec) * col("n2")).cast("double")).as("d"))
  }

  private val ksTestSql =
    """WITH s AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events WHERE event_type IN ('click', 'view')),
      |byv AS (
      |  SELECT v,
      |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS a,
      |    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS b
      |  FROM s GROUP BY 1),
      |c AS (
      |  SELECT
      |    sum(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
      |    sum(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb,
      |    sum(a) OVER () AS n1, sum(b) OVER () AS n2
      |  FROM byv)
      |SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
      |  CAST(max(abs(ca * n2 - cb * n1)) AS BIGINT) AS d_num,
      |  CAST(max(abs(ca * n2 - cb * n1)) AS DOUBLE)
      |    / CAST(max(n1) * max(n2) AS DOUBLE) AS d
      |FROM c""".stripMargin

  // ---- q297: leave-one-out target encoding ---------------------------------

  /** q297: LOO TARGET ENCODING — the feature-engineering staple for
    * categorical columns feeding a model: each row's category is encoded
    * as the mean target of all OTHER rows in its category,
    * (Σ_g − v)/(c_g − 1), which removes the self-leakage plain target
    * encoding has. Exact: the numerator is an integer-cents subtraction
    * of window sums, the encode is ONE division per row — no
    * order-sensitive accumulation anywhere. Singleton categories are
    * excluded (the encoding is undefined; real pipelines back off to the
    * global prior). One shuffle (the category-partitioned window); at
    * 100 TB the window state per partition is two running scalars. */
  def looEncode(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
    Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("v"))
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("c", count(lit(1)).over(w))
      .where(col("c") > 1)
      .select(col("event_id"), col("event_type"),
        ((col("s") - col("v")).cast("double") /
          (col("c") - lit(1L)).cast("double")).as("loo_cents"))
  }

  private val looEncodeSql =
    """WITH s AS (
      |  SELECT event_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      OVER (PARTITION BY event_type) AS BIGINT) AS sv,
      |    count(*) OVER (PARTITION BY event_type) AS c
      |  FROM events)
      |SELECT event_id, event_type,
      |  CAST(sv - v AS DOUBLE) / CAST(c - 1 AS DOUBLE) AS loo_cents
      |FROM s WHERE c > 1""".stripMargin

  // ---- q299: Theil-Sen robust slope ----------------------------------------

  /** q299: THEIL-SEN — the robust companion of q295's OLS: the median of
    * all pairwise slopes of the daily series, insensitive to outlier
    * days that drag a least-squares fit. The pair space is DAY-grain —
    * O(|days|²) on a frame that is planning-scale at any corpus size
    * (the corpus-sized work is the one daily aggregate) — generated by
    * broadcasting the tiny day frame against itself. Each slope is ONE
    * IEEE division of exact integers; the median is selected by POSITION
    * over the slope-ordered pairs (lower median, deterministic: equal
    * slopes are interchangeable by value, so tie order cannot change the
    * selected VALUE). */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .agg(count(lit(1)).as("y"))
      .select(datediff(col("d"),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("x"),
        col("y"))
    val a = daily.select(col("x").as("x1"), col("y").as("y1"))
    val b = daily.select(col("x").as("x2"), col("y").as("y2"))
    val slopes = a.join(broadcast(b), col("x1") < col("x2"))
      .select(((col("y2") - col("y1")).cast("double") /
        (col("x2") - col("x1")).cast("double")).as("slope"))
    val w = Window.orderBy(col("slope"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .where(col("rn") === expr("(m + 1) div 2")) // integer division: lower median
      .select(col("m").as("n_pairs"), col("slope").as("ts_slope"))
  }

  private val theilSenSql =
    """WITH daily AS (
      |  SELECT (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b ON a.x < b.x),
      |r AS (
      |  SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
      |    count(*) OVER () AS m
      |  FROM p)
      |SELECT CAST(m AS BIGINT) AS n_pairs, slope AS ts_slope
      |FROM r WHERE rn = (m + 1) // 2""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q295_ols_trend", olsTrend, Some(olsTrendSql)),
    QueryDef("q296_ks_test", ksTest, Some(ksTestSql)),
    QueryDef("q297_loo_encode", looEncode, Some(looEncodeSql)),
    QueryDef("q299_theil_sen", theilSen, Some(theilSenSql)),
    QueryDef("q227_profile", profile, Some(profileSql)),
    QueryDef("q228_constraints", constraints, Some(constraintsSql)),
    QueryDef("q229_entity_resolution", entityResolution, Some(entityResolutionSql)),
    QueryDef("q231_pii_redact", piiRedact, Some(piiRedactSql)),
    QueryDef("q232_k_anonymity", kAnonymity, Some(kAnonymitySql)),
    QueryDef("q233_winsorize", winsorize, Some(winsorizeSql)),
    QueryDef("q244_mad_outliers", madOutliers, Some(madOutliersSql)),
    QueryDef("q245_islands", islands, Some(islandsSql)),
    QueryDef("q247_rfm_segments", rfmSegments, Some(rfmSegmentsSql)),
    QueryDef("q247b_rfm_dist", rfmSegmentsDist, Some(rfmSegmentsSql)),
    QueryDef("q249_chi_square", chiSquare, Some(chiSquareSql)),
    QueryDef("q250_benford", benford, Some(benfordSql)),
    QueryDef("q254_enforce_write", enforceWrite, Some(enforceWriteSql)),
    QueryDef("q274_auc_exact", aucExact, Some(aucExactSql)),
    QueryDef("q275_kfold_strata", kfoldStrata, Some(kfoldStrataSql)),
    QueryDef("q276_threshold_sweep", thresholdSweep, Some(thresholdSweepSql)),
    QueryDef("q277_cohens_kappa", cohensKappa, Some(cohensKappaSql)),
    QueryDef("q278_gains_table", gainsTable, Some(gainsTableSql)),
    QueryDef("q278b_gains_dist", gainsTableDist, Some(gainsTableSql)))
}
