package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * At 100 TB a table is pruned through file/row-group min-max statistics; a
  * layout sorted on ONE key gives tight ranges on that key only. Interleaving
  * the bits of two keys into a Z-value and clustering on it bounds BOTH
  * dimensions inside every cluster, so point/range predicates on EITHER key
  * prune files. The whole computation is integer bit arithmetic inside one
  * whole-stage-codegen'd scan followed by a single partial+final aggregate —
  * no joins, no extra shuffle beyond the group-by.
  *
  * Determinism: the Z-value is exact integer math, reproduced operator-for-
  * operator in the DuckDB oracle, so q125 is hash-gated end-to-end.
  * `ZorderSpec` additionally pins the pruning THEOREM: dropping the low
  * 2k bits of the Z-value leaves at most k free low bits per dimension, so
  * every `z >> 10` cell spans at most 32 consecutive values of each key.
  */
object Layout {

  /** Spread the low 31 bits of `c` to the even bit positions 0,2,..,60
    * (classic Morton magic-mask spread: x, x<<16, x<<8, x<<4, x<<2, x<<1
    * with narrowing masks). 31 bits per dimension covers every integer key
    * in the schema (TPC-H partkey reaches 2·10⁵·sf — 16 bits would alias
    * above sf≈0.33 and the per-cell min-max bounds would silently stop
    * holding); the 62-bit z stays positive in a BIGINT in both engines.
    * Pure codegen'd integer ops. */
  private[queries] def spread31(c: Column): Column =
    Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
      .foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
        case (x, (s, mask)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
      }

  /** 62-bit Z-value: bits of `a` on even positions, bits of `b` on odd. */
  def zValue(a: Column, b: Column): Column =
    spread31(a).bitwiseOR(shiftleft(spread31(b), 1))

  /** k-WAY Morton interleave: bit `b` of dimension `j` lands at position
    * `b*k + j`, so every prefix of the Z-value fixes the same number of
    * high bits of EVERY dimension — the balance property that makes a
    * z-clustered layout prune on any constrained key. Inputs must already
    * be normalized to `bits` bits (the compact procedure min-max
    * normalizes); `k*bits ≤ 62` keeps the value positive in a BIGINT.
    * Pure codegen'd integer ops (k·bits shift/mask terms — 45 for three
    * 15-bit dims). For k=2 the layout is bit-identical to [[zValue]] on
    * the same normalized inputs. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && cols.length * bits <= 62,
      s"zValueN: need 1..62/bits dims, got ${cols.length} x $bits bits")
    val k = cols.length
    val lowMask = lit((1L << bits) - 1)
    cols.zipWithIndex.map { case (c, j) =>
      val base = c.cast("long").bitwiseAND(lowMask)
      (0 until bits).map { b =>
        shiftleft(shiftright(base, b).bitwiseAND(lit(1L)), b * k + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** The same spread as plain SQL, for the DuckDB oracle. */
  private def spreadSql(col: String): String = {
    var x = s"(CAST($col AS BIGINT) & 2147483647)"
    for ((s, mask) <- Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
        1 -> 0x5555555555555555L))
      x = s"(($x | ($x << $s)) & $mask)"
    x
  }

  /** q125: Z-order cells over lineitem (l_partkey ⨉ l_suppkey) with the
    * per-cell min-max statistics a file-pruning layer would persist. Each
    * `z >> 10` cell is a 32×32 tile of key space: the min/max columns SHOW
    * the double-sided prunability the layout buys. */
  def zorderCells(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("cell", shiftright(zValue(col("l_partkey"), col("l_suppkey")), 10))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("part_lo"), max(col("l_partkey")).as("part_hi"),
        min(col("l_suppkey")).as("supp_lo"), max(col("l_suppkey")).as("supp_hi"))

  private val zorderCellsSql = {
    val z = s"(${spreadSql("l_partkey")} | (${spreadSql("l_suppkey")} << 1))"
    s"""SELECT ($z >> 10) AS cell, count(*) AS n,
       |  min(l_partkey) AS part_lo, max(l_partkey) AS part_hi,
       |  min(l_suppkey) AS supp_lo, max(l_suppkey) AS supp_hi
       |FROM lineitem GROUP BY 1""".stripMargin
  }

  // ---- q224: zone-map file skipping, end-to-end ---------------------------

  /** q224: ZONE-MAP DATA SKIPPING — the table-format layer (Delta/Iceberg
    * file statistics) built and CONSUMED as engine operators: events are
    * laid out range-clustered on `ts` (`repartitionByRange` — each output
    * file covers a tight, near-disjoint time slice; q125's Z-order is the
    * 2-D generalization of this 1-D layout), a zone map (per-file min/max
    * day + row count) is derived in one aggregate pass, and a one-day
    * query consults the zone map FIRST, reading only the files whose
    * [min, max] interval can contain the day. Parquet's own row-group
    * stats prune within a file the same way; this is the level ABOVE the
    * format — the planner never even opens a pruned file's footer.
    *
    * Soundness is min/max interval containment (a file whose zone
    * excludes the day cannot hold a matching row), so pruning can never
    * lose rows — the oracle's from-scratch filter over the whole table
    * grades exactly that; `pruned` pins that the skip actually happened
    * (fewer files read than exist — the layout/selectivity precondition,
    * measured: a 1-day predicate touches ≤2 of 8 files at every sf).
    *
    * At 100 TB: the zone map is |files| rows (one aggregate over the
    * layout, or maintained incrementally at write time like q213); file
    * selection is a |files|-row filter on the driver — planning-scale,
    * the same listing the scheduler already holds — and scan cost drops
    * from O(table) to O(selected slice). Without the clustered layout
    * the same statistics prune NOTHING (every file spans every day) —
    * layout and skipping are one design, which is why they share q125's
    * module. */
  def zoneSkip(spark: SparkSession, dir: String): DataFrame = {
    import graft.Exact.dsum2
    val ev = Tables(spark, dir, "events")
    val out = java.nio.file.Files.createTempDirectory("graft_zone")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val layout = s"$out/events_by_ts"
    ev.repartitionByRange(8, col("ts")).write.parquet(layout)
    val laid = spark.read.parquet(layout)
    // the persisted zone map: one row per file (day-grain bounds — the
    // predicate's grain; string compare is engine-neutral)
    val zones = laid
      .groupBy(input_file_name().as("file"))
      .agg(min(date_format(col("ts"), "yyyy-MM-dd")).as("day_lo"),
        max(date_format(col("ts"), "yyyy-MM-dd")).as("day_hi"))
      .collect() // |files| rows — planning-scale, the scheduler's listing
    // the query day: 11th distinct day (mid-corpus at every sf)
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().orderBy(col("day")).limit(11)
      .collect()
    // a too-small corpus must fail loudly here, not hash-diverge from the
    // oracle's LIMIT 1 OFFSET 10 (which returns no row)
    require(days.length == 11,
      s"zoneSkip needs >= 11 distinct event days, found ${days.length}")
    val day = days.last.getString(0)
    val keep = zones.filter(r =>
        r.getString(1) <= day && day <= r.getString(2))
      .map(_.getString(0))
    val pruned = keep.nonEmpty && keep.length < zones.length
    spark.read.parquet(keep.toIndexedSeq: _*)
      .where(date_format(col("ts"), "yyyy-MM-dd") === day)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("total_value"))
      .select(col("event_type"), col("n"), col("total_value"),
        lit(pruned).as("pruned"))
  }

  private val zoneSkipSql =
    s"""WITH d AS (
       |  SELECT day FROM (
       |    SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events
       |    ORDER BY day LIMIT 1 OFFSET 10))
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("value")} AS total_value, TRUE AS pruned
       |FROM events, d
       |WHERE strftime(ts, '%Y-%m-%d') = d.day
       |GROUP BY 1""".stripMargin

  // ---- q225: per-file Bloom-filter skipping for point lookups -------------

  /** q225: BLOOM-FILTER FILE SKIPPING — the complement of q224's zone
    * maps for the predicate they cannot help with: a point lookup on a
    * key UNCORRELATED with the layout (here `event_id` against the
    * ts-clustered layout — every file's id min/max spans the whole
    * domain, so interval pruning keeps everything). A per-file Bloom
    * index prunes by CONTENT: k=3 hash positions per id into an m=2¹⁶-bit
    * filter, stored SPARSELY as (file, word, bits) rows via `bit_or`
    * aggregation — pure codegen'd integer ops, no UDAF, and the sparse
    * rows are exactly what a format's bloom column would serialize.
    *
    * Probe: each target id's k (word, bit) pairs join the index; a file
    * qualifies for a target only if ALL k bits are set (`HAVING count =
    * k`). One-sided error, the q67 contract: a containing file always
    * qualifies (no false negatives — the oracle's full-table lookup
    * grades that), a false positive merely reads one extra file.
    * `pruned` pins that the index did skip files (unique ids live in
    * exactly one file each, so ≤3 of 8 qualify up to FPs).
    *
    * At 100 TB: the index build is one scan + one (file, word)-keyed
    * shuffle of ≤ k·rows positions aggregating to ≤ |files|·m/64 sparse
    * rows; sizing follows the standard m ≈ 10·k bits per distinct key
    * per file for ~1% FP. The probe side is |targets|·k rows — broadcast
    * by AQE — and the candidate scan opens only qualifying files. This
    * is the needle-in-haystack path (audit lookups, GDPR subject-access)
    * that otherwise full-scans 100 TB for three rows. */
  def bloomSkip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val out = java.nio.file.Files.createTempDirectory("graft_bloomidx")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val layout = s"$out/events_by_ts"
    ev.repartitionByRange(8, col("ts")).write.parquet(layout)
    val laid = spark.read.parquet(layout)
    val mBits = 1L << 16
    val kHash = 3
    def positions(id: org.apache.spark.sql.Column) = (0 until kHash).map(j =>
      struct(lit(j).as("j"),
        pmod(xxhash64(id, lit(j)), lit(mBits)).as("pos")))
    // the persisted sparse per-file bloom: (file, word, bits)
    val idx = laid
      .select(input_file_name().as("file"),
        explode(array(positions(col("event_id")): _*)).as("p"))
      .select(col("file"), (col("p.pos") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(p.pos % 64 AS INT))").as("bit"))
      .groupBy(col("file"), col("word"))
      .agg(expr("bit_or(bit)").as("bits"))
      .localCheckpoint() // the index a format would persist beside the data
    val nFiles = idx.select(col("file")).distinct().count()
    // targets: min, max, and first-past-midpoint ids (1-row lookups)
    val mm = ev.agg(min(col("event_id")), max(col("event_id"))).head()
    val (idLo, idHi) = (mm.getLong(0), mm.getLong(1))
    val midRow = ev.where(col("event_id") > lit((idLo + idHi) / 2))
      .agg(min(col("event_id"))).head()
    val targets = (Seq(idLo, idHi) ++
      (if (midRow.isNullAt(0)) Nil else Seq(midRow.getLong(0)))).distinct
    import spark.implicits._
    val probe = targets.toDF("id")
      .select(col("id"), explode(array(positions(col("id")): _*)).as("p"))
      .select(col("id"), col("p.j").as("j"),
        (col("p.pos") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(p.pos % 64 AS INT))").as("bit"))
    val cand = probe.join(idx, Seq("word"))
      .where((col("bits").bitwiseAND(col("bit"))) =!= 0)
      .groupBy(col("id"), col("file"))
      .agg(countDistinct(col("j")).as("k_hit"))
      .where(col("k_hit") === kHash)
    val candFiles = cand.select(col("file")).distinct()
      .collect().map(_.getString(0)) // ≤ |targets| + FP files
    val pruned = candFiles.nonEmpty && candFiles.length < nFiles
    spark.read.parquet(candFiles.toIndexedSeq: _*)
      .where(col("event_id").isin(targets: _*))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        lit(pruned).as("pruned"))
  }

  private val bloomSkipSql =
    """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
      |t AS (
      |  SELECT lo AS id FROM b
      |  UNION ALL SELECT hi FROM b
      |  UNION ALL
      |  SELECT min(event_id) FROM events, b WHERE event_id > (lo + hi) // 2)
      |SELECT e.event_id, e.user_id, e.event_type, e.value, TRUE AS pruned
      |FROM events e
      |JOIN (SELECT DISTINCT id FROM t WHERE id IS NOT NULL) ids
      |  ON e.event_id = ids.id""".stripMargin

  // ---- q230: zone-map pruning as an optimizer rule ------------------------

  /** q230: the q224 skip made TRANSPARENT — `graft.plans.SkippingIndexRule`.
    * The layout materializes a `day` column and range-clusters on `ts`
    * (so each file spans a tight day interval); `buildZoneMap`
    * registers per-file [min, max] day bounds; and the consumer is then a
    * PLAIN `spark.read.parquet(dir).where(day = ...)` — no zone-map code
    * in the query. The optimizer rewrites the scan to only the files
    * whose interval can contain the day; `pruned` is read back from the
    * OPTIMIZED plan's own file listing, so the flag pins that the rule —
    * not the author — did the skip, and the full-scan oracle pins that it
    * lost nothing. `RulesSpec` covers the decline paths (unknown file,
    * foreign session, cast-wrapped predicate).
    *
    * At 100 TB this is the difference between "data skipping if every
    * author remembers to consult the index" and "data skipping": q213's
    * matview refresh, ad-hoc exploration, and the SQL front end (q219-
    * q221) all inherit the prune with zero query changes. */
  def zoneRuleSkip(spark: SparkSession, dir: String): DataFrame = {
    import graft.Exact.dsum2
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val ev = Tables(spark, dir, "events")
    val out = java.nio.file.Files.createTempDirectory("graft_zonerule")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val layout = s"$out/events_by_day"
    ev.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartitionByRange(8, col("ts")).write.parquet(layout)
    graft.plans.SkippingIndexRule.buildZoneMap(spark, layout, "day")
    val day = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().orderBy(col("day")).limit(6)
      .collect().last.getString(0)
    val agg = spark.read.parquet(layout)
      .where(col("day") === day)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("total_value"))
    val filesRead = agg.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.length
        case _ => 0
      }
    }.sum
    val total = spark.read.parquet(layout).inputFiles.length
    agg.select(col("event_type"), col("n"), col("total_value"),
      lit(filesRead > 0 && filesRead < total).as("pruned"))
  }

  private val zoneRuleSkipSql =
    s"""WITH d AS (
       |  SELECT day FROM (
       |    SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events
       |    ORDER BY day LIMIT 1 OFFSET 5))
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("value")} AS total_value, TRUE AS pruned
       |FROM events, d
       |WHERE strftime(ts, '%Y-%m-%d') = d.day
       |GROUP BY 1""".stripMargin

  // ---- q235: bloom-filter skipping as an optimizer rule -------------------

  /** q235: the q225 bloom skip made TRANSPARENT — the second index kind of
    * `graft.plans.SkippingIndexRule`. Same layout as q224/q230
    * (ts-range-clustered, so `event_id` is UNCORRELATED with file
    * boundaries and zone maps on it would prune nothing); `buildBloom`
    * registers the q225 sparse per-file (word, bits) filter; the consumer
    * is a PLAIN `spark.read.parquet(dir).where(event_id IN (...))` point
    * lookup. The rule probes each target id's k hash positions against
    * every file's filter and deletes the k-of-k-missing files from the
    * plan. One-sided error (the q225/q67 contract): a containing file
    * always survives — the full-table oracle grades no-false-negative —
    * and a false positive merely reads one extra file. `pruned` is read
    * back from the OPTIMIZED plan, so the rule, not the author, is what
    * is graded.
    *
    * At 100 TB: this is the automatic needle-in-haystack path — audit and
    * subject-access lookups over a corpus laid out for ANALYTICS (time-
    * clustered) stop costing a full scan the moment the write path also
    * maintains 8 KB of bloom bits per file. */
  def bloomRuleSkip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val ev = Tables(spark, dir, "events")
    val out = java.nio.file.Files.createTempDirectory("graft_bloomrule")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val layout = s"$out/events_by_ts"
    ev.repartitionByRange(8, col("ts")).write.parquet(layout)
    graft.plans.SkippingIndexRule.buildBloom(spark, layout, "event_id")
    // targets: min, max, and first-past-midpoint ids (the q225 probe set)
    val mm = ev.agg(min(col("event_id")), max(col("event_id"))).head()
    val (idLo, idHi) = (mm.getLong(0), mm.getLong(1))
    val midRow = ev.where(col("event_id") > lit((idLo + idHi) / 2))
      .agg(min(col("event_id"))).head()
    val targets = (Seq(idLo, idHi) ++
      (if (midRow.isNullAt(0)) Nil else Seq(midRow.getLong(0)))).distinct
    val lookup = spark.read.parquet(layout)
      .where(col("event_id").isin(targets: _*))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val filesRead = lookup.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.length
        case _ => 0
      }
    }.sum
    val total = spark.read.parquet(layout).inputFiles.length
    lookup.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), lit(filesRead > 0 && filesRead < total).as("pruned"))
  }

  // ---- q243: persisted indexes — build, save, attach in a "new process" ---

  /** q243: the SkippingIndexRule PERSISTENCE lifecycle, oracle-gated:
    * build both index kinds over the clustered layout (zone map on `day`,
    * bloom on `event_id`), `save` them to the `_graft_index` sidecar,
    * DROP the in-memory registration (the process-death simulation — the
    * q204→q216 matview pattern applied to indexes), `attach` from the
    * sidecar alone, and only then run the day query. The result must
    * equal the full-scan oracle AND carry `pruned = true` read back from
    * the optimized plan — so what is graded is pruning through an index
    * that took the full disk round-trip, fingerprint validation included.
    *
    * At 100 TB this is the difference between "indexes if the writer
    * process is still alive" and a table FORMAT: the bloom build's
    * full-corpus scan is paid once, every later reader session attaches
    * in |files| stat calls. */
  def indexedAttach(spark: SparkSession, dir: String): DataFrame = {
    import graft.Exact.dsum2
    import graft.plans.SkippingIndexRule
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val ev = Tables(spark, dir, "events")
    val out = java.nio.file.Files.createTempDirectory("graft_idxattach")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val layout = s"$out/events_by_day"
    ev.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartitionByRange(8, col("ts")).write.parquet(layout)
    SkippingIndexRule.buildZoneMap(spark, layout, "day")
    SkippingIndexRule.buildBloom(spark, layout, "event_id")
    require(SkippingIndexRule.save(spark, layout) == 2, "save must persist both")
    SkippingIndexRule.drop(spark, layout) // simulate process death
    require(SkippingIndexRule.attach(spark, layout) == 2, "attach must adopt both")
    val days16 = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().orderBy(col("day")).limit(16)
      .collect()
    require(days16.length == 16,
      s"indexedAttach needs >= 16 distinct event days, found ${days16.length}")
    val day = days16.last.getString(0)
    val agg = spark.read.parquet(layout)
      .where(col("day") === day)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("total_value"))
    val filesRead = agg.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.length
        case _ => 0
      }
    }.sum
    val total = spark.read.parquet(layout).inputFiles.length
    agg.select(col("event_type"), col("n"), col("total_value"),
      lit(filesRead > 0 && filesRead < total).as("pruned"))
  }

  private val indexedAttachSql =
    s"""WITH d AS (
       |  SELECT day FROM (
       |    SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events
       |    ORDER BY day LIMIT 1 OFFSET 15))
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("value")} AS total_value, TRUE AS pruned
       |FROM events, d
       |WHERE strftime(ts, '%Y-%m-%d') = d.day
       |GROUP BY 1""".stripMargin

  // ---- q251: schema evolution (mergeSchema read over mixed batches) -------

  /** q251: SCHEMA EVOLUTION — the lakehouse reality that a table's files
    * were written under DIFFERENT schema versions: batch 1 lands
    * (orderkey, totalprice), batch 2 adds `o_orderpriority`. A
    * `mergeSchema` read unions the file schemas (Spark reconciles parquet
    * footers per file; the old files' missing column reads as NULL), and
    * the aggregate treats pre-schema rows as their own '(pre-schema)'
    * bucket — exactly how a production migration reports until backfill.
    * The oracle recomputes from the base table with the same parity
    * split, so what is graded is the null-fill semantics of the merged
    * scan itself.
    *
    * At 100 TB: schema merge is a footer-level planning cost (per-file,
    * driver-side — the reason formats persist a unified schema in
    * metadata instead; q243's sidecar discipline applies); the scan and
    * aggregate are the ordinary one-shuffle shape. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import graft.Exact.dsum2
    val o = Tables(spark, dir, "orders")
    val out = java.nio.file.Files.createTempDirectory("graft_schemaevo")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val table = s"$out/orders_evolved"
    o.where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.parquet(table)
    o.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("append").parquet(table)
    spark.read.option("mergeSchema", "true").parquet(table)
      .groupBy(coalesce(col("o_orderpriority"), lit("(pre-schema)")).as("prio"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total"))
  }

  private val schemaEvolutionSql =
    s"""SELECT CASE WHEN o_orderkey % 2 = 0 THEN '(pre-schema)'
       |  ELSE o_orderpriority END AS prio,
       |  CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("o_totalprice")} AS total
       |FROM orders GROUP BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q125_zorder_cells", zorderCells, Some(zorderCellsSql)),
    QueryDef("q224_zone_skip", zoneSkip, Some(zoneSkipSql)),
    QueryDef("q225_bloom_skip", bloomSkip, Some(bloomSkipSql)),
    QueryDef("q230_zone_rule", zoneRuleSkip, Some(zoneRuleSkipSql)),
    QueryDef("q235_bloom_rule", bloomRuleSkip, Some(bloomSkipSql)),
    QueryDef("q243_index_attach", indexedAttach, Some(indexedAttachSql)),
    QueryDef("q251_schema_evolution", schemaEvolution, Some(schemaEvolutionSql)),
    QueryDef("q252_federation", federation, Some(federationSql)),
    QueryDef("q264_bitmap_index", bitmapIndex, Some(bitmapIndexSql)))

  // ---- q264: bitmap index over a low-cardinality column -------------------

  /** q264: BITMAP INDEX — the columnar-warehouse representation of a
    * low-cardinality predicate column: per (status, 32-key block) one
    * word whose set bits are the orderkeys in that status (32-key
    * blocks: a shift into a signed 64-bit sign bit overflows under
    * ANSI/DuckDB checks, so the portable word uses the low half). Built
    * by pure codegen'd integer ops (`shiftleft` + `bit_or` — the q225
    * bloom machinery pointed at a DENSE key domain, where the bitmap is
    * exact, not probabilistic). The audit output proves the index
    * algebra: per status, popcount(Σ words) equals the status's row
    * count exactly, and the OR-merge across statuses reproduces the
    * table's total — the two identities (disjoint partition, full
    * coverage) every bitmap-index consumer (AND/OR predicate pushdown)
    * rests on.
    *
    * At 100 TB: |statuses|·|keys|/64 words ≈ table bits / 8 bytes —
    * the standard bitmap compression argument before run-length coding;
    * build is one scan + one (status, word)-keyed aggregate. */
  def bitmapIndex(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables(spark, dir, "orders")
      .select(col("o_orderstatus").as("status"),
        expr("o_orderkey div 32").as("word"),
        expr("shiftleft(1L, CAST(o_orderkey % 32 AS INT))").as("bit"))
      .groupBy(col("status"), col("word"))
      .agg(expr("bit_or(bit)").as("bits"))
      .localCheckpoint() // consumed twice: per-status audit + OR-merge
    val perStatus = words.groupBy(col("status"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("bit_count(bits)")).cast("long").as("n_set"))
    val merged = words.groupBy(col("word"))
      .agg(expr("bit_or(bits)").as("bits"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("bit_count(bits)")).cast("long").as("n_set"))
      .select(lit("ALL").as("status"), col("n_words"), col("n_set"))
    perStatus.unionByName(merged)
  }

  private val bitmapIndexSql =
    """WITH w AS (
      |  SELECT o_orderstatus AS status, o_orderkey // 32 AS word,
      |    bit_or(1::BIGINT << CAST(o_orderkey % 32 AS INTEGER)) AS bits
      |  FROM orders GROUP BY 1, 2)
      |SELECT status, count(*) AS n_words,
      |  CAST(sum(bit_count(bits)) AS BIGINT) AS n_set
      |FROM w GROUP BY status
      |UNION ALL
      |SELECT 'ALL', count(*), CAST(sum(bit_count(bits)) AS BIGINT)
      |FROM (SELECT word, bit_or(bits) AS bits FROM w GROUP BY word)""".stripMargin

  // ---- q252: cross-format federation --------------------------------------

  /** q252: FORMAT FEDERATION — one query joining three storage formats
    * (CSV orders, JSON customers, the base parquet corpus they derive
    * from), the everyday lakehouse reality that reference data arrives
    * as whatever the producer exports. Both sidecar formats are
    * round-tripped THROUGH their text encodings in-engine and read back
    * with EXPLICIT schemas (schema inference on text formats is the
    * type-drift trap — a BIGINT column inferred INT on a small file
    * breaks the join at scale); doubles survive the CSV round-trip
    * bit-exactly (shortest-representation printing is read back to the
    * identical double). The oracle computes from the base tables, so the
    * whole encode→decode→join path is what's graded.
    *
    * At 100 TB: text formats scan 3-10× slower than parquet and carry no
    * pushdown or stats — the right design converts at the door (the
    * q213/q215 write path); this operator exists for the federation
    * moment BEFORE that conversion. */
  def federation(spark: SparkSession, dir: String): DataFrame = {
    import graft.Exact.dsum2
    val out = java.nio.file.Files.createTempDirectory("graft_fed")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.option("header", "true").csv(s"$out/orders_csv")
    Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.json(s"$out/customer_json")
    val oc = spark.read.option("header", "true")
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE")
      .csv(s"$out/orders_csv")
    val cj = spark.read
      .schema("c_custkey BIGINT, c_mktsegment STRING")
      .json(s"$out/customer_json")
    oc.join(cj, oc("o_custkey") === cj("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("tot"))
  }

  private val federationSql =
    s"""SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
       |  ${graft.Exact.sqlSum2("o_totalprice")} AS tot
       |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |GROUP BY 1""".stripMargin
}
