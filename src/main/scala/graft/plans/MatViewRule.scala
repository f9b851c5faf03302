package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: TRANSPARENT MATERIALIZED-VIEW SUBSTITUTION, exact-match
  * tier. A registered view pairs a defining query with a warehouse table
  * holding its result; any later query whose plan CONTAINS the defining
  * subplan (canonicalized — attribute ids and cosmetic aliasing ignored)
  * has that subtree swapped for a scan of the table. The consumer keeps
  * its author-facing shape — `explode(split(text))` + groupBy in the
  * source — and the optimizer silently reads the precomputed aggregate:
  * the corpus scan, the explode, and the aggregation exchange all vanish
  * from the physical plan.
  *
  * Exact-match is the honest first tier of view rewriting (commercial
  * engines and Calcite start exactly here before unifying filters or
  * rolling up aggregates): it already covers the dominant production
  * case — a standard derived table (word counts, per-doc features, daily
  * aggregates) consumed verbatim by many downstream queries.
  *
  * Substitution preserves semantics by FOUR stacked guards, each of which
  * declines (never fails) the rewrite:
  *  - the registry key is the canonicalized optimized defining plan,
  *    computed BEFORE the table write and with any previous registration
  *    of the same table removed first — so a re-registration can never
  *    record a self-referential key (a scan of its own view);
  *  - entries are SESSION-KEYED: each [[Entry]] records the registering
  *    session (weakly), and the per-session rule instance substitutes
  *    only its own session's entries — a same-named table in another
  *    session (different warehouse, different catalog) can never be
  *    swapped in;
  *  - STALENESS: the entry records a fingerprint of the base tables'
  *    file-level snapshot (paths, sizes, mtimes) at registration; at
  *    substitution time the matched subtree's CURRENT snapshot is
  *    recomputed and any mismatch declines — a consumer over a base
  *    table that changed since `register` silently gets the correct
  *    from-scratch plan instead of stale data ([[refresh]] re-validates);
  *  - output attributes must resolve BY NAME to exactly one same-typed
  *    table column each (a partitioned materialization stores its
  *    partition column last, so position can't be trusted); the
  *    replacement re-aliases the scan onto the consumer's original
  *    exprIds so downstream references resolve unchanged.
  * The q204/q216 registry entries grade rewritten queries against
  * from-scratch DuckDB oracles, so a wrong substitution is a correctness
  * failure, not just a plan diff.
  *
  * Lifecycle: [[register]] materializes + records; [[refresh]] folds the
  * q213 dynamic-partition-overwrite path in as the view's incremental
  * maintenance member (only changed partitions are rewritten, then the
  * fingerprint is re-validated); [[attach]] re-enters a registration
  * persisted by a previous process from the `_mv_fingerprint` sidecar
  * written next to the table's files — the materialization survives the
  * JVM, and a new session adopts it without recompute iff the base
  * snapshot still matches. `clear()` resets the in-memory registry
  * (tests; Bench passes).
  *
  * Fixed-point safety: the replacement subtree is a table scan whose
  * canonical form cannot equal a registered defining plan (which always
  * computes something), so the rule is idempotent.
  */
class MatViewRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MatViewRule.isEmpty || MatViewRule.bypassed) return plan
    plan.transformUp {
      case p if !p.isInstanceOf[LeafNode] && p.resolved =>
        MatViewRule.lookup(p.canonicalized) match {
          case Some(e) if e.ownedBy(session) &&
              MatViewRule.baseFingerprint(p) == e.fingerprint =>
            // A rewrite must never turn an optimization into a failure:
            // if the table can't be read right now (dropped, mid-refresh
            // by a concurrent re-registration), DECLINE and let the
            // original plan run — always correct, just unrewritten.
            try {
              // the OPTIMIZED read: this rule fires after the main
              // optimizer batches, so a spliced subtree must arrive
              // already in post-optimization shape (SubqueryAlias
              // eliminated, relation converted) or the planner has no
              // strategy for it
              val rel = session.table(e.table).queryExecution.optimizedPlan
              // map BY NAME, not position: a partitioned materialization
              // stores its partition column last regardless of the
              // defining plan's order. Each consumer attribute must
              // resolve to exactly one same-typed table column; anything
              // else (missing, ambiguous, retyped) declines.
              val byName = rel.output.groupBy(_.name.toLowerCase(java.util.Locale.ROOT))
              val mapped = p.output.map { o =>
                byName.get(o.name.toLowerCase(java.util.Locale.ROOT)) match {
                  case Some(Seq(n)) if n.dataType == o.dataType =>
                    Some(Alias(n, o.name)(exprId = o.exprId))
                  case _ => None
                }
              }
              if (rel.output.length != p.output.length ||
                mapped.exists(_.isEmpty)) p
              else Project(mapped.flatten, rel)
            } catch { case scala.util.control.NonFatal(_) => p }
          case _ => p
        }
    }
  }
}

object MatViewRule {

  /** One registration: the view table, its registering session (weakly
    * held — an entry can never keep a discarded session alive), and the
    * base tables' file-snapshot fingerprint at registration time. */
  private case class Entry(table: String,
      session: java.lang.ref.WeakReference[SparkSession],
      fingerprint: String) {
    def ownedBy(s: SparkSession): Boolean = session.get() eq s
  }

  private val views = TrieMap.empty[LogicalPlan, Entry]

  /** While a registry key is being derived, the rule must not fire at
    * all: otherwise a defining plan that matches an EXISTING entry (its
    * own previous registration, or another table registered from the
    * same plan) is rewritten to a view scan before canonicalization, and
    * the recorded key would be that substituted plan — a self-referential
    * registry entry that can never match a real consumer. Thread-local:
    * concurrent sessions' optimizations are unaffected. */
  private val bypass = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
  private def bypassed: Boolean = bypass.get()
  private def keyPlanOf(defining: DataFrame): LogicalPlan = {
    bypass.set(true)
    try defining.queryExecution.optimizedPlan
    finally bypass.set(false)
  }

  private def weakRef(s: SparkSession) =
    new java.lang.ref.WeakReference[SparkSession](s)

  private def isEmpty: Boolean = views.isEmpty
  private def lookup(canonical: LogicalPlan): Option[Entry] =
    views.get(canonical)

  /** Materialize `defining`'s result as warehouse table `table`
    * (overwrite; partitioned by `partitionBy` if given) and register its
    * optimized canonical plan for substitution. The key and fingerprint
    * are computed BEFORE the write, with any previous registration of
    * `table` dropped first — re-registering can therefore never record a
    * key derived from a plan this rule already rewrote to the view. */
  def register(spark: SparkSession, defining: DataFrame, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    views.filterInPlace((_, e) => e.table != table)
    val optimized = keyPlanOf(defining)
    val key = optimized.canonicalized
    val fp = baseFingerprint(optimized)
    graft.queries.Warehouse.resetTable(spark, table)
    val w = defining.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(table)
    writeSidecar(spark, table, fp)
    views.put(key, Entry(table, weakRef(spark), fp))
  }

  /** Adopt a registration PERSISTED BY A PREVIOUS PROCESS without
    * re-materializing: if `table`'s sidecar fingerprint still equals the
    * CURRENT defining plan's base snapshot, re-enter it in this session's
    * registry and return true; on a stale or missing sidecar return false
    * (the caller must [[register]] — i.e. rebuild). The expensive part of
    * a materialized view (its data) thus survives the JVM; only the
    * plan-shaped key is re-derived from the defining query the
    * application owns in code anyway. */
  def attach(spark: SparkSession, defining: DataFrame, table: String): Boolean = {
    views.filterInPlace((_, e) => e.table != table)
    val optimized = keyPlanOf(defining)
    val fp = baseFingerprint(optimized)
    val ok = readSidecar(spark, table).contains(fp) &&
      spark.catalog.tableExists(table)
    if (ok) views.put(optimized.canonicalized,
      Entry(table, weakRef(spark), fp))
    ok
  }

  /** INCREMENTAL REFRESH — the q213 dynamic-partition-overwrite path
    * wired in as the view lifecycle's maintenance member. Recomputes the
    * defining query against the current base (the stale registration is
    * dropped first, so the recompute can never read the view it is
    * refreshing), diffs it against the stored table at row grain, and
    * rewrites ONLY the partitions whose content changed — every other
    * partition's files stay bit-untouched on disk. The registration is
    * then re-entered with the fresh base fingerprint, so consumers
    * substitute again. Returns the refreshed partition values (bounded:
    * one per changed partition). Partitions whose rows vanished entirely
    * from the fresh result are NOT dropped by dynamic overwrite — that
    * case (a full-delete upstream) needs a re-register, and is declined
    * here with an IllegalStateException rather than left silently stale. */
  def refresh(spark: SparkSession, defining: DataFrame, table: String,
      partCol: String): Seq[String] = {
    // dynamic overwrite of an UNPARTITIONED table truncates it wholesale
    // and would keep only the changed rows — refuse loudly; an
    // unpartitioned view refreshes by re-registering (full rebuild)
    val isPart = spark.catalog.listColumns(table).collect()
      .exists(c => c.isPartition && c.name == partCol)
    if (!isPart) throw new IllegalArgumentException(
      s"refresh($table): table is not partitioned by '$partCol' - " +
        "incremental refresh needs a partitioned materialization " +
        "(register with partitionBy); re-register to rebuild instead")
    views.filterInPlace((_, e) => e.table != table)
    val optimized = keyPlanOf(defining)
    val fp = baseFingerprint(optimized)
    val cur = spark.table(table)
    // reorder the fresh result to the table's column order (saveAsTable
    // moved the partition column last; insertInto matches by POSITION)
    val fresh = defining.select(cur.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    import org.apache.spark.sql.functions.col
    val changed = fresh.exceptAll(cur).select(col(partCol))
      .union(cur.exceptAll(fresh).select(col(partCol)))
      .distinct().collect().map(_.get(0).toString).toSeq.sorted
    if (changed.nonEmpty) {
      val gone = changed.filterNot(
        fresh.select(col(partCol)).distinct().collect()
          .map(_.get(0).toString).toSet)
      if (gone.nonEmpty) throw new IllegalStateException(
        s"refresh($table): partitions ${gone.mkString(",")} were deleted " +
          "upstream; dynamic overwrite cannot drop them - re-register")
      val key = "spark.sql.sources.partitionOverwriteMode"
      val saved = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try fresh.where(col(partCol).isInCollection(changed))
        .write.mode("overwrite").insertInto(table)
      finally saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    writeSidecar(spark, table, fp)
    views.put(optimized.canonicalized, Entry(table, weakRef(spark), fp))
    changed
  }

  /** Drop all registered views (the table data stays; only the rewrite
    * mapping is cleared). */
  def clear(): Unit = views.clear()

  /** Fingerprint of the plan's base-table file snapshot: every leaf file
    * relation's (path, size, mtime) triples, hashed. Computed at
    * registration from the defining plan and re-computed at substitution
    * time from the matched consumer subtree — a base table whose files
    * changed in between yields a different digest and the rewrite
    * declines. Listings come from the relations' already-memoized
    * FileIndex, so no filesystem round trip happens per optimizer run. */
  private[graft] def baseFingerprint(p: LogicalPlan): String = {
    val parts = p.collect {
      case r: LogicalRelation => r.relation match {
        case f: HadoopFsRelation =>
          f.location.listFiles(Nil, Nil).flatMap(_.files)
            .map(s => s"${s.getPath}:${s.getLen}:${s.getModificationTime}")
            .sorted.mkString("\n")
        case other => other.toString
      }
    }.mkString("\n---\n")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(parts.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** The persistence sidecar: `_mv_fingerprint` next to the table's data
    * files (the warehouse directory outlives the JVM where the in-memory
    * catalog does not). Underscore-prefixed, so scans ignore it. */
  private def sidecarPath(spark: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table,
      "_mv_fingerprint")

  private def writeSidecar(spark: SparkSession, table: String,
      fp: String): Unit = {
    val p = sidecarPath(spark, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
  }

  private def readSidecar(spark: SparkSession, table: String): Option[String] = {
    val p = sidecarPath(spark, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    }
  }
}
