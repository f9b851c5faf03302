package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BoundReference, Cast, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: TRANSPARENT MATERIALIZED-VIEW SUBSTITUTION — exact
  * match plus aggregate ROLL-UP. A registered view pairs a defining query
  * with a warehouse table holding its result; any later query whose plan
  * CONTAINS the defining subplan (canonicalized — attribute ids and
  * cosmetic aliasing ignored) has that subtree swapped for a scan of the
  * table. The consumer keeps its author-facing shape — `explode(split
  * (text))` + groupBy in the source — and the optimizer silently reads
  * the precomputed aggregate: the corpus scan, the explode, and the
  * aggregation exchange all vanish from the physical plan.
  *
  * Exact-match is the honest first tier of view rewriting (commercial
  * engines and Calcite start exactly here): it covers the dominant
  * production case — a standard derived table consumed verbatim. The
  * second tier (the roll-up machinery below, q313) answers a COARSER
  * GROUP BY from a finer registered aggregate when the consumer's keys
  * are a subset of the view's and every aggregate is re-aggregable
  * (SUM→SUM, COUNT→SUM of counts, MIN/MAX→MIN/MAX) — the week-from-day
  * matview win.
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
          case _ => p match {
            // no exact match: a coarser GROUP BY over a registered view's
            // base may still ROLL UP from the finer materialization
            case a: Aggregate => MatViewRule.tryRollup(session, a)
            case other => other
          }
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

  // ---- aggregate ROLL-UP tier ----------------------------------------------
  //
  // The second tier of view rewriting (Calcite's aggregate unification,
  // the most common matview win in practice): a registered view whose
  // defining plan is Aggregate(G, A, child) can answer any later
  // Aggregate(G', A', child') when the children share one CORE (equal
  // after peeling attribute-only Projects — column pruning narrows the
  // consumer's projection to the columns it touches, which must not break
  // the match), every G' member is the view key itself OR an expression
  // over view keys only (week-from-day: `date_trunc('week', day)` groups
  // the day-grain view), and every A' member is RE-AGGREGABLE from a
  // stored column — SUM(x) → SUM(sum_x), COUNT(*)/COUNT(x) → SUM(cnt),
  // MIN → MIN, MAX → MAX (the q222 counting algebra's re-aggregation
  // conditions), AVG(x) → SUM(sum_x)/SUM(cnt_x) when the view stores
  // both partials, and COUNT(DISTINCT k) → COUNT(DISTINCT view_k) when k
  // is (an expression over) view keys — both EXACT, see buildRollup
  // (FILTER forms and other shapes decline). Expressions are
  // compared across the two plans by rebinding their attributes to
  // ORDINALS of the (canonically equal) core, so exprId drift between
  // the defining and consuming query can't break the match. All
  // exact-tier guards apply unchanged: session ownership, the
  // base-snapshot fingerprint (recomputed from the CONSUMER's child at
  // substitution time), name+type resolution against the table, and
  // decline-never-fail.

  /** One roll-up registration: groups maps an ordinal-normalized grouping
    * expression to its view column; aggs maps (kind, normalized child) to
    * the view column holding that partial. */
  private case class RollupEntry(table: String,
      session: java.lang.ref.WeakReference[SparkSession],
      fingerprint: String,
      groups: Map[Expression, String],
      aggs: Map[(String, Option[Expression]), String]) {
    def ownedBy(s: SparkSession): Boolean = session.get() eq s
  }

  private val rollups = TrieMap.empty[LogicalPlan, List[RollupEntry]]

  /** Peel Projects down to the core plan both sides share, accumulating
    * an attribute→expression substitution for computed aliases: column
    * pruning inserts attribute-only Projects, and
    * PullOutGroupingExpressions rewrites a complex grouping key into a
    * `_groupingexpression` alias computed in a Project below the
    * Aggregate — both must be looked through (inlined) or no consumer
    * with a computed key could ever match. */
  private def coreAndSubst(p: LogicalPlan)
      : (LogicalPlan, Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression]) =
    p match {
      case Project(es, child)
          if es.forall(e => e.isInstanceOf[Attribute] || e.isInstanceOf[Alias]) =>
        val (c, subst) = coreAndSubst(child)
        val here = es.collect {
          case a: Alias => a.exprId -> a.child.transform {
            case at: Attribute if subst.contains(at.exprId) => subst(at.exprId)
          }
        }.toMap
        (c, subst ++ here)
      case other => (other, Map.empty)
    }

  /** Inline `subst`, rebind the result's attributes to ordinals of
    * `core`'s output, and canonicalize — the cross-plan comparison form
    * (two canonically equal cores expose positionally identical
    * outputs). */
  private def normalized(e: Expression, core: LogicalPlan,
      subst: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression])
      : Expression = {
    val pos = core.output.zipWithIndex
      .map { case (a, i) => a.exprId -> i }.toMap
    e.transform {
      case a: Attribute if subst.contains(a.exprId) => subst(a.exprId)
    }.transform {
      case a: Attribute if pos.contains(a.exprId) =>
        BoundReference(pos(a.exprId), a.dataType, a.nullable)
    }.canonicalized
  }

  /** Decompose an optimized defining plan into roll-up registration info:
    * (child canonical, group map, agg map) — None when the plan is not a
    * re-aggregable Aggregate. */
  private def rollupInfoOf(optimized: LogicalPlan)
      : Option[(LogicalPlan, Map[Expression, String],
        Map[(String, Option[Expression]), String])] = optimized match {
    case Aggregate(gs, as_, child0, _) =>
      val (child, subst) = coreAndSubst(child0)
      def norm(e: Expression) = normalized(e, child, subst)
      val gset = gs.map(norm).toSet
      val groups = Map.newBuilder[Expression, String]
      val aggs = Map.newBuilder[(String, Option[Expression]), String]
      val ok = as_.forall {
        case Alias(AggregateExpression(f, _, false, None, _), name) =>
          f match {
            case Sum(e, _) => aggs += (("sum", Some(norm(e))) -> name); true
            case Min(e) => aggs += (("min", Some(norm(e))) -> name); true
            case Max(e) => aggs += (("max", Some(norm(e))) -> name); true
            case c: Count => c.children match {
              case Seq(Literal(_, _)) => aggs += (("count", None) -> name); true
              case Seq(e) => aggs += (("count", Some(norm(e))) -> name); true
              case _ => false
            }
            // a STORED THETA SKETCH of a non-key column: the roll-up
            // answer to COUNT(DISTINCT x) under the approx opt-in —
            // sketches are a commutative monoid under union, so any
            // coarser group re-aggregates by theta_union_agg
            case ts: org.apache.spark.sql.catalyst.expressions.aggregate.ThetaSketchAgg =>
              aggs += (("theta", Some(norm(ts.left))) -> name); true
            case _ => false
          }
        case a: Attribute if gset.contains(norm(a)) =>
          groups += (norm(a) -> a.name); true
        case Alias(e, name) if gset.contains(norm(e)) =>
          groups += (norm(e) -> name); true
        case _ => false
      }
      val (g, a) = (groups.result(), aggs.result())
      if (ok && a.nonEmpty) Some((child.canonicalized, g, a)) else None
    case _ => None
  }

  private def registerRollup(spark: SparkSession, optimized: LogicalPlan,
      table: String, fp: String): Unit = {
    rollups.mapValuesInPlace((_, es) => es.filterNot(_.table == table))
    rollups.filterInPlace((_, es) => es.nonEmpty)
    rollupInfoOf(optimized).foreach { case (ck, gs, as_) =>
      rollups.updateWith(ck)(old => Some(old.getOrElse(Nil) :+
        RollupEntry(table, weakRef(spark), fp, gs, as_)))
    }
  }

  /** Rewrite consumer Aggregate `p` onto a finer registered view, or
    * return it unchanged. Every guard declines, never fails. */
  private def tryRollup(session: SparkSession, p: Aggregate): LogicalPlan = {
    if (rollups.isEmpty) return p
    val (c, subst) = coreAndSubst(p.child)
    val candidates = rollups.getOrElse(c.canonicalized, Nil)
      .filter(_.ownedBy(session))
    if (candidates.isEmpty) return p
    // the consumer's CURRENT base snapshot must match the registration's
    lazy val fp = baseFingerprint(p.child)
    candidates.iterator.filter(_.fingerprint == fp)
      .map(e => buildRollup(session, p, c, subst, e))
      .collectFirst { case Some(rw) => rw }
      .getOrElse(p)
  }

  private def buildRollup(session: SparkSession, p: Aggregate,
      c: LogicalPlan,
      subst: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression],
      e: RollupEntry): Option[LogicalPlan] = try {
    val rel = session.table(e.table).queryExecution.optimizedPlan
    val byName = rel.output.groupBy(_.name.toLowerCase(java.util.Locale.ROOT))
    def relAttr(n: String): Option[Attribute] =
      byName.get(n.toLowerCase(java.util.Locale.ROOT)) match {
        case Some(Seq(a)) => Some(a)
        case _ => None
      }
    /** The exact tier's 'missing, ambiguous, retyped' guard applied to
      * roll-up GROUPING substitutions: a view column resolved by name must
      * also carry the consumer expression's exact type, or the
      * Alias(..., exprId = consumer's) would silently retype every
      * downstream reference bound to that id (aggregates are already
      * covered by the Cast to the consumer's dataType below; grouping
      * keys have no such cast, so the type must match outright). */
    def typedGroupExprOf(ex0: Expression): Option[Expression] =
      groupExprOf(ex0).filter(_.dataType == ex0.dataType)
    def norm(x: Expression) = normalized(x, c, subst)
    /** A consumer grouping expression, rewritten over the view: the view
      * key itself, or any expression whose base attributes are ALL view
      * keys (week-from-day) — substituted attr-by-attr after inlining
      * the consumer's own computed-alias substitution. */
    def groupExprOf(ex0: Expression): Option[Expression] = {
      val ex = ex0.transform {
        case a: Attribute if subst.contains(a.exprId) => subst(a.exprId)
      }
      e.groups.get(norm(ex)).flatMap(relAttr).orElse {
        var ok = true
        val rewritten = ex.transform {
          case a: Attribute =>
            e.groups.get(norm(a)).flatMap(relAttr) match {
              case Some(at) => at
              case None => ok = false; a
            }
        }
        if (ok && rewritten.references.subsetOf(rel.outputSet)) Some(rewritten)
        else None
      }
    }
    val gMapped = p.groupingExpressions.map(typedGroupExprOf)
    if (gMapped.exists(_.isEmpty)) return None
    val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
    def reAgg(f: AggregateFunction): Option[(String, Expression => AggregateFunction)] =
      f match {
        case Sum(x, _) =>
          e.aggs.get(("sum", Some(norm(x))))
            .map(n => (n, (col: Expression) => Sum(col)))
        case Min(x) =>
          e.aggs.get(("min", Some(norm(x))))
            .map(n => (n, (col: Expression) => Min(col)))
        case Max(x) =>
          e.aggs.get(("max", Some(norm(x))))
            .map(n => (n, (col: Expression) => Max(col)))
        case cnt: Count => (cnt.children match {
          case Seq(Literal(_, _)) => e.aggs.get(("count", None))
          case Seq(x) => e.aggs.get(("count", Some(norm(x))))
          case _ => None
        }).map(n => (n, (col: Expression) => Sum(col))) // counts ADD
        case _ => None
      }
    /** AVG rolls up as Σsum_x / Σcount_x — EXACT for integral inputs
      * (integer-valued double sums are associative below 2^53) and
      * within IEEE re-association for float/double, the same partial
      * decomposition Spark's own two-phase Average performs. DECIMAL
      * declines: its division scale semantics differ between the direct
      * and decomposed forms. The divisor must be count(x) (AVG ignores
      * NULLs); count(*) substitutes only when x is provably non-null. */
    def avgOf(al: Alias, x: Expression): Option[NamedExpression] = {
      val ok = x.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType => true
        case _ => false
      }
      if (!ok) return None
      for {
        sumN <- e.aggs.get(("sum", Some(norm(x))))
        cntN <- e.aggs.get(("count", Some(norm(x)))).orElse(
          if (!x.nullable) e.aggs.get(("count", None)) else None)
        sumAttr <- relAttr(sumN)
        cntAttr <- relAttr(cntN)
      } yield {
        val s = Sum(sumAttr).toAggregateExpression()
        val c = Sum(cntAttr).toAggregateExpression()
        val div = Divide(Cast(s, DoubleType, tz), Cast(c, DoubleType, tz))
        val v = if (al.dataType == DoubleType) div else Cast(div, al.dataType, tz)
        Alias(v, al.name)(exprId = al.exprId)
      }
    }
    val newList: Seq[Option[NamedExpression]] = p.aggregateExpressions.map {
      case a: Attribute => typedGroupExprOf(a).map {
        case at: Attribute => Alias(at, a.name)(exprId = a.exprId)
        case ex => Alias(ex, a.name)(exprId = a.exprId)
      }
      case al @ Alias(AggregateExpression(Average(x, _), _, false, None, _), _) =>
        avgOf(al, x)
      // COUNT(DISTINCT x) where x is (an expression over) view KEYS is
      // EXACT from the view: its rows hold every distinct key combination
      // of the base, so distinct-x over the view equals distinct-x over
      // the base — re-counted per coarser group (no sketch, no bound).
      // When x is NOT a key but the view STORES a theta sketch of it
      // (theta_sketch_agg in the defining aggregate), the roll-up is the
      // sketch union — an APPROXIMATION, so it fires only under the
      // explicit session opt-in `spark.graft.matview.approxDistinctRollup`
      // with the documented bound: exact below the sketch's nominal k
      // (default lg_k=12 → 4096 distincts), ~1/√k relative standard error
      // above it (±5% covers 3σ at the default k). Off by default: the
      // transparent tier never silently approximates.
      case al @ Alias(AggregateExpression(c: Count, _, true, None, _), name)
          if c.children.length == 1 =>
        typedGroupExprOf(c.children.head).map { g =>
          Alias(Count(g).toAggregateExpression(isDistinct = true),
            name)(exprId = al.exprId): NamedExpression
        }.orElse {
          if (session.conf.get(
              "spark.graft.matview.approxDistinctRollup", "false") != "true")
            None
          else for {
            skN <- e.aggs.get(("theta", Some(norm(c.children.head))))
            skAttr <- relAttr(skN)
          } yield {
            val union = new org.apache.spark.sql.catalyst.expressions
              .aggregate.ThetaUnionAgg(skAttr).toAggregateExpression()
            val est: Expression = org.apache.spark.sql.catalyst.expressions
              .ThetaSketchEstimate(union)
            val v = if (est.dataType == al.dataType) est
              else Cast(est, al.dataType, tz)
            Alias(v, name)(exprId = al.exprId): NamedExpression
          }
        }
      case al @ Alias(AggregateExpression(f, _, false, None, _), name) =>
        reAgg(f).flatMap { case (vn, mk) =>
          relAttr(vn).map { at =>
            val agg: Expression = mk(at).toAggregateExpression()
            val v = if (agg.dataType == al.dataType) agg
              else Cast(agg, al.dataType, tz) // e.g. decimal sum-of-sums
            Alias(v, name)(exprId = al.exprId)
          }
        }
      case al @ Alias(ex, name) =>
        typedGroupExprOf(ex).map(g => Alias(g, name)(exprId = al.exprId))
      case _ => None
    }
    if (newList.exists(_.isEmpty)) None
    else Some(Aggregate(gMapped.flatten, newList.flatten, rel))
  } catch { case scala.util.control.NonFatal(_) => None }

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
    registerRollup(spark, optimized, table, fp)
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
    if (ok) {
      views.put(optimized.canonicalized, Entry(table, weakRef(spark), fp))
      registerRollup(spark, optimized, table, fp)
    }
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
    registerRollup(spark, optimized, table, fp)
    changed
  }

  /** Drop one table's registrations, exact + rollup tiers (the table data
    * stays; only the rewrite mapping is cleared) — for self-contained
    * registry entries that must not leak rewrites into later queries. */
  def drop(table: String): Unit = {
    views.filterInPlace((_, e) => e.table != table)
    rollups.mapValuesInPlace((_, es) => es.filterNot(_.table == table))
    rollups.filterInPlace((_, es) => es.nonEmpty)
  }

  /** Drop all registered views (the table data stays; only the rewrite
    * mapping is cleared). */
  def clear(): Unit = { views.clear(); rollups.clear() }

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
