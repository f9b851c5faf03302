package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: STATISTICS-DRIVEN JOIN REORDER — the cost-based
  * optimizer step built on the engine's own ANALYZE statistics (per-table
  * row counts + per-column NDVs, the q239/q282/q283 family persisted into
  * a planning registry). Where q291's planner picks the join order at
  * DataFrame-construction time, this rule fixes the order the user
  * actually WROTE: a left-deep chain of inner equi-joins whose dimensions
  * are authored in a bad order is rewritten most-selective-first, exactly
  * what Spark's own CBO (`spark.sql.cbo.enabled` + catalog ANALYZE) does
  * for catalog tables — re-derived here for plain `spark.read.parquet`
  * relations the catalog knows nothing about.
  *
  * Match shape: `Join(Join(Join(base, d1), d2), d3)` all Inner, all
  * hint-free, where each join condition references the BASE's columns
  * plus its own leg's columns (a STAR leg), or additionally the columns
  * of exactly ONE other leg (its PARENT — dim-of-dim, chains of any
  * depth). The legs therefore form a dependency FOREST rooted at the
  * base; any topological order of the forest is a valid left-deep plan.
  *
  * Cost model + search: SELINGER. Per-leg estimated post-filter rows =
  * rows(leaf) × Π 1/ndv(col) over the leg's `col = literal` conjuncts
  * with a registered NDV (unknown columns contribute selectivity 1; a
  * leg whose LEAF has no registered statistics declines the whole
  * reorder — a half-informed permutation could be worse than the
  * author's). The chosen order minimizes the System-R prefix cost —
  * Σ over plan prefixes of Π member estimates (intermediate
  * cardinalities under FK→PK independence) — by exact dynamic
  * programming over leg subsets (bounded: ≤ 8 legs, 256 states),
  * subject to the forest's precedence. Exact integer arithmetic
  * (rows·10⁶ ÷ Πndv in BigInt); ties break on the lexicographically
  * smallest (estimate, leaf name, authored position) sequence — the
  * decision is deterministic and an SQL oracle can recompute it (q294
  * grades the star decision, q312 the snowflake, q327 the two-branch
  * forest the pre-DP rule declined).
  *
  * Guards, each declining (never failing): non-Inner or hinted joins
  * (explicit hints outrank statistics); a condition spanning two legs
  * without a unique parent; unregistered leaves; chains beyond the DP
  * bound; an already optimal chain (fixed-point safety: the rebuilt
  * chain re-matches, the DP re-derives the same order, and the rule
  * declines — convergence by construction). The rebuilt tree is wrapped
  * in a `Project` restoring the original column order, since permuting
  * legs permutes `Join.output`.
  *
  * Registrations are SESSION-KEYED (the SkippingIndexRule discipline).
  * At 100 TB: ANALYZE is one aggregate per table, amortized across every
  * query that joins it; the reorder decision is O(legs·log legs) driver
  * arithmetic at plan time. `RulesSpec` pins the reorder, the decline
  * paths, and result equality; q294 hash-grades the decision cross-engine.
  */
class JoinReorderRule(session: SparkSession) extends Rule[LogicalPlan] {

  import JoinReorderRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transformDown {
      case j @ InnerChain(base, legs) if legs.length >= 2 =>
        reorder(j, base, legs).getOrElse(j)
    }
  }

  private def reorder(j: LogicalPlan, base: LogicalPlan,
      legs: Seq[(LogicalPlan, Expression)]): Option[LogicalPlan] = {
    // classify each leg by its join-graph attachment: STAR (condition
    // binds base + own leg only) or DEPENDENT on exactly one earlier leg
    // (dim-of-dim, chains of any depth — the dependency FOREST); a
    // condition spanning two legs without a unique parent declines
    val baseOut = base.outputSet
    val parentOf: Seq[Option[Int]] = legs.zipWithIndex.map {
      case ((leg, cond), i) =>
        if (cond.references.subsetOf(baseOut ++ leg.outputSet)) Some(-1)
        else {
          val parents = legs.indices.filter { k =>
            k != i && cond.references.subsetOf(
              baseOut ++ leg.outputSet ++ legs(k)._1.outputSet)
          }
          // in a resolved left-deep chain a condition can only bind legs
          // BELOW it, so a unique parent is always an earlier leg
          if (parents.length == 1 && parents.head < i) Some(parents.head)
          else None
        }
    }
    if (parentOf.exists(_.isEmpty)) return None
    val deps = parentOf.flatten
    val estimated = legs.zipWithIndex.map { case ((leg, cond), i) =>
      estimate(leg).map { case (rows, name, bytes) =>
        (leg, cond, rows, name, i, bytes)
      }
    }
    if (estimated.exists(_.isEmpty)) return None
    val est = estimated.flatten
    // SELINGER over the left-deep order: minimize Σ over prefixes of
    // Π leg estimates (System-R's intermediate-cardinality cost under
    // FK→PK independence), subject to the forest's precedence (a
    // dependent leg joins only after its parent). Exact DP over subsets —
    // 2^n states; chains beyond the bound keep the authored order (the
    // hint pass below still applies). Ties break on the lexicographically
    // smallest (est, leaf name, authored index) sequence, so the decision
    // is deterministic and an SQL oracle can recompute it (q294 grades
    // the star case, q312 the snowflake, q327 the two-branch forest).
    val n = legs.length
    if (n > 8) return None
    type Key = Vector[(BigInt, String, Int)]
    def keyOf(order: List[Int]): Key =
      order.reverse.map(i => (est(i)._3, est(i)._4, i)).toVector
    implicit val keyOrd: Ordering[Key] =
      Ordering.Implicits.seqOrdering[Vector, (BigInt, String, Int)](
        Ordering.Tuple3(Ordering.BigInt, Ordering.String, Ordering.Int))
    // per mask: (cost, prefix product, order REVERSED)
    val best = new Array[(BigInt, BigInt, List[Int])](1 << n)
    best(0) = (BigInt(0), BigInt(1), Nil)
    for (mask <- 0 until (1 << n); if best(mask) != null;
         i <- 0 until n; if (mask & (1 << i)) == 0;
         if deps(i) < 0 || (mask & (1 << deps(i))) != 0) {
      val (cost, prod, order) = best(mask)
      val nprod = prod * est(i)._3
      val cand = (cost + nprod, nprod, i :: order)
      val m2 = mask | (1 << i)
      if (best(m2) == null || cand._1 < best(m2)._1 ||
        (cand._1 == best(m2)._1 &&
          keyOrd.lt(keyOf(cand._3), keyOf(best(m2)._3)))) best(m2) = cand
    }
    val flatIdx = best((1 << n) - 1)._3.reverse
    val flat = flatIdx.map(i => (est(i)._1, est(i)._2, est(i)._6))
    // ANALYZE-informed broadcast: a leg whose ESTIMATED post-filter bytes
    // fit the budget gets a BROADCAST join hint — the decision Spark's
    // size-only threshold cannot make when the RAW file is large but a
    // registered-NDV filter cuts it far below the wire cost of a shuffle.
    // A hint is semantics-free (strategy only), so this is always sound;
    // explicit user hints still outrank us (hinted chains never match).
    val budget = BigInt(session.conf
      .getOption("graft.cbo.broadcastBudget").map(_.toLong)
      .getOrElse(10L << 20))
    val anyHint = flat.exists(_._3 <= budget)
    if (flatIdx == legs.indices && !anyHint) return None // already optimal
    val rebuilt = flat.foldLeft(base) { case (acc, (leg, cond, bytes)) =>
      val hint =
        if (bytes <= budget) JoinHint(None, Some(HintInfo(Some(BROADCAST))))
        else JoinHint.NONE
      Join(acc, leg, Inner, Some(cond), hint)
    }
    Some(Project(j.output, rebuilt))
  }

  /** (estimated post-filter rows ×10⁶, leaf file name, estimated
    * post-filter BYTES) for a leg that is Project/Filter nodes over
    * exactly one REGISTERED file relation. Bytes = the relation's file
    * size scaled by the same 1/Πndv selectivity — what the broadcast
    * decision needs. */
  private def estimate(leg: LogicalPlan): Option[(BigInt, String, BigInt)] = {
    val leaves = leg.collect { case r: LogicalRelation => r }
    if (leaves.length != 1) return None
    val fsRel = leaves.head.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    val roots = fsRel.location.rootPaths
    if (roots.length != 1) return None
    val path = roots.head.toString
    val st = registry.get(keyOf(session, path))
      .filter(_.ownedBy(session)).getOrElse(return None)
    val legConjuncts = leg.collect { case Filter(cond, _) => cond }
      .flatMap(conjuncts)
    val eqCols = legConjuncts.collect {
      case EqualTo(a: Attribute, _: Literal) => a.name
      case EqualTo(_: Literal, a: Attribute) => a.name
    }
    val divisor = eqCols.flatMap(st.ndv.get).map(BigInt(_))
      .foldLeft(BigInt(1))(_ * _).max(1)
    // range conjuncts on HISTOGRAMMED columns: per column, the conjuncts
    // tighten an interval (gt, le] in cents; its selectivity is the q283
    // estimator estAbove(gt) − estAbove(le) over the column's equi-depth
    // bins — exact integer arithmetic, so the SQL oracle can recompute
    // the decision. Unhistogrammed ranges contribute 1 as before.
    def centsOf(v: Any): Option[Long] = try v match {
      case d: java.lang.Double =>
        Some((BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact)
      case f: java.lang.Float => centsOf(f.doubleValue())
      case n: java.lang.Number => Some(math.multiplyExact(n.longValue(), 100L))
      case dec: org.apache.spark.sql.types.Decimal =>
        Some((dec.toBigDecimal.setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact)
      case _ => None
    } catch { case _: ArithmeticException => None }
    val ranges = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def tighten(c: String, gt: Option[Long], le: Option[Long]): Unit =
      if (st.hist.contains(c)) {
        val (g0, l0) = ranges.getOrElse(c, (Long.MinValue, Long.MaxValue))
        ranges(c) = (gt.map(math.max(g0, _)).getOrElse(g0),
          le.map(math.min(l0, _)).getOrElse(l0))
      }
    legConjuncts.foreach {
      case org.apache.spark.sql.catalyst.expressions.GreaterThan(
          a: Attribute, Literal(v, _)) =>
        tighten(a.name, centsOf(v), None)
      case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          a: Attribute, Literal(v, _)) =>
        tighten(a.name, centsOf(v).map(_ - 1), None)
      case org.apache.spark.sql.catalyst.expressions.LessThan(
          a: Attribute, Literal(v, _)) =>
        tighten(a.name, None, centsOf(v).map(_ - 1))
      case org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          a: Attribute, Literal(v, _)) =>
        tighten(a.name, None, centsOf(v))
      case org.apache.spark.sql.catalyst.expressions.GreaterThan(
          Literal(v, _), a: Attribute) => // v > a ≡ a < v
        tighten(a.name, None, centsOf(v).map(_ - 1))
      case org.apache.spark.sql.catalyst.expressions.LessThan(
          Literal(v, _), a: Attribute) => // v < a ≡ a > v
        tighten(a.name, centsOf(v), None)
      case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          Literal(v, _), a: Attribute) => // v >= a ≡ a <= v
        tighten(a.name, None, centsOf(v))
      case org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          Literal(v, _), a: Attribute) => // v <= a ≡ a >= v
        tighten(a.name, centsOf(v).map(_ - 1), None)
      case _ => ()
    }
    val (selNum, selDen) = ranges.foldLeft((BigInt(1), BigInt(1))) {
      case ((nu, de), (c, (gt, le))) =>
        val bins = st.hist(c)
        val total = bins.map(b => BigInt(b.n)).sum.max(1)
        val sel = (estAbove(bins, gt) -
          (if (le == Long.MaxValue) BigInt(0) else estAbove(bins, le)))
          .max(0)
        (nu * sel, de * total)
    }
    val est = (BigInt(st.rows) * 1000000 * selNum) / (divisor * selDen)
    val estBytes = (BigInt(fsRel.sizeInBytes) * selNum) / (divisor * selDen)
    Some((est, roots.head.getName, estBytes))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }
}

object JoinReorderRule {

  /** Peels a left-deep chain of hint-free inner equi-joins into
    * (base, legs-in-authored-order). Attribute-only Projects BETWEEN the
    * joins (ColumnPruning's inserts) are looked through: they only narrow
    * columns, never rows, so dropping them is safe — the rebuilt chain's
    * wider intermediate outputs are re-pruned by the next ColumnPruning
    * pass, and the rule's top-level Project restores the original output. */
  private object InnerChain {
    def unapply(plan: LogicalPlan): Option[(LogicalPlan, Seq[(LogicalPlan, Expression)])] =
      plan match {
        case j: Join =>
          def peel(p: LogicalPlan,
              acc: List[(LogicalPlan, Expression)]): (LogicalPlan, List[(LogicalPlan, Expression)]) =
            p match {
              case Join(l, r, Inner, Some(c), hint) if hint == JoinHint.NONE =>
                peel(l, (r, c) :: acc)
              case Project(es, child)
                  if acc.nonEmpty && es.forall(_.isInstanceOf[Attribute]) =>
                peel(child, acc)
              case other => (other, acc)
            }
          val (base, legs) = peel(j, Nil)
          if (legs.length >= 2) Some((base, legs)) else None
        case _ => None
      }
  }

  /** One equi-depth histogram bin over a column's CENT values (the q239
    * exact construction): [lo, hi] bounds and the bin's row count. */
  final case class Bin(lo: Long, hi: Long, n: Long)

  /** `fp` is the table's file fingerprint captured AT ANALYZE TIME — the
    * moment the (rows, ndv, histogram) numbers were true. [[save]]
    * persists this stored fingerprint (never a recomputed one): if the
    * data changes between analyze() and save(), the sidecar carries the
    * OLD fingerprint, so a later attach() sees a mismatch and declines —
    * statistics the data has outgrown are never re-entered. */
  private final case class Stats(rows: Long, ndv: Map[String, Long],
      hist: Map[String, Seq[Bin]],
      fp: (Long, Long, Long),
      owner: java.lang.ref.WeakReference[SparkSession]) {
    def ownedBy(s: SparkSession): Boolean = owner.get() eq s
  }

  /** The q283 range estimator over a column's histogram: estimated rows
    * with value (in cents) STRICTLY ABOVE `thr` — full bins above count
    * whole, bins below zero, the straddling bin interpolates by exact
    * integer division (floor; both engines truncate identically), so the
    * estimate is deterministic and an SQL oracle recomputes it
    * bit-for-bit. */
  private[graft] def estAbove(bins: Seq[Bin], thr: Long): BigInt =
    bins.iterator.map { b =>
      if (b.lo > thr) BigInt(b.n)
      else if (b.hi <= thr) BigInt(0)
      else (BigInt(b.n) * (b.hi - thr)) / (b.hi - b.lo)
    }.sum

  private val registry = TrieMap.empty[String, Stats]

  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def keyOf(spark: SparkSession, qualifiedPath: String): String =
    sessionIds.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID().toString) + "|" + qualifiedPath

  private def qualified(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  /** ANALYZE: one aggregate over the table at `dir` — row count + exact
    * NDV per named column — registered for this session's planner. At
    * warehouse scale the exact count-distinct drops in for q47's HLL
    * sketch; the registry shape doesn't change.
    *
    * `histCols` additionally builds a 10-bin EQUI-DEPTH histogram per
    * named numeric column (values scaled to exact cents, the q239
    * construction through [[graft.operators.DistributedRank]] — no
    * single-partition window, deterministic (lo, hi, n) regardless of
    * tie placement since the sorted value SEQUENCE is unique). Range
    * predicates on histogrammed columns then get real selectivities in
    * [[estimate]] instead of contributing 1 — the q283 estimator
    * consulted by the planner itself. */
  def analyze(spark: SparkSession, dir: String, cols: Seq[String],
      histCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max, min}
    // fingerprint FIRST: if a write lands mid-aggregate the mismatch is
    // conservative (stats of the new data, fingerprint of the old — a
    // later attach declines; never the reverse)
    val fp = fingerprint(spark, dir)
    val df = spark.read.parquet(dir)
    val aggs = count(lit(1)).as("_rows") +:
      cols.map(c => countDistinct(col(c)).as(s"_ndv_$c"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val ndv = cols.zipWithIndex.map { case (c, i) => c -> r.getLong(i + 1) }
    val hist = histCols.map { c =>
      val cents = df.where(col(c).isNotNull).select(
        (col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("__cents"))
      val n = cents.count()
      val bins = graft.operators.DistributedRank
        .withGlobalRank(cents, Seq(col("__cents")), "__rk")
        .groupBy(graft.operators.DistributedRank
          .ntileOfRank(col("__rk"), n, 10).as("__bin"))
        .agg(min(col("__cents")).as("lo"), max(col("__cents")).as("hi"),
          count(lit(1)).as("n"))
        .orderBy(col("__bin"))
        .collect().map(row => Bin(row.getLong(1), row.getLong(2),
          row.getLong(3))).toSeq
      c -> bins
    }.toMap
    registry.put(keyOf(spark, qualified(spark, dir)),
      Stats(r.getLong(0), ndv.toMap, hist, fp,
        new java.lang.ref.WeakReference(spark)))
  }

  def drop(spark: SparkSession, dir: String): Unit =
    registry.remove(keyOf(spark, qualified(spark, dir)))
  def clear(): Unit = registry.clear()

  // ---- persistence: ANALYZE once, reuse across processes -------------------
  //
  // The SkippingIndexRule sidecar lifecycle applied to planner statistics:
  // `save` writes this session's (rows, ndv) for a table into an
  // underscore-prefixed sidecar beside the data (ignored by scans), with a
  // fingerprint of the table's data files at ANALYZE time; `attach`
  // re-enters them in a new process WITHOUT re-scanning — and DECLINES if
  // any data file changed since (stale statistics reorder on lies; a
  // declined attach merely keeps the authored join order, never wrongness
  // — but the contract is the same as the index rule's: never consult
  // statistics the data has outgrown).

  private def sidecar(dir: String) =
    new org.apache.hadoop.fs.Path(dir + "_graft_stats")

  /** (file count, total bytes, max mtime) over the table's data files —
    * the staleness fingerprint. */
  private def fingerprint(spark: SparkSession, dir: String): (Long, Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L; var bytes = 0L; var mt = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        n += 1; bytes += f.getLen; mt = math.max(mt, f.getModificationTime)
      }
    }
    (n, bytes, mt)
  }

  /** Persist this session's registration for `dir`. Returns true if one
    * existed to save. Histograms ride the same sidecar as per-column
    * (lo, hi, n) arrays. */
  def save(spark: SparkSession, dir: String): Boolean = {
    val st = registry.get(keyOf(spark, qualified(spark, dir)))
      .filter(_.ownedBy(spark)).getOrElse(return false)
    import spark.implicits._
    val (fn, fb, fm) = st.fp // the ANALYZE-time fingerprint, never fresher
    val names = (st.ndv.keySet ++ st.hist.keySet).toSeq.sorted
    val rows = names.map { c =>
      val h = st.hist.get(c)
      (st.rows, c, st.ndv.getOrElse(c, -1L), fn, fb, fm,
        h.map(_.map(_.lo)), h.map(_.map(_.hi)), h.map(_.map(_.n)))
    } match {
      case Nil => // stat-less table: row count only
        Seq((st.rows, "", -1L, fn, fb, fm,
          None: Option[Seq[Long]], None: Option[Seq[Long]],
          None: Option[Seq[Long]]))
      case s => s
    }
    rows.toDF("rows", "col", "ndv", "f_n", "f_bytes", "f_mtime",
        "h_lo", "h_hi", "h_n")
      .coalesce(1).write.mode("overwrite")
      .parquet(sidecar(dir).toString)
    true
  }

  /** Re-enter persisted statistics for `dir` into THIS session's registry;
    * declines (returns false) when no sidecar exists or the table's data
    * files changed since ANALYZE. Pre-histogram sidecars attach with
    * empty histograms. */
  def attach(spark: SparkSession, dir: String): Boolean = {
    val sc = sidecar(dir)
    val fs = sc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sc)) return false
    val df = spark.read.parquet(sc.toString)
    val hasHist = df.columns.contains("h_lo")
    val rows = df.collect()
    if (rows.isEmpty) return false
    val saved = (rows.head.getLong(3), rows.head.getLong(4), rows.head.getLong(5))
    if (saved != fingerprint(spark, dir)) return false // data moved on
    val ndv = rows.filter(_.getLong(2) >= 0)
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val hist =
      if (!hasHist) Map.empty[String, Seq[Bin]]
      else rows.filter(r => !r.isNullAt(6)).map { r =>
        val lo = r.getSeq[Long](6); val hi = r.getSeq[Long](7)
        val n = r.getSeq[Long](8)
        r.getString(1) -> lo.indices.map(i => Bin(lo(i), hi(i), n(i)))
      }.toMap
    registry.put(keyOf(spark, qualified(spark, dir)),
      Stats(rows.head.getLong(0), ndv, hist, saved,
        new java.lang.ref.WeakReference(spark)))
    true
  }
}
