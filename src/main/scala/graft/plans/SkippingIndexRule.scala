package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, explode, expr, input_file_name, lit, max, min, pmod, struct, xxhash64}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Optimizer rule: TRANSPARENT DATA-SKIPPING INDEXES — the table-format
  * metadata layer (file statistics + bloom filters, what Delta/Iceberg
  * persist per data file) expressed as a `Rule[LogicalPlan]`. A layout
  * directory registers one or more per-file indexes:
  *
  *  - ZONE MAP (q224's statistic): [min, max] of a column per file —
  *    prunes RANGE and point predicates on the clustered column;
  *  - BLOOM FILTER (q225's statistic): a k-hash/m-bit membership filter
  *    per file — prunes POINT (`=`, `IN`) predicates on columns
  *    UNCORRELATED with the layout, where every file's min/max spans the
  *    whole domain and zone maps prune nothing.
  *
  * Any later `Filter` over a plain `spark.read.parquet(dir)` scan is then
  * rewritten to read only the files every applicable index admits — the
  * author writes no index code at all (q230/q235 grade exactly that: the
  * `pruned` flag is read back from the OPTIMIZED plan, and a full-scan
  * oracle pins zero lost rows).
  *
  * Soundness: an index only ever EXCLUDES a file it can prove empty for
  * the predicate — the zone test is interval disjointness, the bloom test
  * is k-of-k absent bits (one-sided: false positives read an extra file,
  * false negatives cannot exist). Guards, each declining (never failing):
  *  - registrations are SESSION-KEYED (the MatViewRule discipline);
  *  - a file in the scan but ABSENT from an index (appended after
  *    registration) is kept unconditionally — stale indexes lose pruning
  *    power, never correctness;
  *  - only untyped-equal comparisons of an indexed column against
  *    literals participate (a surviving `Cast` means semantics we didn't
  *    bound — decline); `IN` lists and optimizer-converted `InSet`s
  *    participate for bloom (a file survives if ANY listed value might be
  *    present); non-indexed conjuncts are ignored for pruning and keep
  *    running in the retained Filter;
  *  - the replacement re-aliases the pruned scan onto the consumer's
  *    original exprIds (the MatViewRule substitution shape), and the
  *    original Filter stays on top — indexes SELECT files, the filter
  *    still selects rows.
  * If every file is excluded the scan becomes an empty relation.
  *
  * Fixed-point safety: the rewrite's pruned relation is rooted at the
  * surviving FILE paths, never the registered directory path, so the rule
  * cannot match its own output.
  *
  * At 100 TB: both indexes are |files|-scale driver-side metadata (the
  * zone map |files| rows, the bloom m/8 bytes per file — 8 KB at m=2¹⁶),
  * built in one aggregate pass each and consulted as a driver-side filter
  * at planning time; scan cost drops from O(table) to O(admitted files).
  * This is the needle-in-haystack path (audit lookups, GDPR
  * subject-access) made automatic. `RulesSpec` pins pruning, the
  * unknown-file guard, and the decline paths for both index kinds.
  */
class SkippingIndexRule(session: SparkSession) extends Rule[LogicalPlan] {

  import SkippingIndexRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transformUp {
      case f @ Filter(cond, r: LogicalRelation) =>
        rewrite(cond, r, identity).getOrElse(f)
      case f @ Filter(cond, p @ Project(projList, r: LogicalRelation))
          if projList.forall(_.isInstanceOf[Attribute]) =>
        rewrite(cond, r, sub => p.copy(child = sub)).getOrElse(f)
    }
  }

  /** Try to prune `r`'s file set under `cond`; returns the replacement for
    * the FILTER node (filter kept on top), or None to decline. `wrap`
    * re-inserts a column-pruning Project between filter and scan. */
  private def rewrite(cond: Expression, r: LogicalRelation,
      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] = {
    val fsRel = r.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    // Hive-partitioned layouts carry partition columns in directory names,
    // not in the leaf files: a forced-schema read of survivor FILES would
    // silently return NULL for them (name+type alias guard still passes).
    // The contract is decline-never-corrupt, so decline the whole rewrite.
    if (fsRel.partitionSchema.nonEmpty) return None
    val roots = fsRel.location.rootPaths
    // one root: a directory scan, keyed by the directory. Many roots: a
    // MANIFEST read (`spark.read.parquet(files: _*)` — the SnapshotStore
    // shape) where every root is a file; if all share one parent
    // directory with a registration (SnapshotStore.attachSkipping), the
    // per-file index prunes within the manifest's list — files the index
    // doesn't know stay admitted, as always.
    val key =
      if (roots.length == 1) keyOf(session, roots.head.toString)
      else {
        val parents = roots.map(_.getParent).distinct
        if (parents.length != 1 || parents.head == null) return None
        keyOf(session, parents.head.toString)
      }
    val indexes = registry.get(key) match {
      case Some(e) if e.ownedBy(session) => e.indexes
      case _ => return None
    }
    val preds = conjuncts(cond)
    // pair each index with the predicate evidence that makes it applicable
    val applicable = indexes.flatMap { ix =>
      r.output.find(a => a.name == ix.colName && a.dataType == ix.dataType)
        .flatMap(attr => ix.bind(preds, attr))
    }
    if (applicable.isEmpty) return None
    try {
      val all = fsRel.location.inputFiles.map(normPath)
      val survivors = all.filter(f => applicable.forall(_.admits(f)))
      if (survivors.length >= all.length) return None
      val pruned: LogicalPlan =
        if (survivors.isEmpty) LocalRelation(r.output)
        else {
          val rel = session.read.schema(r.schema)
            .parquet(survivors.toIndexedSeq: _*).queryExecution.optimizedPlan
          val byName = rel.output.groupBy(_.name)
          val aliases = r.output.map { o =>
            byName.get(o.name) match {
              case Some(Seq(n)) if n.dataType == o.dataType =>
                Alias(n, o.name)(exprId = o.exprId)
              case _ => return None
            }
          }
          Project(aliases, rel)
        }
      Some(Filter(cond, wrap(pruned)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, rr) => conjuncts(l) ++ conjuncts(rr)
    case other => Seq(other)
  }
}

object SkippingIndexRule {

  /** An index BOUND to a concrete scan's predicates: `admits(file)` is the
    * per-file admissibility test. */
  private[plans] sealed trait BoundIndex { def admits(file: String): Boolean }

  /** A registered per-file index over one column of a layout. `bind`
    * inspects the filter's conjuncts and returns the bound test — or None
    * when no conjunct makes this index applicable. */
  private[plans] sealed trait Index {
    def colName: String
    def dataType: DataType
    def bind(preds: Seq[Expression], attr: Attribute): Option[BoundIndex]
  }

  /** One normalized comparison: attr (=|>|>=|<|<=) value. */
  private final case class Bound(v: Any, eq: Boolean, gt: Boolean,
      strict: Boolean) {
    /** Can a row in [lo, hi] satisfy this comparison? (Interval test —
      * the standard zone-map admissibility predicate.) */
    def satisfiable(lo: Any, hi: Any, ord: Ordering[Any]): Boolean =
      if (eq) ord.lteq(lo, v) && ord.lteq(v, hi)
      else if (gt) { if (strict) ord.gt(hi, v) else ord.gteq(hi, v) }
      else { if (strict) ord.lt(lo, v) else ord.lteq(lo, v) }
  }

  private final case class ZoneIndex(colName: String, dataType: DataType,
      zones: Map[String, (Any, Any)]) extends Index {
    def bind(preds: Seq[Expression], attr: Attribute): Option[BoundIndex] = {
      val bounds = preds.flatMap(boundOf(_, attr))
      // IN lists zone-prune too: a file is admissible for a value-list
      // conjunct iff AT LEAST ONE listed value falls in its [lo, hi]
      val pointSets = preds.flatMap(eqValuesOf(_, attr)).filter(_.nonEmpty)
      if (bounds.isEmpty && pointSets.isEmpty) None
      else {
        val ord = TypeUtils.getInterpretedOrdering(dataType)
        Some(new BoundIndex {
          def admits(file: String): Boolean = zones.get(file) match {
            case Some((lo, hi)) if lo != null && hi != null =>
              bounds.forall(_.satisfiable(lo, hi, ord)) &&
                pointSets.forall(_.exists(v =>
                  ord.lteq(lo, v) && ord.lteq(v, hi)))
            case _ => true // unknown or all-null file: keep — sound
          }
        })
      }
    }
  }

  private final case class BloomIndex(colName: String, dataType: DataType,
      kHash: Int, mBits: Long,
      bits: Map[String, Map[Long, Long]]) extends Index {
    def bind(preds: Seq[Expression], attr: Attribute): Option[BoundIndex] = {
      val values = preds.flatMap(eqValuesOf(_, attr)).flatten
      if (values.isEmpty) None
      else {
        val probes = values.map(v => positions(v, dataType, kHash, mBits))
        Some(new BoundIndex {
          def admits(file: String): Boolean = bits.get(file) match {
            case Some(words) =>
              // a file is admitted if ANY queried value might be present
              probes.exists(_.forall { case (word, bit) =>
                (words.getOrElse(word, 0L) & bit) != 0L
              })
            case None => true // unknown file: keep — sound
          }
        })
      }
    }
  }

  /** The k (word, bitmask) positions of internal value `v` — EXACTLY the
    * arithmetic [[buildBloom]]'s aggregate runs per row, evaluated on the
    * predicate literal: xxhash64(v, j) mod m, split into a 64-bit word
    * index and an in-word bit. */
  private def positions(v: Any, dt: DataType, kHash: Int,
      mBits: Long): Seq[(Long, Long)] =
    (0 until kHash).map { j =>
      val h = new XxHash64(Seq(Literal(v, dt), Literal(j, IntegerType)))
        .eval(null).asInstanceOf[Long]
      val pos = ((h % mBits) + mBits) % mBits
      (pos / 64, 1L << (pos % 64).toInt)
    }

  /** A comparison of the indexed attribute against a same-typed literal,
    * normalized to attr-on-the-left. Anything else is None. */
  private def boundOf(e: Expression, a: Attribute): Option[Bound] = e match {
    case EqualTo(x: Attribute, Literal(v, t)) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = true, gt = false, strict = false))
    case EqualTo(Literal(v, t), x: Attribute) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = true, gt = false, strict = false))
    case GreaterThan(x: Attribute, Literal(v, t)) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = false, gt = true, strict = true))
    case GreaterThanOrEqual(x: Attribute, Literal(v, t)) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = false, gt = true, strict = false))
    case LessThan(x: Attribute, Literal(v, t)) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = false, gt = false, strict = true))
    case LessThanOrEqual(x: Attribute, Literal(v, t)) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = false, gt = false, strict = false))
    case LessThan(Literal(v, t), x: Attribute) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = false, gt = true, strict = true))
    case LessThanOrEqual(Literal(v, t), x: Attribute) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = false, gt = true, strict = false))
    case GreaterThan(Literal(v, t), x: Attribute) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = false, gt = false, strict = true))
    case GreaterThanOrEqual(Literal(v, t), x: Attribute) if x.exprId == a.exprId && t == a.dataType =>
      Some(Bound(v, eq = false, gt = false, strict = false))
    case _ => None
  }

  /** The point-lookup value set of a conjunct, for bloom probing: `=`,
    * `IN (literals...)`, or the optimizer's `InSet`. None when the
    * conjunct doesn't reference the attribute; Some(Nil) never escapes
    * (an IN with a non-literal member declines the whole conjunct). */
  private def eqValuesOf(e: Expression, a: Attribute): Option[Seq[Any]] = e match {
    case EqualTo(x: Attribute, Literal(v, t)) if x.exprId == a.exprId && t == a.dataType =>
      Some(Seq(v))
    case EqualTo(Literal(v, t), x: Attribute) if x.exprId == a.exprId && t == a.dataType =>
      Some(Seq(v))
    case In(x: Attribute, list) if x.exprId == a.exprId &&
        list.forall { case Literal(_, t) => t == a.dataType; case _ => false } =>
      Some(list.collect { case Literal(v, _) => v })
    case InSet(x: Attribute, hset) if x.exprId == a.exprId =>
      Some(hset.toSeq)
    case _ => None
  }

  private final case class Entry(indexes: Seq[Index],
      session: java.lang.ref.WeakReference[SparkSession]) {
    def ownedBy(s: SparkSession): Boolean = session.get() eq s
  }

  /** Keyed by (session UUID, QUALIFIED directory path) — what a relation's
    * rootPaths report — so lookup is a string compare at optimization time
    * and two sessions indexing the same directory can never clobber or
    * drop each other's registrations (the weak-ref `ownedBy` check stays
    * as the GC'd-session guard). */
  private val registry = TrieMap.empty[String, Entry]

  /** A process-unique id per live SparkSession (weakly held, GC-safe) —
    * `SparkSession.sessionUUID` is private[sql], so mint our own. */
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def keyOf(spark: SparkSession, qualifiedDir: String): String =
    sessionIds.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID().toString) + "|" + qualifiedDir

  private def normPath(s: String): String =
    new org.apache.hadoop.fs.Path(s).toString

  private def qualified(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  private def addIndex(spark: SparkSession, dir: String, ix: Index): Unit = {
    val key = keyOf(spark, qualified(spark, dir))
    val prev = registry.get(key).filter(_.ownedBy(spark))
      .map(_.indexes.filterNot(_.colName == ix.colName)).getOrElse(Nil)
    registry.put(key, Entry(prev :+ ix,
      new java.lang.ref.WeakReference(spark)))
  }

  /** Build and register the ZONE MAP for `colName` over the parquet layout
    * at `dir`: one aggregate pass (per-file min/max via `input_file_name`),
    * |files| rows collected — planning-scale, the listing the scheduler
    * already holds. Values are stored in Catalyst-internal form so the
    * rule's interval test runs directly against predicate literals. */
  def buildZoneMap(spark: SparkSession, dir: String, colName: String): Unit = {
    val df = spark.read.parquet(dir)
    val dt = df.schema(colName).dataType
    val conv = CatalystTypeConverters.createToCatalystConverter(dt)
    val zones = df
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colName)).as("lo"), max(col(colName)).as("hi"))
      .collect()
      .map(r => normPath(r.getString(0)) -> ((conv(r.get(1)), conv(r.get(2)))))
      .toMap
    addIndex(spark, dir, ZoneIndex(colName, dt, zones))
  }

  /** Register a zone map whose per-file [lo, hi] entries were computed
    * ELSEWHERE (the SnapshotStore's commit-versioned stats sidecar) —
    * values arrive in external Scala form and are converted to Catalyst
    * internal form here. `dir` is the directory whose manifest reads
    * should prune (the snapshot root). */
  private[graft] def registerZoneMapEntries(spark: SparkSession, dir: String,
      colName: String, dt: DataType, zones: Map[String, (Any, Any)]): Unit = {
    val conv = CatalystTypeConverters.createToCatalystConverter(dt)
    addIndex(spark, dir, ZoneIndex(colName, dt,
      zones.map { case (f, (lo, hi)) =>
        normPath(f) -> ((conv(lo), conv(hi)))
      }))
  }

  /** Build and register the per-file BLOOM FILTER for `colName`: the q225
    * sparse (file, word, bits) aggregate — k xxhash64 positions per row
    * into an m-bit filter, `bit_or`-combined per 64-bit word, pure
    * codegen'd integer ops — collected to ≤ |files|·m/64 sparse rows. */
  def buildBloom(spark: SparkSession, dir: String, colName: String,
      kHash: Int = 3, mBits: Long = 1L << 16): Unit = {
    val df = spark.read.parquet(dir)
    val dt = df.schema(colName).dataType
    val positions = (0 until kHash).map(j =>
      struct(lit(j).as("j"),
        pmod(xxhash64(col(colName), lit(j)), lit(mBits)).as("pos")))
    val sparse = df
      .select(input_file_name().as("file"),
        explode(org.apache.spark.sql.functions.array(positions: _*)).as("p"))
      .select(col("file"), (col("p.pos") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(p.pos % 64 AS INT))").as("bit"))
      .groupBy(col("file"), col("word"))
      .agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val byFile = sparse.groupBy(r => normPath(r.getString(0)))
      .map { case (f, rows) =>
        f -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      }
    addIndex(spark, dir, BloomIndex(colName, dt, kHash, mBits, byFile))
  }

  /** Drop a directory's registration (or all of them) — tests and Bench
    * passes. */
  def drop(spark: SparkSession, dir: String): Unit =
    registry.remove(keyOf(spark, qualified(spark, dir)))
  def clear(): Unit = registry.clear()

  // ---- persistence: the index outlives the JVM ----------------------------
  //
  // The MatViewRule lifecycle applied to indexes: `save` writes each
  // registered index into an underscore-prefixed sidecar directory beside
  // the data (ignored by scans), `attach` re-enters them in a NEW
  // process/session without rebuilding — the expensive part of a bloom
  // index (its full-corpus build scan) survives the JVM. Staleness: every
  // sidecar row carries the indexed file's (length, mtime) at build time;
  // attach re-stats the files and DECLINES the whole index if any indexed
  // file changed in place (its statistics would lie — the one hazard the
  // unknown-file guard cannot absorb). Files that are simply GONE are
  // dropped from the map (their entries could never match), and files
  // appended since save are unknown → kept unconditionally, as always.

  private def sidecarRoot(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_graft_index")

  private def fileStatus(spark: SparkSession,
      f: String): Option[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(f)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val st = fs.getFileStatus(p)
      Some((st.getLen, st.getModificationTime))
    } else None
  }

  /** Persist every index this session registered for `dir`. Returns how
    * many were written. Zone maps store (file, lo, hi, len, mtime) in the
    * column's NATIVE parquet type (no hand-rolled codecs); blooms store
    * the sparse (file, word, bits, len, mtime) rows plus a one-row meta
    * frame carrying (col, dataType DDL, k, m). */
  def save(spark: SparkSession, dir: String): Int = {
    val entry = registry.get(keyOf(spark, qualified(spark, dir)))
      .filter(_.ownedBy(spark)).getOrElse(return 0)
    import spark.implicits._
    val root = sidecarRoot(dir)
    entry.indexes.foreach {
      case ZoneIndex(cn, dt, zones) =>
        val conv = CatalystTypeConverters.createToScalaConverter(dt)
        val rows = zones.toSeq.map { case (f, (lo, hi)) =>
          val (len, mt) = fileStatus(spark, f).getOrElse((-1L, -1L))
          org.apache.spark.sql.Row(f, conv(lo), conv(hi), len, mt)
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lo", dt),
          org.apache.spark.sql.types.StructField("hi", dt),
          org.apache.spark.sql.types.StructField("len", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("mtime", org.apache.spark.sql.types.LongType)))
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema)
          .write.mode("overwrite").parquet(s"$root/zone_$cn")
      case BloomIndex(cn, dt, k, m, bits) =>
        val rows = bits.toSeq.flatMap { case (f, words) =>
          val (len, mt) = fileStatus(spark, f).getOrElse((-1L, -1L))
          words.toSeq.map { case (w, b) => (f, w, b, len, mt) }
        }
        rows.toDF("file", "word", "bits", "len", "mtime")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/bloom_$cn")
        Seq((cn, dt.catalogString, k, m)).toDF("col", "dt", "k", "m")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/bmeta_$cn")
    }
    entry.indexes.length
  }

  /** Re-enter every persisted index for `dir` into THIS session's
    * registry, validating per-file fingerprints. Returns the number of
    * indexes attached (0 if no sidecar exists or every index declined). */
  def attach(spark: SparkSession, dir: String): Int = {
    val root = sidecarRoot(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val kinds = fs.listStatus(root).map(_.getPath.getName).toSeq
    var n = 0
    /** Validate (file, len, mtime) rows against the live filesystem:
      * Some(survivors) = rows for still-live, unchanged files; None = a
      * file changed IN PLACE — the index lies, decline it. */
    def validate[T](rows: Seq[(String, Long, Long, T)]): Option[Seq[(String, T)]] = {
      val out = Seq.newBuilder[(String, T)]
      for ((f, len, mt, payload) <- rows) fileStatus(spark, f) match {
        case Some((l, m)) if l == len && m == mt => out += ((f, payload))
        case Some(_) => return None // changed in place: statistics lie
        case None => () // file gone: its entries could never match
      }
      Some(out.result())
    }
    for (kind <- kinds) kind match {
      case z if z.startsWith("zone_") =>
        val cn = z.stripPrefix("zone_")
        val df = spark.read.parquet(s"$root/$z")
        val dt = df.schema("lo").dataType
        val conv = CatalystTypeConverters.createToCatalystConverter(dt)
        val raw = df.collect().toSeq.map(r =>
          (r.getString(0), r.getLong(3), r.getLong(4), (r.get(1), r.get(2))))
        validate(raw).foreach { ok =>
          addIndex(spark, dir, ZoneIndex(cn, dt,
            ok.map { case (f, (lo, hi)) => f -> ((conv(lo), conv(hi))) }.toMap))
          n += 1
        }
      case b if b.startsWith("bloom_") =>
        val cn = b.stripPrefix("bloom_")
        val meta = spark.read.parquet(s"$root/bmeta_$cn").head()
        val dt = org.apache.spark.sql.types.DataType
          .fromDDL(meta.getString(1))
        val raw = spark.read.parquet(s"$root/$b").collect().toSeq
          .map(r => (r.getString(0), r.getLong(3), r.getLong(4),
            (r.getLong(1), r.getLong(2))))
        validate(raw).foreach { ok =>
          val byFile = ok.groupBy(_._1)
            .map { case (f, ws) => f -> ws.map(_._2).toMap }
          addIndex(spark, dir, BloomIndex(cn, dt,
            meta.getInt(2), meta.getLong(3), byFile))
          n += 1
        }
      case _ => ()
    }
    n
  }
}
