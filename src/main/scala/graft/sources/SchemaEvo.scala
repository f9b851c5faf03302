package graft.sources

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** SCHEMA-EVOLUTION METADATA — how RENAME/DROP COLUMN become pure
  * metadata commits over immutable parquet files that only know their
  * WRITE-TIME column names.
  *
  * Iceberg solves this with manifest field-ids; the same effect here
  * rides two pieces the manifest already versions:
  *
  *  - every data line carries `sv=<version>` (stamped at commit — the
  *    schema version the file was written under);
  *  - every schema field carries its NAME HISTORY in field metadata
  *    (`graft.history`: the (untilVersion, oldName) chain a RENAME
  *    appends to) and its birth version (`graft.addedAt`, stamped by
  *    ADD COLUMN).
  *
  * A reader then resolves, PER FILE, the physical column name of each
  * current field: the history entry with the smallest `until` greater
  * than the file's `sv` (else the current name), and a SENTINEL name for
  * fields born after the file (`addedAt > sv`) — the sentinel can't
  * exist in the file, so the reader null-fills it, which is exactly
  * what protects a DROP-then-re-ADD of the same name from leaking the
  * dropped column's old values. Each historical epoch's mapping mirrors
  * an actual past schema, so names are unique within an epoch.
  *
  * Everything degrades safely: a schema without evolution metadata maps
  * every field to its current name at every version (exactly today's
  * behavior), and RENAME/DROP decline loudly on tables whose data lines
  * predate `sv=` stamping (no guessable write epoch — correctness over
  * power).
  */
object SchemaEvo {

  private val HistoryKey = "graft.history"
  private val AddedAtKey = "graft.addedAt"

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  /** (untilVersion, nameBefore) entries, ascending by version. */
  def historyOf(f: StructField): Seq[(Int, String)] =
    if (!f.metadata.contains(HistoryKey)) Nil
    else f.metadata.getString(HistoryKey).split(',').toSeq
      .filter(_.nonEmpty).flatMap { e =>
        val i = e.indexOf('=')
        if (i <= 0) None else Some((e.substring(0, i).toInt,
          dec(e.substring(i + 1))))
      }.sortBy(_._1)

  def addedAtOf(f: StructField): Int =
    if (f.metadata.contains(AddedAtKey))
      f.metadata.getLong(AddedAtKey).toInt
    else 0

  /** The field's PHYSICAL column name in a file written under schema
    * version `sv`, or None when the field did not exist yet (the reader
    * must null-fill via a sentinel). */
  def nameAt(f: StructField, sv: Int): Option[String] =
    if (addedAtOf(f) > sv) None
    else Some(historyOf(f).find(_._1 > sv).map(_._2).getOrElse(f.name))

  /** A name guaranteed absent from any data file — requesting it
    * null-fills the column. */
  def sentinel(f: StructField): String =
    s"__graft_absent__${f.name}__${addedAtOf(f)}"

  /** `f` renamed to `newName` at (upcoming) version `v`: the old name
    * joins the history chain; type/nullability/other metadata carry. */
  def renamed(f: StructField, newName: String, v: Int): StructField = {
    val prior =
      if (f.metadata.contains(HistoryKey)) f.metadata.getString(HistoryKey)
      else ""
    val entry = s"$v=${enc(f.name)}"
    val history = if (prior.isEmpty) entry else s"$prior,$entry"
    f.copy(name = newName, metadata = new MetadataBuilder()
      .withMetadata(f.metadata).putString(HistoryKey, history).build())
  }

  /** A field ADDED at (upcoming) version `v` — its birth version makes
    * pre-add files null-fill it even if they carry an old same-named
    * (since-dropped) column. */
  def added(f: StructField, v: Int): StructField =
    f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata).putLong(AddedAtKey, v.toLong).build())

  /** The physical reader schema of `schema`'s fields for a file written
    * under version `sv` — current types in current order, write-epoch
    * names (sentinels for not-yet-born fields), RECURSING into struct
    * fields (nested evolution: `a.b` renames/adds carry their history on
    * the nested StructField itself). Positional rows from a read under
    * this schema align 1:1 with the current schema at every nesting
    * level — parquet resolves nested columns by name per level, so an
    * epoch-named (or sentinel) child reads (or null-fills) exactly like a
    * top-level one. */
  def physicalSchema(schema: StructType, sv: Int): StructType =
    StructType(schema.fields.map(physField(_, sv)))

  private def physField(f: StructField, sv: Int): StructField = {
    val dt = f.dataType match {
      case st: StructType => StructType(st.fields.map(physField(_, sv)))
      case other => other
    }
    StructField(nameAt(f, sv).getOrElse(sentinel(f)), dt, f.nullable)
  }

  /** True when no field — at any nesting level — carries evolution
    * metadata: every version maps to current names and readers can take
    * the single-epoch path. */
  def isTrivial(schema: StructType): Boolean =
    schema.fields.forall(trivialField)

  private def trivialField(f: StructField): Boolean =
    !f.metadata.contains(HistoryKey) && !f.metadata.contains(AddedAtKey) &&
      (f.dataType match {
        case st: StructType => st.fields.forall(trivialField)
        case _ => true
      })

  /** `req`'s structure (names, types, NESTED PRUNING) with `tab`'s
    * evolution metadata grafted on by name at every level — how a scan's
    * pruned required schema regains the name-history the pruner stripped
    * without losing its pruning (substituting the full table field would
    * silently un-prune a nested struct). */
  def withEvoMetadata(req: StructField, tab: StructField): StructField = {
    val dt = (req.dataType, tab.dataType) match {
      case (rs: StructType, ts: StructType) =>
        StructType(rs.fields.map(rf =>
          ts.fields.find(_.name == rf.name)
            .map(tf => withEvoMetadata(rf, tf)).getOrElse(rf)))
      case _ => req.dataType
    }
    StructField(req.name, dt, req.nullable, tab.metadata)
  }

  /** Rename pushed-filter attribute references from current names to the
    * epoch's physical names; filters touching a not-yet-born field (or a
    * shape we don't model) are DROPPED for that epoch — pushdown loses
    * power, rows never (Spark re-evaluates every filter above the
    * scan). */
  def translateFilters(filters: Seq[org.apache.spark.sql.sources.Filter],
      schema: StructType, sv: Int)
      : Seq[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    // dotted nested paths translate level-by-level; a conjunct on a
    // renamed-or-unborn nested field whose epoch path can't be built
    // DROPS for that epoch (pushdown loses power, rows never)
    val m: Map[String, Option[String]] =
      schema.fields.flatMap { f =>
        (f.name -> nameAt(f, sv)) +: (f.dataType match {
          case st: StructType => st.fields.toSeq.map { c =>
            s"${f.name}.${c.name}" -> (for {
              p <- nameAt(f, sv); cn <- nameAt(c, sv)
            } yield s"$p.$cn")
          }
          case _ => Nil
        })
      }.toMap
    def tr(f: Filter, neg: Boolean): Option[Filter] = f match {
      case EqualTo(a, v) => m.get(a).flatten.map(EqualTo(_, v))
      case EqualNullSafe(a, v) => m.get(a).flatten.map(EqualNullSafe(_, v))
      case GreaterThan(a, v) => m.get(a).flatten.map(GreaterThan(_, v))
      case GreaterThanOrEqual(a, v) =>
        m.get(a).flatten.map(GreaterThanOrEqual(_, v))
      case LessThan(a, v) => m.get(a).flatten.map(LessThan(_, v))
      case LessThanOrEqual(a, v) =>
        m.get(a).flatten.map(LessThanOrEqual(_, v))
      case In(a, vs) => m.get(a).flatten.map(In(_, vs))
      case IsNull(a) => m.get(a).flatten.map(IsNull(_))
      case IsNotNull(a) => m.get(a).flatten.map(IsNotNull(_))
      case StringStartsWith(a, v) =>
        m.get(a).flatten.map(StringStartsWith(_, v))
      case StringEndsWith(a, v) => m.get(a).flatten.map(StringEndsWith(_, v))
      case StringContains(a, v) => m.get(a).flatten.map(StringContains(_, v))
      case And(l, r) => (tr(l, neg), tr(r, neg)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        // a conjunct may drop alone ONLY in positive polarity — under a
        // NOT, weakening the conjunction STRENGTHENS the whole filter
        // (Not(And(a,b)) -> Not(a) would drop live rows)
        case (one, other) if !neg => one.orElse(other)
        case _ => None
      }
      case Or(l, r) =>
        for { a <- tr(l, neg); b <- tr(r, neg) } yield Or(a, b)
      case Not(c) => tr(c, !neg).map(Not(_))
      case _ => None
    }
    filters.flatMap(tr(_, neg = false))
  }
}
