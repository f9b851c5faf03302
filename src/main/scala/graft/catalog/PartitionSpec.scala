package graft.catalog

import graft.sources.SnapshotStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, DateType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** PARTITION TRANSFORMS for snapshot tables — the manifest's
  * `meta:partition=` spec grown from one identity column to the
  * Iceberg-style transform family a real events table needs:
  *
  *  - `PARTITIONED BY (c)` — identity (the original spec, unchanged
  *    on-disk rendering for full back-compat);
  *  - `PARTITIONED BY (days(ts))` — UTC-day of a timestamp/date column
  *    (the first thing time-series ingest wants: one-day probes read one
  *    day's files);
  *  - `PARTITIONED BY (bucket(n, c))` — a deterministic hash bucket
  *    (spreads high-cardinality keys over n groups; point lookups prune
  *    to 1/n of the files);
  *  - multi-item specs compose (`status, days(ts)`), rendered per file as
  *    a `|`-joined URL-encoded tuple.
  *
  * The WRITE side computes each row's tuple in the fanout writer
  * ([[SnapshotFanoutWriterFactory]]); the READ side prunes pushed
  * filters against per-file tuples ([[SnapshotPartitions.prune]]) —
  * both use the exact functions below, so a pruned probe can never
  * disagree with what the writer routed. Conservative everywhere: a
  * file without an annotation, a spec that fails to parse, or a filter
  * shape we don't model keeps the file (pruning loses power, never
  * rows).
  *
  * `days` buckets by UTC day (Spark TimestampType micros ARE instants;
  * the engine pins `spark.sql.session.timeZone=UTC`); `bucket` hashes by
  * a documented per-type function (Java `hashCode` semantics for
  * long/int/string), floor-modded into n — deterministic across JVMs,
  * intentionally NOT Iceberg's murmur variant (manifests are
  * graft-native).
  */
sealed trait PartItem {
  def col: String
  /** Spec-string rendering (`meta:partition=` item). */
  def render: String
  /** The partition value of a WRITTEN row's column value (Spark internal
    * types: Long micros for timestamps, Int epoch-days for dates,
    * UTF8String for strings). */
  def valueOf(v: Any): String
}

case class IdentityItem(col: String) extends PartItem {
  def render: String = col
  def valueOf(v: Any): String =
    if (v == null) PartitionSpec.NullValue else String.valueOf(v)
}

case class DaysItem(col: String) extends PartItem {
  def render: String = s"days($col)"
  def valueOf(v: Any): String = v match {
    case null => PartitionSpec.NullValue
    case micros: java.lang.Long =>
      Math.floorDiv(micros, PartitionSpec.MicrosPerDay).toString
    case epochDays: java.lang.Integer => epochDays.toString
    case other => PartitionSpec.NullValue + ":" + other.getClass.getSimpleName
  }
}

case class BucketItem(n: Int, col: String) extends PartItem {
  def render: String = s"bucket($n,$col)"
  def valueOf(v: Any): String =
    if (v == null) PartitionSpec.NullValue
    else Math.floorMod(PartitionSpec.bucketHash(v), n).toString
}

object PartitionSpec {

  val MicrosPerDay: Long = 86400000000L
  private val MillisPerDay: Long = 86400000L
  val NullValue = "__null__"

  private val DaysRe = """days\(([^()]+)\)""".r
  private val BucketRe = """bucket\((\d+)\s*,\s*([^()]+)\)""".r

  /** Split on top-level commas only — `bucket(4,u)` is one item. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.result(); sb.clear()
      case c => sb += c
    }
    out += sb.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Parse a `meta:partition=` spec string; None when any item fails
    * (consumers then decline pruning AND fanout — never guess). */
  def parse(spec: String): Option[Seq[PartItem]] = {
    val items = splitTop(spec).map {
      case DaysRe(c) => Some(DaysItem(c.trim))
      case BucketRe(n, c) => Some(BucketItem(n.toInt, c.trim))
      case c if !c.contains('(') => Some(IdentityItem(c))
      case _ => None
    }.toSeq
    if (items.isEmpty || items.exists(_.isEmpty)) None else Some(items.flatten)
  }

  /** Spark V2 `Transform`s (SQL `PARTITIONED BY`) → items; throws loudly
    * on anything outside the supported family. */
  def fromTransforms(transforms: Seq[Transform]): Seq[PartItem] =
    transforms.map { t =>
      def oneRef: String = {
        require(t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1,
          s"graft catalog: transform ${t.name()} takes one top-level column")
        t.references()(0).fieldNames()(0)
      }
      t.name() match {
        case "identity" => IdentityItem(oneRef)
        case "days" => DaysItem(oneRef)
        case "bucket" =>
          val n = t.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value() match {
                case i: java.lang.Integer => i.intValue()
                case l2: java.lang.Long => l2.toInt
              }
          }.getOrElse(throw new UnsupportedOperationException(
            s"graft catalog: bucket transform needs a literal bucket count"))
          require(n >= 1, s"graft catalog: bucket count must be >= 1, got $n")
          BucketItem(n, oneRef)
        case other => throw new UnsupportedOperationException(
          s"graft catalog: unsupported partition transform $other " +
            "(supported: identity, days, bucket)")
      }
    }

  def renderSpec(items: Seq[PartItem]): String = items.map(_.render).mkString(",")

  /** Per-type deterministic bucket hash — the SAME function on the write
    * side (internal row values) and the read side (filter literals), so
    * routing and pruning can never disagree. */
  def bucketHash(v: Any): Int = v match {
    case s: UTF8String => s.toString.hashCode
    case s: String => s.hashCode
    case l: java.lang.Long => java.lang.Long.hashCode(l)
    case i: java.lang.Integer => i.intValue()
    case s: java.lang.Short => s.intValue()
    case b: java.lang.Byte => b.intValue()
    case other => String.valueOf(other).hashCode
  }

  /** Encode a row's per-item values as the manifest annotation. A
    * single-identity spec keeps the ORIGINAL raw rendering (full
    * back-compat with every existing manifest); anything else is a
    * `|`-joined URL-encoded tuple. */
  def encode(items: Seq[PartItem], values: Seq[String]): String =
    items match {
      case Seq(_: IdentityItem) => values.head
      case _ => values.map(java.net.URLEncoder.encode(_, "UTF-8"))
        .mkString("|")
    }

  /** Decode a file's annotation back to per-item values; None on shape
    * mismatch (consumers keep the file). */
  def decode(items: Seq[PartItem], enc: String): Option[Seq[String]] =
    items match {
      case Seq(_: IdentityItem) => Some(Seq(enc))
      case _ =>
        val parts = enc.split("\\|", -1).toSeq
        if (parts.length != items.length) None
        else Some(parts.map(java.net.URLDecoder.decode(_, "UTF-8")))
    }

  /** The UTC (day, is-exact-midnight) of a filter literal (both legacy
    * and java8 datetime classes arrive depending on session conf). The
    * midnight flag lets a strict `ts < 'd 00:00:00'` bound exclude day d
    * exactly; any sub-day remainder keeps the bound inclusive
    * (conservative). */
  def dayOfLiteral(v: Any): Option[(Long, Boolean)] = v match {
    case t: java.sql.Timestamp =>
      Some((Math.floorDiv(t.getTime, MillisPerDay),
        Math.floorMod(t.getTime, MillisPerDay) == 0 && t.getNanos == 0))
    case i: java.time.Instant =>
      Some((Math.floorDiv(i.toEpochMilli, MillisPerDay),
        Math.floorMod(i.toEpochMilli, MillisPerDay) == 0 && i.getNano == 0))
    case d: java.sql.Date => Some((d.toLocalDate.toEpochDay, true))
    case d: java.time.LocalDate => Some((d.toEpochDay, true))
    case _ => None
  }
}

/** PARTITION PRUNING of a manifest file list from pushed filters against
  * the per-file partition tuples — the third pruning layer the catalog
  * scan stacks (manifest zone stats, partition tuples, parquet row-group
  * stats), each conservative: extra files are kept, rows are never
  * lost. */
object SnapshotPartitions {

  def prune(spark: SparkSession, root: String, version: Int,
      pushed: Seq[Filter], files: Seq[String]): Seq[String] = {
    if (pushed.isEmpty || files.isEmpty) return files
    val items = SnapshotStore.partitionSpecOf(spark, root, version)
      .flatMap(PartitionSpec.parse).getOrElse(return files)
    val tests = items.map(test(pushed, _))
    if (tests.forall(_.isEmpty)) return files
    val pv = SnapshotStore.partitionValuesOf(spark, root, version)
    files.filter { f =>
      pv.get(SnapshotStore.uriPath(f)) match {
        case None => true // unannotated: keep unconditionally
        case Some(enc) =>
          PartitionSpec.decode(items, enc) match {
            case None => true
            case Some(vals) => tests.lazyZip(vals).forall { (t, v) =>
              t.forall(_(v))
            }
          }
      }
    }
  }

  /** The admissibility test `pushed` implies for one spec item's VALUE
    * string, None when the conjuncts don't constrain it. */
  private def test(pushed: Seq[Filter],
      item: PartItem): Option[String => Boolean] = {
    val conjuncts = pushed.flatMap(flatten)
    item match {
      case IdentityItem(c) =>
        val allowed = conjuncts.collect {
          case EqualTo(a, v) if a == c => Set(String.valueOf(v))
          case In(a, vs) if a == c => vs.map(String.valueOf(_)).toSet
        }
        allowed.reduceOption(_ intersect _).map(s => s.contains(_))
      case BucketItem(n, c) =>
        val allowed = conjuncts.collect {
          case EqualTo(a, v) if a == c =>
            Set(Math.floorMod(PartitionSpec.bucketHash(v), n).toString)
          case In(a, vs) if a == c =>
            vs.map(v =>
              Math.floorMod(PartitionSpec.bucketHash(v), n).toString).toSet
        }
        allowed.reduceOption(_ intersect _).map(s => s.contains(_))
      case DaysItem(c) =>
        var lo = Long.MinValue
        var hi = Long.MaxValue
        var any = false
        conjuncts.foreach {
          case EqualTo(a, v) if a == c =>
            PartitionSpec.dayOfLiteral(v).foreach { case (d, _) =>
              lo = lo.max(d); hi = hi.min(d); any = true
            }
          case GreaterThan(a, v) if a == c =>
            PartitionSpec.dayOfLiteral(v).foreach { case (d, _) =>
              lo = lo.max(d); any = true // strict treated inclusive: safe
            }
          case GreaterThanOrEqual(a, v) if a == c =>
            PartitionSpec.dayOfLiteral(v).foreach { case (d, _) =>
              lo = lo.max(d); any = true
            }
          case LessThan(a, v) if a == c =>
            PartitionSpec.dayOfLiteral(v).foreach { case (d, midnight) =>
              // `< d 00:00:00` excludes all of day d; any remainder keeps
              // the bound inclusive (conservative)
              hi = hi.min(if (midnight) d - 1 else d); any = true
            }
          case LessThanOrEqual(a, v) if a == c =>
            PartitionSpec.dayOfLiteral(v).foreach { case (d, _) =>
              hi = hi.min(d); any = true
            }
          case _ => ()
        }
        if (!any) None
        else Some { s =>
          s.toLongOption match {
            case Some(d) => d >= lo && d <= hi
            case None => true // null marker / unparsable: keep
          }
        }
    }
  }

  private def flatten(f: Filter): Seq[Filter] = f match {
    case And(l, r) => flatten(l) ++ flatten(r)
    case other => Seq(other)
  }
}

/** Resolved write-side fanout plan: each item bound to its field ordinal
  * and type in the write schema. */
case class BoundPartItem(item: PartItem, idx: Int, dt: DataType)

object BoundPartItem {

  /** Bind `items` against a write schema; None when any source column is
    * missing (the write then lands unannotated — conservative). Declines
    * loudly on a days() over a non-temporal column. */
  def bind(items: Seq[PartItem], schema: StructType): Option[Seq[BoundPartItem]] = {
    val bound = items.map { it =>
      val i = schema.fieldNames.indexOf(it.col)
      if (i < 0) None
      else {
        val dt = schema.fields(i).dataType
        it match {
          case _: DaysItem
              if dt != TimestampType && dt != DateType &&
                dt != org.apache.spark.sql.types.TimestampNTZType =>
            throw new UnsupportedOperationException(
              s"graft catalog: days(${it.col}) needs a timestamp/date " +
                s"column, got $dt")
          case _ => ()
        }
        Some(BoundPartItem(it, i, dt))
      }
    }
    if (bound.exists(_.isEmpty)) None else Some(bound.flatten)
  }

  /** The encoded partition tuple of one internal row. */
  def valueOf(bound: Seq[BoundPartItem], row: InternalRow): String =
    PartitionSpec.encode(bound.map(_.item), bound.map { b =>
      b.item.valueOf(if (row.isNullAt(b.idx)) null else row.get(b.idx, b.dt))
    })
}
