package graft.catalog

import graft.sources.SnapshotStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, StringStartsWith}
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

case class HoursItem(col: String) extends PartItem {
  def render: String = s"hours($col)"
  def valueOf(v: Any): String = v match {
    case null => PartitionSpec.NullValue
    case micros: java.lang.Long =>
      Math.floorDiv(micros, PartitionSpec.MicrosPerHour).toString
    case other => PartitionSpec.NullValue + ":" + other.getClass.getSimpleName
  }
}

case class MonthsItem(col: String) extends PartItem {
  def render: String = s"months($col)"
  def valueOf(v: Any): String = v match {
    case null => PartitionSpec.NullValue
    case micros: java.lang.Long => PartitionSpec.monthIndexOfDay(
      Math.floorDiv(micros, PartitionSpec.MicrosPerDay)).toString
    case epochDays: java.lang.Integer =>
      PartitionSpec.monthIndexOfDay(epochDays.toLong).toString
    case other => PartitionSpec.NullValue + ":" + other.getClass.getSimpleName
  }
}

case class YearsItem(col: String) extends PartItem {
  def render: String = s"years($col)"
  def valueOf(v: Any): String = v match {
    case null => PartitionSpec.NullValue
    case micros: java.lang.Long => PartitionSpec.yearIndexOfDay(
      Math.floorDiv(micros, PartitionSpec.MicrosPerDay)).toString
    case epochDays: java.lang.Integer =>
      PartitionSpec.yearIndexOfDay(epochDays.toLong).toString
    case other => PartitionSpec.NullValue + ":" + other.getClass.getSimpleName
  }
}

/** Iceberg's `truncate(w, c)`: integers truncate to the w-multiple at or
  * below (`v - floorMod(v, w)` — monotonic, range-prunable); strings to
  * their first w chars (point-prunable, incl. sufficiently long
  * prefixes). */
case class TruncateItem(w: Int, col: String) extends PartItem {
  def render: String = s"truncate($w,$col)"
  def valueOf(v: Any): String = v match {
    case null => PartitionSpec.NullValue
    case l: java.lang.Long => (l - Math.floorMod(l, w.toLong)).toString
    case i: java.lang.Integer =>
      (i.intValue - Math.floorMod(i.intValue, w)).toString
    case s: java.lang.Short =>
      (s.intValue - Math.floorMod(s.intValue, w)).toString
    case b: java.lang.Byte =>
      (b.intValue - Math.floorMod(b.intValue, w)).toString
    case s: UTF8String => s.toString.take(w)
    case s: String => s.take(w)
    case other => PartitionSpec.NullValue + ":" + other.getClass.getSimpleName
  }
}

object PartitionSpec {

  val MicrosPerDay: Long = 86400000000L
  val MicrosPerHour: Long = 3600000000L
  private val MillisPerDay: Long = 86400000L
  val NullValue = "__null__"

  /** Months-since-1970-01 of an epoch day (exact calendar arithmetic). */
  def monthIndexOfDay(epochDay: Long): Int = {
    val d = java.time.LocalDate.ofEpochDay(epochDay)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  /** Years-since-1970 of an epoch day. */
  def yearIndexOfDay(epochDay: Long): Int =
    java.time.LocalDate.ofEpochDay(epochDay).getYear - 1970

  private val DaysRe = """days\(([^()]+)\)""".r
  private val HoursRe = """hours\(([^()]+)\)""".r
  private val MonthsRe = """months\(([^()]+)\)""".r
  private val YearsRe = """years\(([^()]+)\)""".r
  private val BucketRe = """bucket\((\d+)\s*,\s*([^()]+)\)""".r
  private val TruncateRe = """truncate\((\d+)\s*,\s*([^()]+)\)""".r

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
      case HoursRe(c) => Some(HoursItem(c.trim))
      case MonthsRe(c) => Some(MonthsItem(c.trim))
      case YearsRe(c) => Some(YearsItem(c.trim))
      case BucketRe(n, c) => Some(BucketItem(n.toInt, c.trim))
      case TruncateRe(w, c) => Some(TruncateItem(w.toInt, c.trim))
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
      def litArg(what: String): Int = {
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value() match {
              case i: java.lang.Integer => i.intValue()
              case l2: java.lang.Long => l2.toInt
            }
        }.getOrElse(throw new UnsupportedOperationException(
          s"graft catalog: ${t.name()} transform needs a literal $what"))
        require(n >= 1,
          s"graft catalog: ${t.name()} $what must be >= 1, got $n")
        n
      }
      t.name() match {
        case "identity" => IdentityItem(oneRef)
        case "days" => DaysItem(oneRef)
        case "hours" => HoursItem(oneRef)
        case "months" => MonthsItem(oneRef)
        case "years" => YearsItem(oneRef)
        case "bucket" => BucketItem(litArg("bucket count"), oneRef)
        case "truncate" => TruncateItem(litArg("width"), oneRef)
        case n if n.startsWith("truncate_") &&
            n.stripPrefix("truncate_").toIntOption.exists(_ >= 1) =>
          // the width-hoisted spelling the scan reports for SPJ — accept
          // it in DDL too, same semantics
          TruncateItem(n.stripPrefix("truncate_").toInt, oneRef)
        case other => throw new UnsupportedOperationException(
          s"graft catalog: unsupported partition transform $other " +
            "(supported: identity, days, hours, months, years, bucket, " +
            "truncate)")
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
    * back-compat with every existing manifest) — but REJECTS values
    * carrying manifest structural characters loudly: a tab would truncate
    * the annotation at parse time (a later exact-match probe then wrongly
    * prunes the file) and a newline would split the manifest line into a
    * bogus data-file entry. Anything else is a `|`-joined URL-encoded
    * tuple (structural characters encode away). */
  def encode(items: Seq[PartItem], values: Seq[String]): String =
    items match {
      case Seq(_: IdentityItem) =>
        val v = values.head
        require(!v.exists(c => c == '\t' || c == '\n' || c == '\r'),
          "graft: identity partition value contains a manifest structural " +
            "character (tab/newline/CR); partition such columns by " +
            "bucket(n, c) instead")
        v
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

  /** A pushed-filter LITERAL converted into the write side's INTERNAL
    * value domain — the domain [[PartItem.valueOf]] rendered and
    * [[bucketHash]] hashed at write time (epoch-day Int for dates, micros
    * Long for timestamps/instants, raw for strings, boxed primitives
    * unchanged). Pushed filters carry EXTERNAL literal classes
    * (java.sql.Date/Timestamp, java.time.LocalDate/Instant), whose
    * `String.valueOf`/`hashCode` disagree with the internal rendering —
    * comparing them raw would admit ZERO files on a date/timestamp
    * partition column (silent empty results). None for any class not
    * explicitly modeled here: callers skip that conjunct — pruning loses
    * power, never rows. */
  def internalOfLiteral(v: Any): Option[Any] = v match {
    case null => None
    case s: String => Some(s)
    case s: UTF8String => Some(s.toString)
    case d: java.sql.Date => Some(Int.box(d.toLocalDate.toEpochDay.toInt))
    case d: java.time.LocalDate => Some(Int.box(d.toEpochDay.toInt))
    case t: java.sql.Timestamp =>
      // millis carry the sub-second millis; only the sub-milli remainder
      // of nanos is missing from getTime
      Some(Long.box(Math.addExact(Math.multiplyExact(t.getTime, 1000L),
        (t.getNanos % 1000000L) / 1000L)))
    case i: java.time.Instant =>
      Some(Long.box(Math.addExact(
        Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)))
    case n @ (_: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
              _: java.lang.Byte | _: java.lang.Boolean | _: java.lang.Float |
              _: java.lang.Double) => Some(n)
    case _ => None // BigDecimal & co: internal rendering unmodeled — skip
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

  /** The UTC (hour, is-exact-hour-start) of a timestamp literal. */
  def hourOfLiteral(v: Any): Option[(Long, Boolean)] =
    internalOfLiteral(v).collect {
      case micros: java.lang.Long =>
        (Math.floorDiv(micros, MicrosPerHour),
          Math.floorMod(micros, MicrosPerHour) == 0L)
    }

  /** The UTC day (and sub-day exactness) of a temporal literal — the
    * months/years converters build on it. */
  private def dayAndExact(v: Any): Option[(Long, Boolean)] = v match {
    case _: java.sql.Date | _: java.time.LocalDate => dayOfLiteral(v)
    case _: java.sql.Timestamp | _: java.time.Instant => dayOfLiteral(v)
    case _ => None
  }

  /** (months-since-1970-01, is-exactly-month-start) of a date/timestamp
    * literal. */
  def monthOfLiteral(v: Any): Option[(Long, Boolean)] =
    dayAndExact(v).map { case (day, midnight) =>
      val d = java.time.LocalDate.ofEpochDay(day)
      (monthIndexOfDay(day).toLong, midnight && d.getDayOfMonth == 1)
    }

  /** (years-since-1970, is-exactly-year-start) of a date/timestamp
    * literal. */
  def yearOfLiteral(v: Any): Option[(Long, Boolean)] =
    dayAndExact(v).map { case (day, midnight) =>
      val d = java.time.LocalDate.ofEpochDay(day)
      (yearIndexOfDay(day).toLong,
        midnight && d.getDayOfYear == 1)
    }

  /** (w-truncated value, literal is exactly a truncation boundary) of an
    * integral literal. */
  def truncOfLiteral(w: Int, v: Any): Option[(Long, Boolean)] = {
    val l: Option[Long] = v match {
      case x: java.lang.Long => Some(x)
      case x: java.lang.Integer => Some(x.longValue)
      case x: java.lang.Short => Some(x.longValue)
      case x: java.lang.Byte => Some(x.longValue)
      case _ => None
    }
    l.map { x =>
      val m = Math.floorMod(x, w.toLong)
      (x - m, m == 0L)
    }
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
    val curSpec = SnapshotStore.partitionSpecOf(spark, root, version)
    // SPEC EVOLUTION: each file's annotation decodes under the spec that
    // WROTE it (its `pspec=` epoch; absent = the current spec). Pruning
    // then STACKS across epochs — a probe on the old spec's column prunes
    // the old files, one on the new spec's the new files — and a
    // days-encoded value can never be misread under a later bucket spec.
    val epochs = SnapshotStore.partitionSpecEpochsOf(spark, root, version)
    if (curSpec.isEmpty && epochs.isEmpty) return files
    val pv = SnapshotStore.partitionValuesOf(spark, root, version)
    // per distinct spec: parsed items + their per-item tests (memoized —
    // a manifest holds at most a handful of spec epochs)
    val testCache = scala.collection.mutable.Map
      .empty[String, Option[(Seq[PartItem], Seq[Option[String => Boolean]])]]
    def testsOf(spec: String) = testCache.getOrElseUpdate(spec,
      PartitionSpec.parse(spec).map(items => (items, items.map(test(pushed, _)))))
    files.filter { f =>
      val uri = SnapshotStore.uriPath(f)
      val spec = epochs.get(uri).orElse(curSpec)
      (spec.flatMap(testsOf), pv.get(uri)) match {
        case (Some((items, tests)), Some(enc)) if tests.exists(_.isDefined) =>
          PartitionSpec.decode(items, enc) match {
            case None => true
            case Some(vals) => tests.lazyZip(vals).forall { (t, v) =>
              t.forall(_(v))
            }
          }
        case _ => true // unannotated / unparsable / unconstrained: keep
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
        // admissible annotation strings of one literal: BOTH the internal
        // rendering (the fanout writer's dialect — epoch days, micros) and
        // the external `String.valueOf` (the legacy writeDataPartitioned
        // dialect). The union can only ADMIT extra files, never prune a
        // matching one — safe under either write dialect.
        def renderings(v: Any): Set[String] =
          Set(String.valueOf(v)) ++
            PartitionSpec.internalOfLiteral(v).map(String.valueOf(_))
        val allowed = conjuncts.collect {
          case EqualTo(a, v) if a == c => renderings(v)
          case In(a, vs) if a == c => vs.toSet.flatMap(renderings)
        }
        allowed.reduceOption(_ intersect _).map(s => s.contains(_))
      case BucketItem(n, c) =>
        // bucketHash must see the INTERNAL value (what the write side
        // hashed); an unmodeled literal class skips its conjunct — no
        // pruning from it, never a wrong bucket
        def bucketOf(v: Any): Option[String] =
          PartitionSpec.internalOfLiteral(v).map(iv =>
            Math.floorMod(PartitionSpec.bucketHash(iv), n).toString)
        val allowed = conjuncts.flatMap {
          case EqualTo(a, v) if a == c => bucketOf(v).map(Set(_))
          case In(a, vs) if a == c =>
            val bs = vs.toSeq.map(bucketOf)
            if (bs.forall(_.isDefined)) Some(bs.flatten.toSet) else None
          case _ => None
        }
        allowed.reduceOption(_ intersect _).map(s => s.contains(_))
      case DaysItem(c) =>
        rangeTest(conjuncts, c, PartitionSpec.dayOfLiteral, step = 1L)
      case HoursItem(c) =>
        rangeTest(conjuncts, c, PartitionSpec.hourOfLiteral, step = 1L)
      case MonthsItem(c) =>
        rangeTest(conjuncts, c, PartitionSpec.monthOfLiteral, step = 1L)
      case YearsItem(c) =>
        rangeTest(conjuncts, c, PartitionSpec.yearOfLiteral, step = 1L)
      case TruncateItem(w, c) =>
        // STRING truncation: point tests (equality / long-enough prefixes)
        // on the truncated literal; INTEGER truncation: monotonic range
        // test in the raw domain with step w
        val strAllowed = conjuncts.collect {
          case EqualTo(a, v: String) if a == c => Set(v.take(w))
          case EqualTo(a, v: UTF8String) if a == c => Set(v.toString.take(w))
          case In(a, vs) if a == c && vs.nonEmpty && vs.forall(v =>
              v.isInstanceOf[String] || v.isInstanceOf[UTF8String]) =>
            vs.map(v => String.valueOf(v).take(w)).toSet
          case StringStartsWith(a, p) if a == c && p.length >= w =>
            Set(p.take(w))
        }
        if (strAllowed.nonEmpty)
          strAllowed.reduceOption(_ intersect _).map(s => s.contains(_))
        else rangeTest(conjuncts, c,
          PartitionSpec.truncOfLiteral(w, _), step = w.toLong)
    }
  }

  /** Shared monotonic-bucket range test (days/hours/months/years/
    * truncate-int): `toBucket` maps a literal to (bucket value, the
    * literal IS exactly the bucket's lower boundary); `step` is one
    * bucket's width in the bucket-value domain. A strict upper bound AT a
    * boundary excludes its whole bucket; everything else stays inclusive
    * (conservative). Unconvertible literals skip their conjunct. */
  private def rangeTest(conjuncts: Seq[Filter], c: String,
      toBucket: Any => Option[(Long, Boolean)],
      step: Long): Option[String => Boolean] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var any = false
    conjuncts.foreach {
      case EqualTo(a, v) if a == c =>
        toBucket(v).foreach { case (d, _) =>
          lo = lo.max(d); hi = hi.min(d); any = true
        }
      case In(a, vs) if a == c && vs.nonEmpty =>
        // the value list's [min, max] bucket envelope; any unconvertible
        // member skips the conjunct
        val bs = vs.toSeq.map(toBucket)
        if (bs.forall(_.isDefined)) {
          val ds = bs.flatten.map(_._1)
          lo = lo.max(ds.min); hi = hi.min(ds.max); any = true
        }
      case GreaterThan(a, v) if a == c =>
        toBucket(v).foreach { case (d, _) =>
          lo = lo.max(d); any = true // strict treated inclusive: safe
        }
      case GreaterThanOrEqual(a, v) if a == c =>
        toBucket(v).foreach { case (d, _) =>
          lo = lo.max(d); any = true
        }
      case LessThan(a, v) if a == c =>
        toBucket(v).foreach { case (d, atBoundary) =>
          hi = hi.min(if (atBoundary) d - step else d); any = true
        }
      case LessThanOrEqual(a, v) if a == c =>
        toBucket(v).foreach { case (d, _) =>
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
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType, TimestampNTZType}
        def temporal = dt == TimestampType || dt == DateType ||
          dt == TimestampNTZType
        it match {
          case _: DaysItem if !temporal =>
            throw new UnsupportedOperationException(
              s"graft catalog: days(${it.col}) needs a timestamp/date " +
                s"column, got $dt")
          case _: HoursItem
              if dt != TimestampType && dt != TimestampNTZType =>
            throw new UnsupportedOperationException(
              s"graft catalog: hours(${it.col}) needs a timestamp " +
                s"column, got $dt")
          case _: MonthsItem if !temporal =>
            throw new UnsupportedOperationException(
              s"graft catalog: months(${it.col}) needs a timestamp/date " +
                s"column, got $dt")
          case _: YearsItem if !temporal =>
            throw new UnsupportedOperationException(
              s"graft catalog: years(${it.col}) needs a timestamp/date " +
                s"column, got $dt")
          case _: TruncateItem
              if dt != LongType && dt != IntegerType && dt != ShortType &&
                dt != ByteType && dt != StringType =>
            throw new UnsupportedOperationException(
              s"graft catalog: truncate(w, ${it.col}) needs an integer or " +
                s"string column, got $dt")
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
