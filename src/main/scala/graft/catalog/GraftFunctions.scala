package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StructType, TimestampNTZType, TimestampType}

/** The catalog's V2 FUNCTIONS (`FunctionCatalog`) — the partition
  * transforms as resolvable scalar functions, which is what lets Spark's
  * own write-distribution machinery (`V2ExpressionUtils
  * .toCatalystTransformOpt`) turn a requested `clustered(days(ts))`
  * distribution into a real shuffle ON THE TRANSFORMED VALUE: every row
  * of one UTC day (or one bucket) lands in one task, so the fanout
  * writer opens one file per partition tuple instead of one per (task,
  * tuple). The same trick Iceberg's SparkFunctions play. Semantics match
  * [[PartitionSpec]] exactly — routing, clustering, and pruning share
  * one definition. */
object GraftFunctions {

  val Names: Seq[String] =
    Seq("days", "hours", "months", "years", "bucket", "truncate")

  /** `truncate_<w>` — the WIDTH-HOISTED single-argument edition of
    * truncate. Spark's storage-partitioned-join test
    * (`KeyGroupedPartitioning.satisfies0`) requires each partition
    * expression to have exactly ONE leaf, so a generic transform with a
    * literal width argument can never satisfy a clustered distribution
    * (bucket only works because Spark hoists its literal into
    * `numBucketsOpt`). The scan therefore REPORTS `truncate_100(k)` —
    * width baked into the resolvable function name, column as the only
    * child — which this catalog binds back to the same semantics;
    * canonical names agree across both join sides. */
  private val FixedTruncRe = "truncate_(\\d+)".r

  def load(catalogName: String, ident: Identifier): UnboundFunction = {
    def unknown() =
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
        ident)
    if (ident.namespace().nonEmpty) unknown()
    ident.name() match {
      case "days" => DaysUnbound
      case "hours" => HoursUnbound
      case "months" => MonthsUnbound
      case "years" => YearsUnbound
      case "truncate" => TruncateUnbound
      case "bucket" => BucketUnbound
      case FixedTruncRe(w) if w.toIntOption.exists(_ >= 1) =>
        fixedTruncate(w.toInt)
      case _ => unknown()
    }
  }

  private def fixedTruncate(w: Int): UnboundFunction = new UnboundFunction {
    override def name(): String = s"truncate_$w"
    override def description(): String =
      s"truncate_$w(c): c truncated to width $w (the width-hoisted " +
        "single-argument edition of truncate — storage-partitioned-join " +
        "resolvable)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"truncate_$w takes one argument, got ${inputType.fields.length}")
      val dt = inputType.fields(0).dataType
      dt match {
        case LongType | IntegerType | org.apache.spark.sql.types.StringType =>
          new GraftScalar(s"truncate_$w", Array(dt), dt) {
            override def produceResult(input: InternalRow): Any =
              if (input.isNullAt(0)) null
              else dt match {
                case LongType =>
                  val v = input.getLong(0)
                  v - Math.floorMod(v, w.toLong)
                case IntegerType =>
                  val v = input.getInt(0)
                  v - Math.floorMod(v, w)
                case _ =>
                  org.apache.spark.unsafe.types.UTF8String.fromString(
                    input.getUTF8String(0).toString.take(w))
              }
          }
        case other => throw new UnsupportedOperationException(
          s"truncate_$w: unsupported input type $other")
      }
    }
  }

  object DaysUnbound extends UnboundFunction {
    override def name(): String = "days"
    override def description(): String =
      "days(ts): the UTC day number of a timestamp/date (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"days takes one argument, got ${inputType.fields.length}")
      inputType.fields(0).dataType match {
        case TimestampType | TimestampNTZType => DaysOfMicros
        case DateType => DaysOfDate
        case other => throw new UnsupportedOperationException(
          s"days: unsupported input type $other")
      }
    }
  }

  private abstract class GraftScalar(fname: String, in: Array[DataType],
      out: DataType) extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = in
    override def resultType(): DataType = out
    override def name(): String = fname
    override def canonicalName(): String = s"graft.$fname"
    override def isResultNullable: Boolean = true
  }

  private object DaysOfMicros
    extends GraftScalar("days", Array(TimestampType), IntegerType) {
    override def produceResult(input: InternalRow): Any =
      if (input.isNullAt(0)) null
      else Math.floorDiv(input.getLong(0), PartitionSpec.MicrosPerDay).toInt
  }

  private object DaysOfDate
    extends GraftScalar("days", Array(DateType), IntegerType) {
    override def produceResult(input: InternalRow): Any =
      if (input.isNullAt(0)) null else input.getInt(0)
  }

  object HoursUnbound extends UnboundFunction {
    override def name(): String = "hours"
    override def description(): String =
      "hours(ts): the UTC hour number of a timestamp (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"hours takes one argument, got ${inputType.fields.length}")
      inputType.fields(0).dataType match {
        case TimestampType | TimestampNTZType => HoursOfMicros
        case other => throw new UnsupportedOperationException(
          s"hours: unsupported input type $other")
      }
    }
  }

  private object HoursOfMicros
    extends GraftScalar("hours", Array(TimestampType), IntegerType) {
    override def produceResult(input: InternalRow): Any =
      if (input.isNullAt(0)) null
      else Math.floorDiv(input.getLong(0), PartitionSpec.MicrosPerHour).toInt
  }

  /** months/years share one shape: a temporal input reduced to its UTC
    * epoch day, then exact calendar arithmetic ([[PartitionSpec]]). */
  private def calendarUnbound(fname: String,
      ofDay: Long => Int): UnboundFunction = new UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(ts): calendar $fname since 1970 (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$fname takes one argument, got ${inputType.fields.length}")
      inputType.fields(0).dataType match {
        case TimestampType | TimestampNTZType =>
          new GraftScalar(fname, Array(TimestampType), IntegerType) {
            override def produceResult(input: InternalRow): Any =
              if (input.isNullAt(0)) null
              else ofDay(Math.floorDiv(input.getLong(0),
                PartitionSpec.MicrosPerDay))
          }
        case DateType =>
          new GraftScalar(fname, Array(DateType), IntegerType) {
            override def produceResult(input: InternalRow): Any =
              if (input.isNullAt(0)) null else ofDay(input.getInt(0).toLong)
          }
        case other => throw new UnsupportedOperationException(
          s"$fname: unsupported input type $other")
      }
    }
  }

  val MonthsUnbound: UnboundFunction =
    calendarUnbound("months", PartitionSpec.monthIndexOfDay)
  val YearsUnbound: UnboundFunction =
    calendarUnbound("years", PartitionSpec.yearIndexOfDay)

  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, c): c truncated to width w — integers to the " +
        "w-multiple at or below, strings to their first w chars " +
        "(partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (w, col), got ${inputType.fields.length} arguments")
      val dt = inputType.fields(1).dataType
      dt match {
        case LongType | IntegerType | org.apache.spark.sql.types.StringType =>
          new GraftScalar("truncate", Array(IntegerType, dt), dt) {
            override def produceResult(input: InternalRow): Any =
              if (input.isNullAt(0) || input.isNullAt(1)) null
              else {
                val w = input.getInt(0)
                dt match {
                  case LongType =>
                    val v = input.getLong(1)
                    v - Math.floorMod(v, w.toLong)
                  case IntegerType =>
                    val v = input.getInt(1)
                    v - Math.floorMod(v, w)
                  case _ =>
                    org.apache.spark.unsafe.types.UTF8String.fromString(
                      input.getUTF8String(1).toString.take(w))
                }
              }
          }
        case other => throw new UnsupportedOperationException(
          s"truncate: unsupported input type $other")
      }
    }
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, c): deterministic hash bucket in [0, n) (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (n, col), got ${inputType.fields.length} arguments")
      val dt = inputType.fields(1).dataType
      new GraftScalar("bucket", Array(IntegerType, dt), IntegerType) {
        override def produceResult(input: InternalRow): Any =
          if (input.isNullAt(0) || input.isNullAt(1)) null
          else {
            val n = input.getInt(0)
            val v = dt match {
              case LongType => java.lang.Long.valueOf(input.getLong(1))
              case IntegerType => java.lang.Integer.valueOf(input.getInt(1))
              case _ => input.get(1, dt)
            }
            Math.floorMod(PartitionSpec.bucketHash(v), n)
          }
      }
    }
  }
}
