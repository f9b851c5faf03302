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

  val Names: Seq[String] = Seq("days", "bucket")

  def load(catalogName: String, ident: Identifier): UnboundFunction = {
    if (ident.namespace().nonEmpty || !Names.contains(ident.name()))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
        ident)
    ident.name() match {
      case "days" => DaysUnbound
      case _ => BucketUnbound
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
