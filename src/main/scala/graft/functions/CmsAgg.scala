package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native COUNT-MIN SKETCH aggregate: folds weighted (key, count) updates
  * into a fixed `depth × width` counter matrix (Cormode & Muthukrishnan
  * 2005) and emits it as one flat `array<bigint>` of length depth·width
  * (row-major). A point estimate for key w is then
  * `min_i matrix[i·width + h_i(w)]` — never an undercount, over by at most
  * ε·N (ε = e/width) with probability 1−δ (δ = e^−depth).
  *
  * Why this exists (SURVEY.md §2.2b): the sketch family already carries
  * cardinality (HLL), rank (approx quantiles) and membership (bloom) —
  * CMS is the missing FREQUENCY sketch. Like every counter, it is a
  * monoid: `merge` is elementwise addition, so map-side partials reduce
  * each partition to one fixed-size matrix before the exchange and a
  * 100 TB token stream crosses the wire as |partitions| × depth·width
  * longs, independent of corpus or vocabulary size.
  *
  * Exactness contract: the hash family is the engine's shared md5 family —
  * `h_i(w) = parseLong(hex(md5("i:w"))[0,15), 16) % width` — computable
  * bit-identically in Spark SQL (`conv(substring(md5(concat(i,':',w)),1,15),
  * 16,10)`) and DuckDB (`('0x' || substr(md5(...),1,15))::BIGINT`), so an
  * oracle can rebuild the EXACT counter matrix by grouping on (row, cell)
  * and hash-grade estimates, not just bound them. 15 hex chars = 60 bits,
  * non-negative in a signed 64-bit long, so `%` has one semantics in all
  * three engines.
  */
case class CmsAgg(
    word: Expression,
    cnt: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with BinaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"cms_agg: depth must be in [1,16], got $depth")
  require(width > 0 && width <= (1 << 20), s"cms_agg: width must be in [1,2^20], got $width")

  override def left: Expression = word
  override def right: Expression = cnt

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType == StringType && cnt.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, bigint), " +
        s"got (${word.dataType.sql}, ${cnt.dataType.sql})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_agg"

  // MessageDigest is stateful and not thread-safe; each task deserializes
  // its own expression instance and drives update() single-threaded, so a
  // transient per-instance digest (rebuilt after serialization) is safe.
  @transient private lazy val md5 = MessageDigest.getInstance("MD5")

  private val hexDigits = "0123456789abcdef".toCharArray

  /** The shared md5 hash family: first 15 hex chars of md5("i:w") as a
    * base-16 long, mod width — see class doc for the cross-engine twins. */
  private[graft] def cell(row: Int, w: String): Int = {
    md5.reset()
    val digest = md5.digest(s"$row:$w".getBytes(StandardCharsets.UTF_8))
    // 15 hex chars = the first 7.5 bytes: 7 full bytes + the high nibble.
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v = (v << 4) | ((digest(7) >> 4) & 0xfL)
    (v % width).toInt
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val w = word.eval(input)
    val c = cnt.eval(input)
    if (w != null && c != null) {
      val s = w.toString
      val n = c.asInstanceOf[Long]
      var i = 0
      while (i < depth) { buf(i * width + cell(i, s)) += n; i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsAgg =
    copy(word = newLeft, cnt = newRight)
}
