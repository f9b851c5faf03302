package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native TOP-K AGGREGATE: collects each group's k highest (score, id)
  * pairs — ordered by (score desc, id asc), a total order, so the result
  * is deterministic at any partition count — in ONE aggregation pass with
  * a fixed k-slot buffer.
  *
  * Why this exists (SURVEY.md §2.2b): the window formulation of top-k per
  * group (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`, q30)
  * must SHUFFLE AND SORT EVERY INPUT ROW — there is no partial step; a
  * 100 TB corpus crosses the wire whole. An aggregate is mergeable:
  * map-side partial aggregation reduces each partition to ≤ k rows per
  * group BEFORE the exchange, so the shuffle carries |groups|·k pairs no
  * matter the input size — the same partial/final structure every sum
  * enjoys, applied to top-k. The aggregate path trades the window's
  * total-sort for per-row buffer insertion (O(k) each, k small by
  * construction).
  *
  * Exactness: insertion keeps the buffer sorted by the same
  * (Double.compare desc, id asc) order DuckDB's `ORDER BY score DESC, id`
  * applies, so the emitted array — and anything computed from it — hash-
  * matches the window form's oracle bit-for-bit. Nulls in either child
  * are skipped (SQL aggregate convention).
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"top_k_pairs: k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint), " +
        s"got (${score.dataType.sql}, ${id.dataType.sql})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  /** (score desc, id asc) — strictly before means KEPT ahead. */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1) // desc
    c < 0 || (c == 0 && a._2 < b._2)
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long)],
      p: (Double, Long)): Unit = {
    // buffer stays sorted; k is small (a query-level constant), so the
    // O(k) insertion IS the fast path — no heap node allocation
    var i = buf.length
    while (i > 0 && before(p, buf(i - 1))) i -= 1
    if (i < k) {
      buf.insert(i, p)
      if (buf.length > k) buf.remove(k)
    }
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var j = 0
    while (j < n) { buf += ((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(score = newLeft, id = newRight)
}
