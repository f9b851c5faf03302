package graft.catalog

/** COMPRESSED POSITION BITMAP — the delete-vector payload, roaring-style
  * (Chambi et al., "Better bitmap performance with Roaring bitmaps";
  * the format Delta/Iceberg deletion vectors use): row positions split
  * into 2^16-wide containers keyed by their high bits, each container
  * either a sorted short ARRAY (sparse: ≤4096 entries, 2 B/position) or
  * an 8 KiB BITMAP (dense: ≥1 bit/position regardless of count). On the
  * clustered deletes row-level DML produces, this is 10-50× smaller on
  * the wire AND in executor memory than the previous sorted-long parquet
  * rows (8 B/position) — `contains()` replaces the binary search.
  *
  * Containers are immutable parallel arrays; `contains` is a binary
  * search over container keys (few) plus an O(1) bit test or an in-
  * container binary search. Serialization is a fixed little header +
  * per-container payloads; [[PosBitmap.deserialize]] reads exactly what
  * [[PosBitmap.serialize]] wrote (magic-checked — a foreign payload
  * fails loudly, never misreads).
  */
final class PosBitmap private[catalog] (
    private val keys: Array[Long],
    private val kinds: Array[Byte],
    private val payloads: Array[AnyRef]) {

  def isEmpty: Boolean = keys.length == 0

  def containerCount: Int = keys.length

  private[catalog] def keyAt(i: Int): Long = keys(i)
  private[catalog] def kindAt(i: Int): Byte = kinds(i)
  private[catalog] def payloadAt(i: Int): AnyRef = payloads(i)

  def cardinality: Long = {
    var i = 0
    var n = 0L
    while (i < keys.length) {
      kinds(i) match {
        case PosBitmap.KindArray =>
          n += payloads(i).asInstanceOf[Array[Short]].length
        case _ =>
          val words = payloads(i).asInstanceOf[Array[Long]]
          var j = 0
          while (j < words.length) { n += java.lang.Long.bitCount(words(j)); j += 1 }
      }
      i += 1
    }
    n
  }

  def contains(pos: Long): Boolean = {
    if (pos < 0) return false
    val key = pos >>> 16
    val i = java.util.Arrays.binarySearch(keys, key)
    if (i < 0) return false
    val low = (pos & 0xFFFFL).toInt
    kinds(i) match {
      case PosBitmap.KindArray =>
        // shorts stored as the low 16 bits; compare in unsigned order —
        // (v ^ MinValue) maps unsigned order onto signed
        val arr = payloads(i).asInstanceOf[Array[Short]]
        unsignedSearch(arr, low.toShort) >= 0
      case _ =>
        val words = payloads(i).asInstanceOf[Array[Long]]
        (words(low >>> 6) & (1L << (low & 63))) != 0L
    }
  }

  private def unsignedSearch(arr: Array[Short], v: Short): Int = {
    var lo = 0
    var hi = arr.length - 1
    val key = v & 0xFFFF
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = arr(mid) & 0xFFFF
      if (m < key) lo = mid + 1
      else if (m > key) hi = mid - 1
      else return mid
    }
    -1
  }

  /** Serialized byte size (the wire/cache footprint). */
  def serializedSize: Int = {
    var n = 4 + 4 // magic + container count
    var i = 0
    while (i < keys.length) {
      n += 8 + 1 + 4
      n += (kinds(i) match {
        case PosBitmap.KindArray =>
          payloads(i).asInstanceOf[Array[Short]].length * 2
        case _ => PosBitmap.BitmapWords * 8
      })
      i += 1
    }
    n
  }

  def serialize: Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(serializedSize)
    out.putInt(PosBitmap.Magic)
    out.putInt(keys.length)
    var i = 0
    while (i < keys.length) {
      out.putLong(keys(i))
      out.put(kinds(i))
      kinds(i) match {
        case PosBitmap.KindArray =>
          val arr = payloads(i).asInstanceOf[Array[Short]]
          out.putInt(arr.length)
          var j = 0
          while (j < arr.length) { out.putShort(arr(j)); j += 1 }
        case _ =>
          val words = payloads(i).asInstanceOf[Array[Long]]
          out.putInt(words.length)
          var j = 0
          while (j < words.length) { out.putLong(words(j)); j += 1 }
      }
      i += 1
    }
    out.array()
  }
}

/** Growable PRIMITIVE long buffer (manual doubling) — 8 B/entry flat,
  * where `ArrayBuffer[Long]` boxes every element (~24+ B each): the
  * delta writer buffers one of these per covered file until task commit,
  * so a large MoR DELETE stays at true 8 B/tombstone executor heap. */
private[catalog] final class LongVec(initialCapacity: Int = 64) {
  private var arr = new Array[Long](math.max(1, initialCapacity))
  private var n = 0
  def add(v: Long): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
    arr(n) = v
    n += 1
  }
  def length: Int = n
  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, n)
}

object PosBitmap {

  private[catalog] val Magic = 0x47524254 // "GRBT"
  private[catalog] val KindArray: Byte = 0
  private[catalog] val KindBitmap: Byte = 1
  private[catalog] val BitmapWords = 1024 // 2^16 bits
  /** An array container past this many entries re-encodes as a bitmap
    * (the roaring threshold: 4096 shorts = the 8 KiB bitmap). */
  private[catalog] val ArrayMax = 4096

  /** Build from UNSORTED positions (the delta writer's arrival order). */
  def fromPositions(positions: Array[Long]): PosBitmap = {
    if (positions.isEmpty) return new PosBitmap(Array.empty, Array.empty,
      Array.empty)
    val sorted = positions.clone()
    java.util.Arrays.sort(sorted)
    val keys = scala.collection.mutable.ArrayBuffer.empty[Long]
    val kinds = scala.collection.mutable.ArrayBuffer.empty[Byte]
    val payloads = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < sorted.length) {
      val key = sorted(i) >>> 16
      var end = i
      while (end < sorted.length && (sorted(end) >>> 16) == key) end += 1
      val count = end - i // includes duplicates; dedup below
      keys += key
      if (count <= ArrayMax) {
        val buf = new Array[Short](count)
        var n = 0
        var j = i
        var last = -1
        while (j < end) {
          val low = (sorted(j) & 0xFFFFL).toInt
          if (low != last) { buf(n) = low.toShort; n += 1; last = low }
          j += 1
        }
        kinds += KindArray
        payloads += java.util.Arrays.copyOf(buf, n)
      } else {
        val words = new Array[Long](BitmapWords)
        var j = i
        while (j < end) {
          val low = (sorted(j) & 0xFFFFL).toInt
          words(low >>> 6) |= 1L << (low & 63)
          j += 1
        }
        kinds += KindBitmap
        payloads += words
      }
      i = end
    }
    new PosBitmap(keys.toArray, kinds.toArray, payloads.toArray)
  }

  def deserialize(bytes: Array[Byte]): PosBitmap = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    require(in.getInt() == Magic,
      "graft delete-vector bitmap: bad magic (foreign or corrupt payload)")
    val n = in.getInt()
    val keys = new Array[Long](n)
    val kinds = new Array[Byte](n)
    val payloads = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      keys(i) = in.getLong()
      kinds(i) = in.get()
      val len = in.getInt()
      if (kinds(i) == KindArray) {
        val arr = new Array[Short](len)
        var j = 0
        while (j < len) { arr(j) = in.getShort(); j += 1 }
        payloads(i) = arr
      } else {
        require(len == BitmapWords,
          s"graft delete-vector bitmap: bad container length $len")
        val words = new Array[Long](len)
        var j = 0
        while (j < len) { words(j) = in.getLong(); j += 1 }
        payloads(i) = words
      }
      i += 1
    }
    new PosBitmap(keys, kinds, payloads)
  }

  /** Decode to sorted positions (the non-catalog read path's anti-join
    * input — |positions|-scale, only materialized where a DataFrame of
    * tombstones is genuinely needed). */
  def positionsOf(bm: PosBitmap): Array[Long] = {
    val card = bm.cardinality
    // unreachable for parquet files today (row counts fit an Int), but a
    // silent toInt overflow would mis-size the array — fail loudly
    require(card <= Int.MaxValue,
      s"positionsOf: $card tombstones exceed one array (decode per container)")
    val out = new Array[Long](card.toInt)
    var n = 0
    var i = 0
    while (i < bm.containerCount) {
      val base = bm.keyAt(i) << 16
      bm.kindAt(i) match {
        case KindArray =>
          val arr = bm.payloadAt(i).asInstanceOf[Array[Short]]
          var j = 0
          while (j < arr.length) { out(n) = base | (arr(j) & 0xFFFFL); n += 1; j += 1 }
        case _ =>
          val words = bm.payloadAt(i).asInstanceOf[Array[Long]]
          var w = 0
          while (w < words.length) {
            var bits = words(w)
            while (bits != 0L) {
              val b = java.lang.Long.numberOfTrailingZeros(bits)
              out(n) = base | (w.toLong << 6) | b.toLong
              n += 1
              bits &= bits - 1
            }
            w += 1
          }
      }
      i += 1
    }
    out
  }
}
