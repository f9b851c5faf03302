package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector exposing the reference's CHUNK model as a Spark
  * source: `spark.read.format("graft-chunks").option("recordsPerChunk", n)
  * .load(dir)` yields `(chunk_id INT, value STRING)` where every input
  * partition IS one reference chunk — a run of `recordsPerChunk`
  * consecutive lines of one file with a globally sequential id.
  *
  * Reference semantics reproduced exactly
  * (`framework-src/MasterNode.java:89-127` splitInputFile;
  * `framework-src/Chunk.java:16-28`; directory fan-in
  * `framework-src/Communicator.java:180-183`):
  *  - lines group per file into chunks of `recordsPerChunk`;
  *  - chunk ids are assigned from one global counter across files
  *    (`MasterNode.assignChunkID`);
  *  - a file whose line count divides evenly creates — and numbers — a
  *    trailing EMPTY chunk (the reference's split loop opens a fresh chunk
  *    on every boundary and unconditionally ships the last one); we skip
  *    the empty partition but consume its id, so numbering matches.
  * One deliberate divergence (SURVEY §1.3 policy): files are processed in
  * NAME order, not directory-listing order — the reference's listing order
  * is filesystem-dependent, i.e. nondeterministic.
  *
  * Scale design (the reference's master reads every file line-by-line on
  * one node to split it — `MasterNode.java:89-126`; we keep the chunk
  * CONTRACT but not that cost):
  *  - the per-file layout (line count + the byte offset of each chunk's
  *    first line) is computed by ONE distributed Spark job, one task per
  *    file — the driver loops only over per-file summaries;
  *  - layouts are memoized per (path, listing fingerprint, recordsPerChunk),
  *    so repeated queries over the same data plan from metadata alone;
  *  - readers SEEK to their chunk's byte offset — no re-reading a file
  *    from line 0 per chunk (was O(chunks²) line reads per file);
  *  - `chunk_id` predicates push down to partition pruning, and a
  *    `value`-pruned scan (e.g. per-chunk counts) emits rows without
  *    opening the files at all (line counts are exact from planning).
  */
class ChunkTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-chunks"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkTextSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-chunks: path is required"))
    new ChunkTable(path, opts.getInt("recordsPerChunk", 1000))
  }
}

object ChunkTextSource {
  val schema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** Per-file chunk layout: total line count, total byte length, and the
    * byte offset of the first line of each (non-empty) chunk, in chunk
    * order. */
  private[graft] case class FileLayout(file: String, lines: Long,
      byteLen: Long, chunkStartBytes: Array[Long])

  private case class LayoutKey(path: String, recPerChunk: Int,
      fingerprint: Long)

  /** Memoized split lists. Keyed on a metadata fingerprint (names, sizes,
    * mtimes) so a changed directory re-plans; bounded LRU so long sessions
    * over many inputs don't grow without limit. */
  private val layoutCache =
    new java.util.LinkedHashMap[LayoutKey, Seq[FileLayout]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LayoutKey, Seq[FileLayout]]): Boolean =
        size() > 128
    }

  private[sources] def listFiles(path: String): Seq[Path] = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      // A NON-EMPTY _SUCCESS file is a graft-tsv commit manifest: it lists
      // exactly the committed part files, so stray files from a crashed or
      // concurrent job commit are invisible. An EMPTY _SUCCESS (Hadoop's
      // plain marker) imposes no restriction.
      val success = p.resolve("_SUCCESS")
      val manifest: Option[Set[String]] =
        if (Files.isRegularFile(success)) {
          // `#`-prefixed lines are sink metadata (the streaming commit's
          // `#epochs:` ledger), not file names. A manifest with ONLY
          // metadata lines is still a restriction (an empty committed
          // snapshot hides stray files); a zero-byte Hadoop marker is not.
          val names = Files.readAllLines(success).asScala.filter(_.nonEmpty)
          if (names.nonEmpty) Some(names.filterNot(_.startsWith("#")).toSet)
          else None
        } else None
      val listing = Files.list(p)
      try listing.iterator().asScala.toSeq
        .filter(f => Files.isRegularFile(f) &&
          !f.getFileName.toString.startsWith(".") &&
          !f.getFileName.toString.startsWith("_") &&
          manifest.forall(_.contains(f.getFileName.toString)))
        .sortBy(_.getFileName.toString)
      finally listing.close()
    } else Seq(p)
  }

  /** File layouts for `path`, computed distributed on a cache miss: one
    * Spark task per file scans bytes once, recording line count and the
    * offsets of chunk-boundary lines (a fixed few words per chunk — the
    * task output is proportional to chunks, not lines). */
  private[sources] def layouts(path: String, recPerChunk: Int): Seq[FileLayout] = {
    val files = listFiles(path)
    val fp = files.foldLeft(17L) { (h, f) =>
      ((h * 31 + f.getFileName.toString.hashCode) * 31 +
        Files.size(f)) * 31 + Files.getLastModifiedTime(f).toMillis
    }
    val key = LayoutKey(path, recPerChunk, fp)
    layoutCache.synchronized(Option(layoutCache.get(key))) match {
      case Some(cached) => cached
      case None =>
        val names = files.map(_.toString)
        val nameIdx = names.zipWithIndex.toMap
        val computed: Seq[FileLayout] =
          if (names.isEmpty) Seq.empty
          else SparkSession.active.sparkContext
            .parallelize(names, names.size)
            .map(f => analyzeFile(f, recPerChunk))
            // planning metadata, not data: one fixed-size summary PER FILE
            // (line count + chunk offsets) comes back to the driver — the
            // per-line work stays on the executors
            .collect().toSeq.sortBy(l => nameIdx(l.file))
        layoutCache.synchronized(layoutCache.put(key, computed))
        computed
    }
  }

  /** Enumerate every chunk of `path` with its global id (empty trailing
    * chunks consume an id but yield no partition — the reference's
    * even-division quirk), plus the total id count. A per-FILE driver loop
    * over memoized (line count, offsets) summaries; file contents are
    * never touched. Shared by the batch scan and the micro-batch stream. */
  private[sources] def enumerateChunks(path: String, recPerChunk: Int)
      : (Array[ChunkPartition], Long) = {
    var nextId = 0
    val parts = Array.newBuilder[ChunkPartition]
    for (l <- layouts(path, recPerChunk)) {
      val starts = l.chunkStartBytes
      var k = 0
      while (k < starts.length) {
        val startLine = k.toLong * recPerChunk
        val n = math.min(recPerChunk.toLong, l.lines - startLine)
        val end = if (k + 1 < starts.length) starts(k + 1) else l.byteLen
        parts += ChunkPartition(l.file, starts(k), n, end - starts(k), nextId)
        nextId += 1
        k += 1
      }
      if (l.lines % recPerChunk == 0) nextId += 1 // numbered empty chunk
    }
    (parts.result(), nextId.toLong)
  }

  /** One sequential byte pass over a file (runs on an executor). Line
    * terminator semantics match `BufferedReader.readLine` — `\n`, `\r`,
    * `\r\n` — which is how both the reference's master and our readers
    * consume the file; byte-level scanning sidesteps charset decoding
    * (malformed UTF-8 cannot contain a 0x0A/0x0D byte mid-sequence). */
  private[graft] def analyzeFile(file: String, recPerChunk: Int): FileLayout = {
    val in = new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(file)), 1 << 16)
    try {
      val starts = Array.newBuilder[Long]
      var lines = 0L
      var pos = 0L
      var atLineStart = true
      var prevCR = false
      var b = in.read()
      while (b != -1) {
        if (prevCR && b == '\n') {
          // second byte of a \r\n pair: not a new line
          prevCR = false
          atLineStart = true
        } else {
          if (atLineStart) {
            if (lines % recPerChunk == 0) starts += pos
            lines += 1
            atLineStart = false
          }
          if (b == '\n') { atLineStart = true; prevCR = false }
          else if (b == '\r') { atLineStart = true; prevCR = true }
          else prevCR = false
        }
        pos += 1
        b = in.read()
      }
      FileLayout(file, lines, pos, starts.result())
    } finally in.close()
  }
}

/** One reference chunk: `numLines` lines (`numBytes` bytes) of `file`
  * starting at byte `startByte` (a line-start offset recorded at
  * planning), carrying its global `chunkId`. */
case class ChunkPartition(file: String, startByte: Long, numLines: Long,
    numBytes: Long, chunkId: Int) extends InputPartition

class ChunkTable(path: String, recPerChunk: Int) extends Table with SupportsRead {
  require(recPerChunk > 0, s"recordsPerChunk must be positive: $recPerChunk")

  override def name(): String = s"graft-chunks(`$path`)"
  override def schema(): StructType = ChunkTextSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChunkScanBuilder(path, recPerChunk, name())
}

/** Scan over the memoized chunk layout with two pushdowns:
  *  - column pruning: a `value`-pruned scan never opens the files
  *    (line counts are exact from planning) — chunk-count queries are
  *    metadata-only;
  *  - `chunk_id` filters prune PARTITIONS (the id is constant per chunk,
  *    so partition-level evaluation is exact and nothing is re-filtered
  *    post-scan). */
private[sources] class ChunkScanBuilder(path: String, recPerChunk: Int,
    tableName: String) extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  private var required: StructType = ChunkTextSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def description(): String =
    s"$tableName PushedFilters: ${pushed.mkString("[", ", ", "]")}"
  override def toBatch: Batch = this

  /** Accept `chunk_id` predicates we can decide per-partition; everything
    * else stays residual for Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(chunkIdPredicate(_).isDefined)
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def chunkIdPredicate(f: Filter): Option[Int => Boolean] = f match {
    case EqualTo("chunk_id", v: Number) =>
      val n = v.intValue; Some(_ == n)
    case In("chunk_id", vs) if vs.forall(_.isInstanceOf[Number]) =>
      val set = vs.map(_.asInstanceOf[Number].intValue).toSet
      Some(set.contains)
    case GreaterThan("chunk_id", v: Number) =>
      val n = v.intValue; Some(_ > n)
    case GreaterThanOrEqual("chunk_id", v: Number) =>
      val n = v.intValue; Some(_ >= n)
    case LessThan("chunk_id", v: Number) =>
      val n = v.intValue; Some(_ < n)
    case LessThanOrEqual("chunk_id", v: Number) =>
      val n = v.intValue; Some(_ <= n)
    case _ => None
  }

  /** Planned partitions = enumerated chunks surviving chunk_id pushdown. */
  private def plannedChunks(): Array[ChunkPartition] = {
    val keep: Int => Boolean = {
      val preds = pushed.flatMap(chunkIdPredicate)
      id => preds.forall(_(id))
    }
    ChunkTextSource.enumerateChunks(path, recPerChunk)._1
      .filter(p => keep(p.chunkId))
  }

  override def planInputPartitions(): Array[InputPartition] =
    plannedChunks().toArray[InputPartition]

  /** Pruning-aware statistics from the memoized layouts: exact row and
    * byte totals of the PLANNED partitions (chunk_id pushdown shrinks
    * them), so Catalyst sizes chunk scans from real numbers — e.g. a
    * filtered chunk table on a join's build side can qualify for
    * broadcast. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val parts = plannedChunks()
    val rows = parts.map(_.numLines).sum
    val bytes = parts.map(_.numBytes).sum
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChunkReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ChunkMicroBatchStream(path, recPerChunk, required.fieldNames)
}

/** Micro-batch streaming over the chunk store: the OFFSET is the global
  * chunk-id counter, so a batch is a contiguous id range [start, end) and
  * the reference's ingestion model ("the master splits newly arrived files
  * into chunks and hands them out") becomes a Structured Streaming source.
  * Each trigger re-lists the directory (memoized per listing fingerprint —
  * an unchanged directory re-plans from metadata alone) and any NEW files'
  * chunks extend the id sequence. Exactly-once follows from id
  * determinism: ids replay identically from a checkpointed offset as long
  * as ingestion is append-only in NAME order (monotonically named files —
  * the same contract the reference's deterministic-order fix imposes,
  * since a file sorting before existing ones would renumber history). */
private[sources] class ChunkMicroBatchStream(path: String, recPerChunk: Int,
    fields: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class ChunkOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }

  override def initialOffset(): Offset = ChunkOffset(0L)

  override def latestOffset(): Offset =
    ChunkOffset(ChunkTextSource.enumerateChunks(path, recPerChunk)._2)

  override def deserializeOffset(json: String): Offset =
    ChunkOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[ChunkOffset].n
    val hi = end.asInstanceOf[ChunkOffset].n
    ChunkTextSource.enumerateChunks(path, recPerChunk)._1
      .filter(p => p.chunkId >= lo && p.chunkId < hi)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChunkReaderFactory(fields)

  override def stop(): Unit = ()
}

private[sources] object ChunkLineIO {
  /** UTF-8 reader with REPLACE on malformed bytes — `spark.read.text`
    * semantics (Hadoop's Text decoding): one bad byte in one file must
    * degrade to U+FFFD, not fail the whole scan (the strict `Files.lines`
    * would throw MalformedInputException). Seeks to `startByte` (always a
    * line-start boundary recorded at planning) before decoding begins. */
  def lenientReader(f: Path, startByte: Long): java.io.BufferedReader = {
    val in = Files.newInputStream(f)
    try in.skipNBytes(startByte)
    catch { case t: Throwable => in.close(); throw t }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    new java.io.BufferedReader(new java.io.InputStreamReader(in, dec))
  }
}

case class ChunkReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ChunkReader(p.asInstanceOf[ChunkPartition], fields)
}

/** Streams one chunk: seek to the chunk's byte offset, emit `numLines`
  * records in the pruned column order. With `value` pruned the file is
  * never opened — the planner's line counts stand in for the rows. */
class ChunkReader(cp: ChunkPartition, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val wantValue = fields.contains("value")
  private val br: java.io.BufferedReader =
    if (wantValue) ChunkLineIO.lenientReader(Paths.get(cp.file), cp.startByte)
    else null
  private var remaining = cp.numLines
  private var current: String = _

  override def next(): Boolean =
    if (remaining <= 0) false
    else if (!wantValue) { remaining -= 1; true }
    else {
      current = br.readLine()
      remaining -= 1
      current != null
    }

  override def get(): InternalRow = {
    // tight per-row path: no iterator/Seq allocation per record
    val vals = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      vals(i) =
        if (fields(i) == "chunk_id") cp.chunkId
        else UTF8String.fromString(current)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }

  override def close(): Unit = if (br != null) br.close()
}
