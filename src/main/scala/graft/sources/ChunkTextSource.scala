package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
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
  * Scale note: planning reads each file once on the driver to count lines
  * — exactly what the reference's master does when it splits and ships
  * chunks. That is the faithful facade, not the 100 TB path; at scale the
  * line-count contract must be dropped for byte-range splits (Spark's own
  * text source), which the reference cannot express.
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
}

/** One reference chunk: `numLines` lines of `file` starting at line
  * `startLine` (0-based), carrying its global `chunkId`. */
case class ChunkPartition(file: String, startLine: Long, numLines: Long,
    chunkId: Int) extends InputPartition

class ChunkTable(path: String, recPerChunk: Int) extends Table with SupportsRead {
  require(recPerChunk > 0, s"recordsPerChunk must be positive: $recPerChunk")

  override def name(): String = s"graft-chunks(`$path`)"
  override def schema(): StructType = ChunkTextSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      // Column pruning pushdown: a chunk-count query (`groupBy(chunk_id)`)
      // must not materialize a UTF8String per line. The planner still has
      // to WALK every line (chunk boundaries are record-count-defined),
      // but a pruned `value` skips per-row string allocation.
      private var required: StructType = ChunkTextSource.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def description(): String = name()
      override def toBatch: Batch = this

      /** Driver-side split, mirroring `MasterNode.splitInputFile`: one pass
        * per file counting records, chunk ids advancing globally. Empty
        * trailing chunks consume an id but plan no partition. */
      override def planInputPartitions(): Array[InputPartition] = {
        val p = Paths.get(path)
        val files: Seq[Path] =
          if (Files.isDirectory(p)) {
            val listing = Files.list(p)
            try listing.iterator().asScala.toSeq
              .filter(f => Files.isRegularFile(f) &&
                !f.getFileName.toString.startsWith(".") &&
                !f.getFileName.toString.startsWith("_"))
              .sortBy(_.getFileName.toString)
            finally listing.close()
          } else Seq(p)
        var nextId = 0
        val parts = Seq.newBuilder[InputPartition]
        for (f <- files) {
          val lines = countLines(f)
          var start = 0L
          while (start < lines) {
            val n = math.min(recPerChunk.toLong, lines - start)
            parts += ChunkPartition(f.toString, start, n, nextId)
            nextId += 1
            start += n
          }
          // the reference numbers a trailing empty chunk when the file
          // length divides evenly (and for an empty file)
          if (lines % recPerChunk == 0) nextId += 1
        }
        parts.result().toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        ChunkReaderFactory(required.fieldNames)
    }

  private def countLines(f: Path): Long = {
    val r = ChunkLineIO.lenientReader(f)
    try {
      var n = 0L
      while (r.readLine() != null) n += 1
      n
    } finally r.close()
  }
}

private[sources] object ChunkLineIO {
  /** UTF-8 reader with REPLACE on malformed bytes — `spark.read.text`
    * semantics (Hadoop's Text decoding): one bad byte in one file must
    * degrade to U+FFFD, not fail the whole scan (the strict `Files.lines`
    * would throw MalformedInputException). */
  def lenientReader(f: Path): java.io.BufferedReader = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(Files.newInputStream(f), dec))
  }
}

case class ChunkReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ChunkReader(p.asInstanceOf[ChunkPartition], fields)
}

/** Streams one chunk: skip to `startLine`, emit `numLines` records in the
  * pruned column order. Lines are always walked (chunk boundaries are
  * record-count-defined) but a pruned `value` skips string conversion. */
class ChunkReader(cp: ChunkPartition, fields: Array[String])
    extends PartitionReader[InternalRow] {
  // fd-safe skip: if seeking to startLine fails, the reader must not leak
  private val br = {
    val r = ChunkLineIO.lenientReader(Paths.get(cp.file))
    try { (0L until cp.startLine).foreach(_ => r.readLine()); r }
    catch { case t: Throwable => r.close(); throw t }
  }
  private var remaining = cp.numLines
  private var current: String = _

  override def next(): Boolean =
    if (remaining <= 0) false
    else {
      current = br.readLine()
      remaining -= 1
      current != null
    }

  override def get(): InternalRow =
    InternalRow(fields.map {
      case "chunk_id" => cp.chunkId
      case "value" => UTF8String.fromString(current)
    }.toIndexedSeq: _*)

  override def close(): Unit = br.close()
}
