package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage, SupportsTruncate}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE path: the reference's TSV sink (one tab-separated
  * file per reducer — framework-src/ReduceRunner.java:154-172 writes
  * `key\tvalue` lines to its own part file) re-expressed through Spark's
  * batch-write protocol, completing the connector tier's third leg
  * (batch read + micro-batch stream in `ChunkTextSource`, batch write
  * here).
  *
  * The part that matters at scale is the COMMIT/ABORT contract, which is
  * what makes the sink correct under task retry, speculative execution,
  * AND a driver crash mid-commit on a 1000-executor cluster:
  *  - each task writes to a UNIQUE temp file (`_temporary/<uuid>`) —
  *    two attempts of the same partition can never clobber each other;
  *  - the task's `commit()` returns the temp path + partition id as its
  *    commit message; the driver's job-level `commit(messages)` MOVES the
  *    winning attempt of each partition to an ATTEMPT-UNIQUE final name
  *    (`part-<pid>-<jobTag>.tsv` — a crashed earlier commit's leftovers
  *    can never be confused with this job's files), then atomically
  *    renames a manifest listing exactly those files onto `_SUCCESS`;
  *  - the `_SUCCESS` manifest IS the commit point: readers (the
  *    `graft-chunks` source) that find a non-empty manifest read ONLY the
  *    files it lists, so a driver crash anywhere before the manifest
  *    rename leaves the PREVIOUS committed state visible and the new
  *    half-renamed files invisible — snapshot semantics from two atomic
  *    renames, no distributed coordination;
  *  - `abort()` (task or job level) deletes temp files, leaving the
  *    target directory untouched — a failed job is invisible.
  * Read-during-commit caveat (documented, not defended): a reader that
  * loads the OLD manifest in the instant before a truncating commit's
  * swap may find its listed files garbage-collected moments later —
  * overwrite-while-reading needs generation-numbered directories, which
  * is a warehouse-layout concern above this sink. Readers that start
  * after the swap always see a consistent snapshot.
  * SINGLE-WRITER assumption (documented, not defended): two jobs
  * committing into the same directory concurrently race on the
  * read-manifest → write-manifest window — committer A can carry a
  * stale listing that omits B's just-committed files and then GC them.
  * One writer per directory at a time is the contract, same as the
  * reference's one-job-per-output-dir layout (Driver.java assigns each
  * job its own reducer output directory); concurrent multi-writer
  * commit needs a log-structured table format (Delta/Iceberg-style),
  * which is above this sink.
  * Values are escaped (`\` `\t` `\n` `\r` → backslash sequences, see
  * [[TsvEscape]]) so arbitrary strings survive the tab-separated,
  * line-oriented layout; the reference never emits such values, so on its
  * own outputs the escaping is byte-invisible. NULL fields serialize as
  * the empty string. Output naming keeps the reference's file-per-reducer
  * shape with the attempt tag appended.
  */
class TsvSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"

  // write-only source: there is nothing to infer on the read side
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  // the write schema is the incoming DataFrame's — let it flow into
  // getTable instead of validating against the (empty) inferred one
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tsv: path is required"))
    new TsvTable(path, schema)
  }
}

private[sources] class TsvTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  // plain path, no decoration: the V2 write path parses the table name
  // as an attribute identifier, where backticks/parens are syntax errors
  override def name(): String = path
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TsvWriteBuilder(path, info.schema(), truncate = false)
}

private[sources] class TsvWriteBuilder(path: String, schema: StructType,
    truncate: Boolean) extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new TsvWriteBuilder(path, schema, truncate = true)

  override def build(): Write = {
    // the reference sink's contract is textual key\tvalue — require the
    // caller to cast (a silent toString of arbitrary types would bake
    // Spark's internal formatting into the file format)
    require(schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.StringType),
      s"graft-tsv writes string columns only; cast first (got ${schema.sql})")
    new Write {
      override def toBatch: BatchWrite = new TsvBatchWrite(path, schema, truncate)
      override def toStreaming: StreamingWrite =
        new TsvStreamingWrite(path, schema)
    }
  }
}

/** Escaping that makes arbitrary strings representable in a tab-separated,
  * line-oriented file: `\` `\t` `\n` `\r` become two-character backslash
  * sequences. Invertible (`unescape(escape(s)) == s`) and identity on
  * strings without those characters — the reference's own outputs are
  * byte-unchanged. */
object TsvEscape {
  def escape(s: String): String =
    if (s.indexOf('\\') < 0 && s.indexOf('\t') < 0 &&
      s.indexOf('\n') < 0 && s.indexOf('\r') < 0) s
    else {
      val sb = new StringBuilder(s.length + 8)
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' => sb.append("\\\\")
          case '\t' => sb.append("\\t")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case c    => sb.append(c)
        }
        i += 1
      }
      sb.toString
    }

  def unescape(s: String): String =
    if (s.indexOf('\\') < 0) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '\\' => sb.append('\\')
            case 't'  => sb.append('\t')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case o    => sb.append('\\').append(o) // unknown: literal
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
}

private[sources] case class TsvCommit(tempPath: String, partitionId: Int)
    extends WriterCommitMessage

/** The commit protocol shared by the batch and streaming writes. One
  * manifest format serves both: file-name lines plus an optional
  * `#epochs:<id,...>` metadata line — the STREAMING EPOCH LEDGER. The
  * ledger rides the SAME atomic manifest rename as the file list, so
  * "which files are committed" and "which epochs are committed" can never
  * disagree: a crash after the task renames but before the manifest swap
  * leaves the epoch unrecorded AND its files unreferenced (invisible to
  * readers, GC'd by the next commit); Spark's re-delivery of that epoch
  * then commits it exactly once. A re-delivered ALREADY-LEDGERED epoch
  * drops its attempt files and returns — idempotent, the streaming
  * contract (`ReduceRunner.java:113-122`'s sink, completed on the
  * streaming half of the engine). */
private[sources] object TsvCommitProtocol {
  import scala.jdk.CollectionConverters._

  private[sources] case class Manifest(files: Seq[String], epochs: Set[Long])

  private[sources] def readManifest(success: Path): Manifest = {
    val lines = Files.readAllLines(success).asScala.toSeq.filter(_.nonEmpty)
    val epochs = lines.filter(_.startsWith("#epochs:"))
      .flatMap(_.stripPrefix("#epochs:").split(',').toSeq)
      .filter(_.nonEmpty).map(_.toLong).toSet
    Manifest(lines.filterNot(_.startsWith("#")), epochs)
  }

  /** Job-level commit: `epoch = None` for a batch job, `Some(id)` for a
    * streaming epoch (always append semantics across epochs). */
  def commit(path: String, messages: Array[WriterCommitMessage],
      truncate: Boolean, epoch: Option[Long]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val success = dir.resolve("_SUCCESS")
    val prev =
      if (Files.isRegularFile(success)) Some(readManifest(success)) else None
    // 0. Idempotent epoch re-delivery: the ledger already records this
    //    epoch, so its files are committed — this attempt's temps are a
    //    duplicate; drop them and leave the snapshot untouched.
    if (epoch.exists(e => prev.exists(_.epochs.contains(e)))) {
      abort(path, messages)
      return
    }
    // 1. Move winners to ATTEMPT-UNIQUE final names. Nothing is committed
    //    yet: until the manifest rename below, readers still see the
    //    previous manifest's files (or nothing, for a fresh directory).
    val jobTag = UUID.randomUUID().toString.take(8)
    val epochTag = epoch.map(e => s"e$e-").getOrElse("")
    val newFiles = messages.map { case TsvCommit(temp, pid) =>
      val name = f"part-$pid%05d-$epochTag$jobTag.tsv"
      Files.move(Paths.get(temp), dir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      name
    }.sorted
    // 2. Compose the manifest: this job's files, plus — in append mode —
    //    the surviving files of the previous committed state. A directory
    //    with committed data but NO (or an empty, Hadoop-marker-style)
    //    manifest — e.g. written by an older sink version or a plain
    //    Hadoop committer — must not lose that data to step 4's GC: seed
    //    the carry-over from the part-* files actually present instead.
    val newSet = newFiles.toSet
    val carried: Seq[String] =
      if (truncate) Seq.empty
      else prev.map(_.files) match {
        case Some(fromManifest) if fromManifest.nonEmpty =>
          fromManifest.filter(n => Files.isRegularFile(dir.resolve(n)))
        case _ =>
          Files.list(dir).iterator().asScala
            .map(_.getFileName.toString)
            .filter(n => n.startsWith("part-") && !newSet.contains(n))
            .toSeq
      }
    val files = (carried ++ newFiles).distinct.sorted
    val epochs = (if (truncate) Set.empty[Long]
      else prev.map(_.epochs).getOrElse(Set.empty)) ++ epoch
    val lines = files ++ (if (epochs.isEmpty) Seq.empty
      else Seq("#epochs:" + epochs.toSeq.sorted.mkString(",")))
    // 3. THE commit point: atomic rename of the manifest onto _SUCCESS —
    //    file list and epoch ledger land together or not at all.
    val mTmp = dir.resolve(s"_temporary-manifest-$jobTag")
    Files.write(mTmp, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.move(mTmp, success,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    // 4. Garbage-collect part files the new manifest doesn't reference
    //    (truncated previous state, crashed-commit leftovers). Best-effort:
    //    a crash here leaves stray files that the manifest already hides.
    val keep = files.toSet
    val listing = Files.list(dir).iterator()
    while (listing.hasNext) {
      val p = listing.next()
      val n = p.getFileName.toString
      if (n.startsWith("part-") && !keep.contains(n)) Files.deleteIfExists(p)
    }
    cleanTemp(path)
  }

  def abort(path: String, messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case TsvCommit(temp, _) => Files.deleteIfExists(Paths.get(temp))
      case _ =>
    }
    cleanTemp(path)
  }

  private def cleanTemp(path: String): Unit = {
    val tmp = Paths.get(path, "_temporary")
    if (Files.isDirectory(tmp)) {
      val it = Files.list(tmp).iterator()
      if (!it.hasNext) Files.delete(tmp)
    }
  }
}

private[sources] class TsvBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = TsvWriterFactory(path, schema.length)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    TsvCommitProtocol.commit(path, messages, truncate, epoch = None)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    TsvCommitProtocol.abort(path, messages)
}

/** The STREAMING write: each micro-batch commits as one epoch through
  * [[TsvCommitProtocol]] with append semantics across epochs — the
  * manifest accumulates every epoch's files, and the atomic epoch ledger
  * makes re-delivered epochs no-ops (crash-mid-epoch recovery re-runs
  * the epoch; whichever attempt reaches the manifest rename first wins,
  * and the loser's files are dropped). Task-level mechanics (attempt-
  * unique temps, speculative twins) are the batch writer's, reused. */
private[sources] class TsvStreamingWrite(path: String, schema: StructType)
    extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = TsvWriterFactory(path, schema.length)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    TsvCommitProtocol.commit(path, messages, truncate = false,
      epoch = Some(epochId))

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    TsvCommitProtocol.abort(path, messages)
}

private[sources] case class TsvWriterFactory(path: String, nFields: Int)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new TsvWriter(path, nFields, partitionId)

  // streaming tasks write the same attempt-unique temps; the epoch enters
  // at JOB-level commit, so the writer itself is epoch-oblivious
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new TsvWriter(path, nFields, partitionId)
}

private[sources] class TsvWriter(path: String, nFields: Int, partitionId: Int)
    extends DataWriter[InternalRow] {

  private val tempDir: Path = {
    val d = Paths.get(path, "_temporary")
    Files.createDirectories(d)
    d
  }
  // unique per ATTEMPT: a speculative second attempt of this partition
  // writes its own file; job commit moves exactly one of them
  private val temp: Path = tempDir.resolve(UUID.randomUUID().toString)
  private val out = Files.newBufferedWriter(temp)

  override def write(row: InternalRow): Unit = {
    var i = 0
    val sb = new StringBuilder
    while (i < nFields) {
      if (i > 0) sb.append('\t')
      if (!row.isNullAt(i)) sb.append(TsvEscape.escape(row.getString(i)))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TsvCommit(temp.toString, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(temp)
  }

  override def close(): Unit = ()
}
