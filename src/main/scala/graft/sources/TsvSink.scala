package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage, SupportsTruncate}
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
  * what makes the sink correct under task retry and speculative
  * execution on a 1000-executor cluster:
  *  - each task writes to a UNIQUE temp file (`_temporary/<uuid>`) —
  *    two attempts of the same partition can never clobber each other;
  *  - the task's `commit()` returns the temp path + final name as its
  *    commit message; only the driver's job-level `commit(messages)`
  *    MOVES the winning attempt of each partition into place (atomic
  *    rename on a real filesystem), so exactly one attempt per
  *    partition is ever visible;
  *  - `abort()` (task or job level) deletes temp files, leaving the
  *    target directory untouched — a failed job is invisible.
  * Output naming is the reference's file-per-reducer shape:
  * `part-<partitionId>.tsv`. NULL fields serialize as the empty string
  * (the reference never emits nulls; the choice is documented, not
  * load-bearing).
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
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

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
    }
  }
}

private[sources] case class TsvCommit(tempPath: String, finalName: String)
    extends WriterCommitMessage

private[sources] class TsvBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = TsvWriterFactory(path, schema.length)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) {
      val old = Files.list(dir).iterator()
      while (old.hasNext) {
        val p = old.next()
        if (p.getFileName.toString.startsWith("part-")) Files.delete(p)
      }
    }
    messages.foreach { case TsvCommit(temp, finalName) =>
      Files.move(Paths.get(temp), dir.resolve(finalName),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    cleanTemp()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case TsvCommit(temp, _) => Files.deleteIfExists(Paths.get(temp))
      case _ =>
    }
    cleanTemp()
  }

  private def cleanTemp(): Unit = {
    val tmp = Paths.get(path, "_temporary")
    if (Files.isDirectory(tmp)) {
      val it = Files.list(tmp).iterator()
      if (!it.hasNext) Files.delete(tmp)
    }
  }
}

private[sources] case class TsvWriterFactory(path: String, nFields: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
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
      if (!row.isNullAt(i)) sb.append(row.getString(i))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TsvCommit(temp.toString, f"part-$partitionId%05d.tsv")
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(temp)
  }

  override def close(): Unit = ()
}
