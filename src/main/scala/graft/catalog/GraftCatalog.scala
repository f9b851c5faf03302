package graft.catalog

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import graft.sources.SnapshotStore
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{Identifier, MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo, LogicalWriteInfoImpl, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetWrite
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** Spark V2 `TableCatalog` over [[SnapshotStore]] — the snapshot layer
  * surfaced to Spark's OWN analyzer/planner as `spark.sql.catalog.graft`,
  * so SQL against snapshot tables needs ZERO plan substitution or
  * name→root maps:
  *
  *  - `SELECT ... FROM graft.t` resolves through [[GraftCatalog.loadTable]]
  *    to the latest committed manifest; `VERSION AS OF n` resolves through
  *    the `loadTable(ident, version)` overload — time travel is Spark's
  *    native syntax, not an interpreter;
  *  - `MERGE INTO / UPDATE / DELETE FROM graft.t` go through
  *    [[SupportsRowLevelOperations]]: Spark's OWN group-based rewrite rules
  *    (`RewriteMergeIntoTable`/`RewriteUpdateTable`/`RewriteDeleteFromTable`)
  *    plan a copy-on-write `ReplaceData`, Spark's
  *    `RowLevelOperationRuntimeGroupFiltering` narrows the rewrite to the
  *    files that actually hold matching rows via a runtime `_file IN
  *    (subquery)` filter against [[SnapshotScan]] (the Iceberg/Delta
  *    group-filtering contract), and the replacement is published through
  *    ONE atomic manifest commit with first-writer-wins OCC
  *    ([[SnapshotBatchWrite.commit]]). MERGE cardinality violations raise
  *    through Spark's own `MergeRows` check;
  *  - `INSERT INTO graft.t` appends new files plus a manifest commit —
  *    never touching existing data files.
  *
  * Table roots are registered per session as dynamic conf
  * (`spark.sql.catalog.graft.path.<table> = <root>`, see
  * [[GraftCatalog.register]]): the catalog plugin is loaded once per
  * session but resolves roots from `SQLConf` at `loadTable` time, so
  * registrations are session-isolated and immediate. Unknown identifiers
  * raise `NoSuchTableException` (the analyzer's TABLE_OR_VIEW_NOT_FOUND),
  * never a silent fallback.
  *
  * At 100 TB: reads plan one split per `maxPartitionBytes` of manifest
  * files with footer-level predicate pushdown and zone pruning from the
  * commit-versioned stats sidecar; a row-level operation scans the table
  * once to discover affected files (the same O(table-scan) discovery
  * every group-based format pays), rewrites O(changed slice), and commits
  * one manifest rename. The reference has no catalog at all — its "table"
  * is a chunk directory resolved by the master's NameSpace
  * (`framework-src/NameSpace.java:11-19`); this is that name→data
  * resolution re-expressed as Spark's pluggable catalog contract.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def confKey(table: String) =
    s"spark.sql.catalog.$catalogName.path.$table"

  private def rootOf(ident: Identifier): Option[String] =
    if (ident.namespace().nonEmpty) None
    else SparkSession.active.conf.getOption(confKey(ident.name()))

  override def loadTable(ident: Identifier): Table = load(ident, -1)

  /** Native `VERSION AS OF`: the analyzer hands the version string here. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new NoSuchTableException(ident)
    }
    load(ident, v)
  }

  private def load(ident: Identifier, version: Int): Table = {
    val root = rootOf(ident).getOrElse(throw new NoSuchTableException(ident))
    val spark = SparkSession.active
    val versions = SnapshotStore.versions(spark, root)
    val v = if (version > 0) version else versions.lastOption.getOrElse(0)
    if (v <= 0 || !versions.contains(v)) throw new NoSuchTableException(ident)
    new SnapshotTable(spark, s"$catalogName.${ident.name()}", root, v)
  }

  override def tableExists(ident: Identifier): Boolean =
    rootOf(ident).exists(r =>
      SnapshotStore.versions(SparkSession.active, r).nonEmpty)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = s"spark.sql.catalog.$catalogName.path."
    SparkSession.active.conf.getAll.keys.toArray.collect {
      case k if k.startsWith(prefix) =>
        Identifier.of(Array.empty, k.stripPrefix(prefix))
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog: tables are created by committing a snapshot root " +
        "and registering it (GraftCatalog.register)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog: ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog: RENAME TABLE")
}

object GraftCatalog {

  /** Install the catalog (idempotent) and map `graft.<name>` to the
    * snapshot root — one dynamic conf each, session-isolated. */
  def register(spark: SparkSession, name: String, root: String,
      catalog: String = "graft"): Unit = {
    spark.conf.set(s"spark.sql.catalog.$catalog", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalog.path.$name", root)
  }

  def unregister(spark: SparkSession, name: String,
      catalog: String = "graft"): Unit =
    spark.conf.unset(s"spark.sql.catalog.$catalog.path.$name")
}

/** One committed snapshot version surfaced as a V2 table. The file list is
  * pinned at load time, so every scan and row-level operation on this
  * instance sees ONE consistent snapshot, and the OCC commit is based on
  * exactly this version (a concurrent committer conflicts, never
  * interleaves). */
class SnapshotTable(@transient val spark: SparkSession, tableName: String,
    val root: String, val snapVersion: Int)
  extends Table with SupportsRead with SupportsWrite
  with SupportsRowLevelOperations with SupportsMetadataColumns {

  val files: Seq[String] = SnapshotStore.files(spark, root, snapVersion)

  /** The version's delete vectors as uri-path → ASCENDING tombstoned row
    * positions — applied INSIDE the scan (a pointer walk against the
    * reader's in-order row ordinals), so merge-on-read tables read AND
    * mutate correctly through the catalog: a row-level rewrite sees only
    * live rows and can never resurrect a tombstone. Collected at load
    * (size ∝ tombstones; compaction bounds it — the same contract the
    * read-side anti-join has). */
  val tombstones: Map[String, Array[Long]] = {
    val dvs = SnapshotStore.deleteVectors(spark, root, snapVersion)
    if (dvs.isEmpty) Map.empty
    else spark.read.parquet(dvs: _*).collect()
      .groupBy(r => SnapshotStore.uriPath(r.getString(0)))
      .map { case (f, rows) =>
        f -> rows.map(_.getLong(1)).sorted
      }
  }

  override lazy val schema: StructType = spark.read.parquet(files: _*).schema

  override def name(): String = tableName

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(spark, this, None)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SnapshotWriteBuilder(spark, this, info, None)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new SnapshotRowLevelOperation(spark, SnapshotTable.this, info.command())
    }

  override def metadataColumns(): Array[MetadataColumn] =
    Array(SnapshotTable.FileColumn)
}

object SnapshotTable {

  /** The group id of group-based row-level operations: which data file a
    * row came from. NOT preserved into the write schema (the rewrite
    * writes pure data columns; the file identity only routes the runtime
    * group filter). */
  val FileColName = "_file"

  object FileColumn extends MetadataColumn {
    override def name(): String = FileColName
    override def dataType(): DataType = StringType
    override def isNullable: Boolean = false
    override def comment(): String =
      "manifest path of the data file the row came from"
    override def metadataInJSON(): String =
      """{"__preserve_on_delete":false,"__preserve_on_update":false,""" +
        """"__preserve_on_reinsert":false}"""
  }
}

/** Group-based COPY-ON-WRITE row-level operation: Spark's rewrite rules
  * read the table through [[newScanBuilder]] (with `_file` as the group
  * id), compute the replacement rows, and write them through
  * [[newWriteBuilder]]; the files the operation's scan ENDED UP planning —
  * after static zone pruning and the runtime `_file IN` group filter — are
  * exactly the files the commit replaces. */
class SnapshotRowLevelOperation(spark: SparkSession, table: SnapshotTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  @volatile private var opScan: Option[SnapshotScan] = None

  private[catalog] def attachScan(s: SnapshotScan): Unit = opScan = Some(s)

  /** The files whose rows went through the ReplaceData query — read at
    * commit time, AFTER runtime filtering and partition planning ran. */
  private[catalog] def replacedFiles: Seq[String] =
    opScan.map(_.currentFiles).getOrElse(table.files)

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(spark, table, Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SnapshotWriteBuilder(spark, table, info, Some(this))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(ColumnBridge.fieldReference(SnapshotTable.FileColName))
}

class SnapshotScanBuilder(spark: SparkSession, table: SnapshotTable,
    op: Option[SnapshotRowLevelOperation])
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = table.schema
  private var pushed: Array[Filter] = Array.empty

  /** Everything is returned as residual (Spark re-evaluates above the
    * scan); the accepted subset feeds parquet row-group skipping and the
    * manifest-stats zone pruning — best-effort by contract, so no filter
    * may be claimed as exact. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filterNot(
      _.references.contains(SnapshotTable.FileColName))
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val s = new SnapshotScan(spark, table, required, pushed.toSeq,
      forRowLevel = op.isDefined)
    op.foreach(_.attachScan(s))
    s
  }
}

/** The one scan for both paths: plain reads (vectorized parquet, filter
  * pushdown, split planning) and row-level-operation reads (`_file`
  * metadata column + runtime group filtering). File-level pruning stacks
  * three ways, each conservative: the manifest's stats sidecar vs pushed
  * key predicates (zone pruning), the runtime `_file IN` group filter,
  * and parquet's own row-group statistics inside the reader. */
class SnapshotScan(spark: SparkSession, table: SnapshotTable,
    required: StructType, pushed: Seq[Filter], forRowLevel: Boolean = false)
  extends Scan with Batch with SupportsRuntimeV2Filtering
  with SupportsReportStatistics {

  private val FileCol = SnapshotTable.FileColName
  /** What is actually read from parquet (the metadata column stripped). */
  private val dataSchema = StructType(required.filterNot(_.name == FileCol))
  private val fileOrdinal = required.fieldNames.indexOf(FileCol)

  @volatile private[catalog] var currentFiles: Seq[String] =
    SnapshotZones.prune(spark, table.root, table.snapVersion, pushed, table.files)

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    Array(ColumnBridge.fieldReference(FileCol))

  /** Runtime group filtering: Spark evaluates the matching-rows subquery,
    * collects its `_file` values, and hands them here as `_file IN (...)`;
    * unparseable predicates are ignored (no pruning, never wrongness). */
  override def filter(predicates: Array[Predicate]): Unit = {
    val keep = predicates.iterator.flatMap(inFileSet).reduceOption(_ ++ _)
    keep.foreach { k =>
      // `_file` values are qualified scan paths; manifests may carry bare
      // paths — compare both as URI paths
      val norm = k.map(SnapshotStore.uriPath)
      currentFiles = currentFiles.filter(f => norm(SnapshotStore.uriPath(f)))
    }
  }

  private def inFileSet(p: Predicate): Option[Set[String]] = p.name() match {
    case "IN" | "=" =>
      val children = p.children()
      val onFile = children.headOption.exists {
        case r: NamedReference => r.fieldNames().sameElements(Array(FileCol))
        case _ => false
      }
      if (!onFile) None
      else Some(children.drop(1).flatMap(ColumnBridge.literalValue).collect {
        case v: UTF8String => v.toString
        case v: String => v
      }.toSet)
    case _ => None
  }

  override def estimateStatistics(): Statistics = {
    val bytes = statuses.map(_.getLen).sum
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }

  private def statuses: Seq[org.apache.hadoop.fs.FileStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    currentFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    statuses.flatMap { s =>
      val len = s.getLen
      val path = s.getPath.toString
      table.tombstones.get(SnapshotStore.uriPath(path)) match {
        // a tombstoned file reads as ONE unsplit partition: the delete
        // vector addresses FILE-absolute row ordinals, which only a
        // whole-file in-order read can count
        case Some(dv) =>
          Seq(SnapshotInputPartition(path, 0, len, len,
            s.getModificationTime, dv))
        case None =>
          (0L until len by maxBytes).map { start =>
            SnapshotInputPartition(path, start,
              math.min(maxBytes, len - start), len, s.getModificationTime,
              Array.empty)
          }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fmt = new ParquetFileFormat()
    // batches only on the plain-read path of a vector-free table; `_file`
    // requests and delete vectors both force ROWS (vectorized decode
    // stays on inside the reader)
    val batchMode = fmt.supportBatch(spark, dataSchema) &&
      fileOrdinal < 0 && table.tombstones.isEmpty
    val opts = Map(
      org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> batchMode.toString)
    // a row-level-operation scan must return EVERY row of every file it
    // plans (the replace-groups contract: carry-over rows ride the
    // rewrite) — its pushed filters prune at FILE granularity only (zone
    // pruning above), never inside the reader where parquet row-group
    // skipping would silently drop carry-over rows of a
    // partially-matching file. Tombstoned files need the same whole-file
    // contract for ordinal integrity, so they get the unfiltered reader
    // even on the plain path.
    def build(filters: Seq[Filter]) = fmt.buildReaderWithPartitionValues(
      spark, table.schema, new StructType(), dataSchema, filters,
      opts, spark.sessionState.newHadoopConf())
    val readerFilters = if (forRowLevel) Nil else pushed
    new SnapshotReaderFactory(build(readerFilters), build(Nil), batchMode,
      dataSchema, required, fileOrdinal)
  }
}

case class SnapshotInputPartition(file: String, start: Long, length: Long,
    fileSize: Long, modTime: Long, dv: Array[Long]) extends InputPartition

/** Executor-side reading: Spark's own parquet reader function (vectorized
  * when the session supports it), one split per partition. Columnar
  * batches flow through UNFLATTENED on the plain-read path; when `_file`
  * is requested (row-level operations only) rows are projected with the
  * split's file path spliced in at its schema position. A partition
  * carrying a delete vector reads whole-file, unfiltered, in order, and
  * drops tombstoned ordinals with a pointer walk (the vector is sorted). */
class SnapshotReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    unfilteredFunc: PartitionedFile => Iterator[InternalRow],
    batchMode: Boolean, dataSchema: StructType, outputSchema: StructType,
    fileOrdinal: Int) extends PartitionReaderFactory {

  private def partitionedFile(p: SnapshotInputPartition): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(p.file),
      p.start, p.length, Array.empty, p.modTime, p.fileSize)

  override def supportColumnarReads(partition: InputPartition): Boolean =
    batchMode && fileOrdinal < 0

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[SnapshotInputPartition]
    // the reader was built with returning_batch=true: elements ARE
    // ColumnarBatch behind the erased InternalRow signature (the V1
    // contract); cast the ITERATOR, never per-element (a .map would
    // insert an InternalRow cast on the lambda argument)
    val it = readFunc(partitionedFile(p))
      .asInstanceOf[Iterator[ColumnarBatch]]
    new IteratorReader(it)
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapshotInputPartition]
    // the V1 reader contract: with vectorization on, the iterator's
    // elements are ColumnarBatch cast as InternalRow — un-hack via Any
    val fn = if (p.dv.nonEmpty) unfilteredFunc else readFunc
    val raw = fn(partitionedFile(p)).asInstanceOf[Iterator[Any]].flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }
    val rows =
      if (p.dv.isEmpty) raw
      else new Iterator[InternalRow] {
        // rows from the parquet reader REUSE one buffer, so the skip must
        // advance in hasNext (after the consumer finished with the
        // previous row), never prefetch past the row it is about to serve
        private var ord = -1L
        private var i = 0
        private var cur: InternalRow = _
        private var ready = false
        override def hasNext: Boolean = {
          if (ready) return true
          while (raw.hasNext) {
            val r = raw.next(); ord += 1
            while (i < p.dv.length && p.dv(i) < ord) i += 1
            if (i >= p.dv.length || p.dv(i) != ord) {
              cur = r; ready = true; return true
            }
          }
          false
        }
        override def next(): InternalRow = {
          if (!ready && !hasNext) throw new NoSuchElementException
          ready = false; cur
        }
      }
    val out =
      if (fileOrdinal < 0) rows
      else {
        // splice _file in at its requested position: output field i reads
        // joined(data ++ file) at i (before), n (the file), or i-1 (after)
        val n = dataSchema.length
        val exprs = outputSchema.fields.zipWithIndex.map { case (f, i) =>
          val src = if (i == fileOrdinal) n else if (i < fileOrdinal) i else i - 1
          val (dt, nullable) =
            if (i == fileOrdinal) (StringType: DataType, false)
            else (f.dataType, f.nullable)
          BoundReference(src, dt, nullable)
        }.toSeq
        val proj = UnsafeProjection.create(exprs)
        val fileRow = new GenericInternalRow(
          Array[Any](UTF8String.fromString(p.file)))
        val joined = new JoinedRow
        rows.map(r => proj(joined(r, fileRow)))
      }
    new IteratorReader(out)
  }

  /** The parquet reader registers its own task-completion close. */
  private class IteratorReader[T](it: Iterator[T]) extends PartitionReader[T] {
    private var cur: T = _
    override def next(): Boolean =
      if (it.hasNext) { cur = it.next(); true } else false
    override def get(): T = cur
    override def close(): Unit = ()
  }
}

/** Zone pruning of a manifest file list from pushed filters, against the
  * commit-versioned stats sidecar (q306's machinery consulted by the V2
  * scan itself). Strict bounds are treated as inclusive and non-numeric
  * comparisons ignored — conservative both ways: extra files are kept,
  * rows are never lost. */
object SnapshotZones {

  def prune(spark: SparkSession, root: String, version: Int,
      pushed: Seq[Filter], files: Seq[String]): Seq[String] = {
    if (pushed.isEmpty) return files
    val stats = SnapshotStore.statsOf(spark, root, version)
      .getOrElse(return files)
    val (key, byFile) = stats
    val bounds = interval(pushed, key).getOrElse(return files)
    val (lo, hi) = bounds
    files.filter { f =>
      byFile.get(SnapshotStore.uriPath(f)) match {
        case Some((flo, fhi)) => !(fhi < lo || flo > hi)
        case None => true
      }
    }
  }

  /** The [lo, hi] the conjuncts admit for `key`, None when unconstrained. */
  private def interval(pushed: Seq[Filter],
      key: String): Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var any = false
    def num(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    def visit(f: Filter): Unit = f match {
      case And(l, r) => visit(l); visit(r)
      case EqualTo(a, v) if a == key =>
        num(v).foreach { n => lo = lo.max(n); hi = hi.min(n); any = true }
      case GreaterThan(a, v) if a == key =>
        num(v).foreach { n => lo = lo.max(n); any = true }
      case GreaterThanOrEqual(a, v) if a == key =>
        num(v).foreach { n => lo = lo.max(n); any = true }
      case LessThan(a, v) if a == key =>
        num(v).foreach { n => hi = hi.min(n); any = true }
      case LessThanOrEqual(a, v) if a == key =>
        num(v).foreach { n => hi = hi.min(n); any = true }
      case _ => ()
    }
    pushed.foreach(visit)
    if (any) Some((lo, hi)) else None
  }
}

class SnapshotWriteBuilder(spark: SparkSession, table: SnapshotTable,
    info: LogicalWriteInfo, op: Option[SnapshotRowLevelOperation])
  extends WriteBuilder {
  override def build(): Write = new SnapshotWrite(spark, table, info, op)
}

/** The physical write is Spark's OWN parquet V2 write (codegen'd writers,
  * task-commit protocol) aimed at an invisible staging directory inside
  * the root; [[SnapshotBatchWrite.commit]] then publishes: staged files
  * rename into the root (same-FS metadata ops), and ONE manifest commit
  * replaces exactly the operation's scanned files — based on the version
  * the table was LOADED at, so a concurrent committer conflicts
  * (first-writer-wins OCC) instead of interleaving. */
class SnapshotWrite(spark: SparkSession, table: SnapshotTable,
    info: LogicalWriteInfo, op: Option[SnapshotRowLevelOperation])
  extends Write {

  override def description(): String =
    s"graft-snapshot-write(${table.name()}, v${table.snapVersion})"

  override def toBatch: BatchWrite = {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(table.root,
      s"_graft_stage_cat_$run")
    val winfo = LogicalWriteInfoImpl(info.queryId(), info.schema(),
      CaseInsensitiveStringMap.empty(),
      java.util.Optional.empty[StructType](),
      java.util.Optional.empty[StructType]())
    val delegate = ParquetWrite(Seq(staging.toString), "parquet",
      (_: DataType) => true, winfo).toBatch
    new SnapshotBatchWrite(spark, table, staging.toString, run, delegate, op)
  }
}

class SnapshotBatchWrite(spark: SparkSession, table: SnapshotTable,
    staging: String, run: String, delegate: BatchWrite,
    op: Option[SnapshotRowLevelOperation]) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo) =
    delegate.createBatchWriterFactory(info)

  override def useCommitCoordinator(): Boolean =
    delegate.useCommitCoordinator()

  private def fs = new org.apache.hadoop.fs.Path(table.root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    delegate.commit(messages) // staged task files land under `staging`
    val f = fs
    val stagingP = new org.apache.hadoop.fs.Path(staging)
    val rootP = new org.apache.hadoop.fs.Path(table.root)
    val moved =
      if (!f.exists(stagingP)) Nil
      else f.listStatus(stagingP).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex.map { case (p, i) =>
          val dst = new org.apache.hadoop.fs.Path(rootP, s"cat_${run}_$i.parquet")
          require(f.rename(p, dst), s"catalog stage publish failed: $p -> $dst")
          dst.toString
        }.toList
    f.delete(stagingP, true)
    val replaced = op.map(_.replacedFiles).getOrElse(Nil)
      .map(SnapshotStore.uriPath).toSet
    // carry every non-replaced manifest line VERBATIM (partition
    // annotations, the spec meta line) — only the replaced data lines go;
    // new files land unannotated (pruning power narrows, rows never)
    val kept = SnapshotStore.linesReplacing(spark, table.root,
      table.snapVersion, replaced)
    SnapshotStore.commit(spark, table.root, kept ++ moved, table.snapVersion)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    try delegate.abort(messages)
    finally fs.delete(new org.apache.hadoop.fs.Path(staging), true)
}
