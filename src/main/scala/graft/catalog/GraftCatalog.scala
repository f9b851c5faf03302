package graft.catalog

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import graft.sources.SnapshotStore
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{Identifier, MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, LogicalWriteInfo, LogicalWriteInfoImpl, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetWrite
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration
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
class GraftCatalog extends TableCatalog
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = "graft"

  /** `CALL graft.compact/vacuum/analyze/set_write_mode(...)` — the
    * maintenance surface ([[GraftProcedures]]). */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(catalogName, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else GraftProcedures.Names.map(Identifier.of(Array.empty, _)).toArray

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

  /** Native `TIMESTAMP AS OF`: the analyzer hands the instant here as
    * MICROSECONDS since the epoch; resolution is the latest version whose
    * manifest was committed at-or-before it (manifest mtime = publication
    * time — the same clock every table format's timestamp travel reads).
    * An instant before the first commit declines: there was no table. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident).getOrElse(throw new NoSuchTableException(ident))
    val spark = SparkSession.active
    val v = SnapshotStore.versionTimes(spark, root)
      .filter { case (_, ms) => ms * 1000L <= timestamp }
      .map(_._1).maxOption.getOrElse(throw new NoSuchTableException(ident))
    new SnapshotTable(spark, s"$catalogName.${ident.name()}", root, v)
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

  /** SQL DDL: `CREATE TABLE graft.t (cols) [PARTITIONED BY (c)]
    * [LOCATION 'root']` — and the create half of CTAS. The table is born
    * as manifest v1 holding ONLY meta lines (the schema, and the partition
    * spec when given): an empty table exists, reads as zero rows under its
    * declared schema, and every later write is an ordinary manifest
    * commit. The root comes from LOCATION, else
    * `spark.sql.catalog.<cat>.warehouse`/<name> — and is registered as the
    * session path conf, so the created table resolves immediately.
    * Partitioning beyond one identity column declines loudly (the
    * manifest's spec model, SnapshotStore.partSpecLine). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (ident.namespace().nonEmpty)
      throw new NoSuchTableException(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val spark = SparkSession.active
    val root = Option(properties.get(TableCatalog.PROP_LOCATION))
      .orElse(spark.conf
        .getOption(s"spark.sql.catalog.$catalogName.warehouse")
        .map(w => s"$w/${ident.name()}"))
      .getOrElse(throw new UnsupportedOperationException(
        s"graft catalog: CREATE TABLE needs LOCATION or " +
          s"spark.sql.catalog.$catalogName.warehouse"))
    val partCol = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "identity" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        Some(t.references()(0).fieldNames()(0))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: only single-column identity PARTITIONED BY is " +
          s"supported, got ${other.mkString(", ")}")
    }
    val rootP = new org.apache.hadoop.fs.Path(root)
    rootP.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(rootP)
    SnapshotStore.commit(spark, root,
      Seq(SnapshotStore.schemaLine(schema)) ++
        partCol.map(SnapshotStore.partSpecLine), 0)
    spark.conf.set(confKey(ident.name()), root)
    new SnapshotTable(spark, s"$catalogName.${ident.name()}", root, 1)
  }

  /** `ALTER TABLE graft.t ADD COLUMN c TYPE` — schema evolution as ONE
    * manifest commit: every data line, delete vector, and annotation
    * carries verbatim; only the schema meta line widens. Old files
    * null-fill the new column inside the scan; time travel reads each
    * version under its own schema; the commit is OCC'd on the version the
    * change was derived from. Any other change (drop/rename/retype/nested/
    * positioned) declines loudly — narrowing rewrites history. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootOf(ident).getOrElse(throw new NoSuchTableException(ident))
    val spark = SparkSession.active
    val cur = SnapshotStore.currentVersion(spark, root)
    if (cur <= 0) throw new NoSuchTableException(ident)
    val base = SnapshotStore.schemaOf(spark, root, cur).getOrElse(
      spark.read.parquet(SnapshotStore.files(spark, root, cur): _*).schema)
    val evolved = changes.foldLeft(base) { (s, ch) => ch match {
      case a: TableChange.AddColumn if a.fieldNames().length == 1 &&
          a.position() == null =>
        val name = a.fieldNames()(0)
        require(!s.fieldNames.contains(name),
          s"graft catalog: column $name already exists in ${ident.name()}")
        val f = StructField(name, a.dataType(), a.isNullable)
        s.add(if (a.comment() != null) f.withComment(a.comment()) else f)
      case other => throw new UnsupportedOperationException(
        "graft catalog: ALTER TABLE supports only top-level ADD COLUMN " +
          s"(appended), got $other")
    }}
    val kept = SnapshotStore.linesReplacing(spark, root, cur, Set.empty)
    SnapshotStore.commit(spark, root,
      SnapshotStore.linesWithSchema(kept, evolved), cur)
    loadTable(ident)
  }

  /** `DROP TABLE graft.t`: delete the root (manifests, data, vectors,
    * sidecars) and deregister the session path conf. Returns false for an
    * unknown or never-committed identifier (the analyzer's IF EXISTS
    * contract). */
  override def dropTable(ident: Identifier): Boolean =
    rootOf(ident) match {
      case None => false
      case Some(root) =>
        val spark = SparkSession.active
        val existed = SnapshotStore.versions(spark, root).nonEmpty
        val p = new org.apache.hadoop.fs.Path(root)
        if (existed)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true)
        spark.conf.unset(confKey(ident.name()))
        existed
    }

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

  /** The manifest-recorded schema when present (DDL-created or evolved
    * tables — authoritative, footer-free, and lets an EMPTY table exist);
    * else derived from the files' footers (pre-DDL snapshot roots). */
  override lazy val schema: StructType =
    SnapshotStore.schemaOf(spark, root, snapVersion)
      .getOrElse(spark.read.parquet(files: _*).schema)

  override def name(): String = tableName

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(spark, this, None, options = options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SnapshotWriteBuilder(spark, this, info, None)

  /** Row-level operations plan by the table's manifest-recorded write
    * mode: `meta:writemode=mor` → DELTA (merge-on-read — tombstone vectors
    * + insert files, cost ∝ changed rows); absent → group-based
    * copy-on-write (cost ∝ covering files). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        if (SnapshotStore.writeModeOf(spark, root, snapVersion)
            .contains("mor"))
          new SnapshotDeltaOperation(spark, SnapshotTable.this, info.command())
        else
          new SnapshotRowLevelOperation(spark, SnapshotTable.this,
            info.command())
    }

  override def metadataColumns(): Array[MetadataColumn] =
    Array(SnapshotTable.FileColumn, SnapshotTable.PosColumn)
}

object SnapshotTable {

  /** The group id of group-based row-level operations: which data file a
    * row came from. NOT preserved into the write schema (the rewrite
    * writes pure data columns; the file identity only routes the runtime
    * group filter). */
  val FileColName = "_file"

  /** `__preserve_on_*` = true: the delta rewrite NULLIFIES non-preserved
    * metadata in its delete/update outputs — but `_file`/`_pos` ARE the
    * delta row id (the tombstone coordinates), so they must survive into
    * the writer (nullified row ids also never satisfy WriteDelta's
    * non-null resolution, looping the analyzer). The group-based COW path
    * is indifferent: its write schema is pure data columns either way. */
  object FileColumn extends MetadataColumn {
    override def name(): String = FileColName
    override def dataType(): DataType = StringType
    override def isNullable: Boolean = false
    override def comment(): String =
      "manifest path of the data file the row came from"
    override def metadataInJSON(): String =
      """{"__preserve_on_delete":true,"__preserve_on_update":true,""" +
        """"__preserve_on_reinsert":true}"""
  }

  /** The second half of the delta row id: the row's FILE-ABSOLUTE ordinal,
    * produced by the parquet reader's native row-index machinery (correct
    * under splits and row-group skipping) — exactly the position a delete
    * vector tombstones. */
  val PosColName = "_pos"

  object PosColumn extends MetadataColumn {
    override def name(): String = PosColName
    override def dataType(): DataType = org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = false
    override def comment(): String =
      "file-absolute row ordinal (the delete-vector position)"
    override def metadataInJSON(): String =
      """{"__preserve_on_delete":true,"__preserve_on_update":true,""" +
        """"__preserve_on_reinsert":true}"""
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
    op: Option[SnapshotRowLevelOperation], forDelta: Boolean = false,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = table.schema
  private var pushed: Array[Filter] = Array.empty

  /** Everything is returned as residual (Spark re-evaluates above the
    * scan); the accepted subset feeds parquet row-group skipping and the
    * manifest-stats zone pruning — best-effort by contract, so no filter
    * may be claimed as exact. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filterNot(f =>
      f.references.contains(SnapshotTable.FileColName) ||
        f.references.contains(SnapshotTable.PosColName))
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val s = new SnapshotScan(spark, table, required, pushed.toSeq,
      forRowLevel = op.isDefined, forDelta = forDelta,
      skipChangeCommits = options.getBoolean("skipChangeCommits", false))
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
    required: StructType, pushed: Seq[Filter], forRowLevel: Boolean = false,
    forDelta: Boolean = false, skipChangeCommits: Boolean = false)
  extends Scan with Batch with SupportsRuntimeV2Filtering
  with SupportsReportStatistics {

  private val FileCol = SnapshotTable.FileColName
  private val PosCol = SnapshotTable.PosColName
  /** What is actually read from parquet (metadata columns stripped). */
  private val dataSchema = StructType(
    required.filterNot(f => f.name == FileCol || f.name == PosCol))
  private val fileOrdinal = required.fieldNames.indexOf(FileCol)
  private val posOrdinal = required.fieldNames.indexOf(PosCol)

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

  /** Memoized on the file list it was computed for — estimateStatistics
    * and planInputPartitions both need the statuses, and a runtime group
    * filter may narrow `currentFiles` between them; never pay the
    * per-file FS round trips twice for the same list. */
  @volatile private var statusCache
      : (Seq[String], Seq[org.apache.hadoop.fs.FileStatus]) = null

  private def statuses: Seq[org.apache.hadoop.fs.FileStatus] = {
    val fl = currentFiles
    val cached = statusCache
    if (cached != null && (cached._1 eq fl)) return cached._2
    val conf = spark.sparkContext.hadoopConfiguration
    val fetched = fl.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p)
    }
    statusCache = (fl, fetched)
    fetched
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

  /** Split an arbitrary (vector-free) file list into read partitions —
    * the streaming source's per-version diff planning. */
  private[catalog] def partitionsFor(fl: Seq[String]): Array[InputPartition] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    fl.flatMap { fstr =>
      val p = new org.apache.hadoop.fs.Path(fstr)
      val s = p.getFileSystem(conf).getFileStatus(p)
      (0L until s.getLen by maxBytes).map { start =>
        SnapshotInputPartition(s.getPath.toString, start,
          math.min(maxBytes, s.getLen - start), s.getLen,
          s.getModificationTime, Array.empty)
      }
    }.toArray
  }

  private[catalog] def pushedFilters: Seq[Filter] = pushed

  /** `readStream.table("graft.t")`: manifest versions ARE the offsets. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SnapshotMicroBatchStream(spark, table, this, skipChangeCommits)

  override def createReaderFactory(): PartitionReaderFactory = {
    val fmt = new ParquetFileFormat()
    // batches only on the plain-read path of a vector-free table;
    // `_file`/`_pos` requests and delete vectors all force ROWS
    // (vectorized decode stays on inside the reader)
    val batchMode = fmt.supportBatch(spark, dataSchema) &&
      fileOrdinal < 0 && posOrdinal < 0 && table.tombstones.isEmpty
    val opts = Map(
      org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> batchMode.toString)
    // `_pos` rides the parquet reader's NATIVE row-index machinery: a
    // generated trailing long column, file-absolute and correct under
    // splits AND row-group skipping — the reader schema gains it here and
    // the projection below maps it out.
    val readerSchema =
      if (posOrdinal < 0) dataSchema
      else dataSchema.add(org.apache.spark.sql.execution.datasources.parquet
        .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
        org.apache.spark.sql.types.LongType)
    // a GROUP-BASED row-level scan must return EVERY row of every file it
    // plans (the replace-groups contract: carry-over rows ride the
    // rewrite) — its pushed filters prune at FILE granularity only (zone
    // pruning above), never inside the reader where parquet row-group
    // skipping would silently drop carry-over rows of a
    // partially-matching file. A DELTA scan has no carry-over rows (only
    // matched rows are written), so its filters DO push into the reader —
    // `_pos` stays correct because the native row index survives skipping.
    // Tombstoned files keep the whole-file unfiltered contract for the
    // ordinal-walk path.
    def build(filters: Seq[Filter]) = fmt.buildReaderWithPartitionValues(
      spark, table.schema, new StructType(), readerSchema, filters,
      opts, spark.sessionState.newHadoopConf())
    val readerFilters = if (forRowLevel && !forDelta) Nil else pushed
    new SnapshotReaderFactory(build(readerFilters), build(Nil), batchMode,
      dataSchema, required, fileOrdinal, posOrdinal)
  }
}

case class SnapshotInputPartition(file: String, start: Long, length: Long,
    fileSize: Long, modTime: Long, dv: Array[Long]) extends InputPartition

/** Executor-side reading: Spark's own parquet reader function (vectorized
  * when the session supports it), one split per partition. Columnar
  * batches flow through UNFLATTENED on the plain-read path; when `_file`
  * or `_pos` is requested (row-level operations) rows are projected with
  * the split's file path / the reader's native row index spliced in at
  * their schema positions. A partition carrying a delete vector drops
  * tombstoned positions: by sorted binary search on the native row index
  * when `_pos` rides along (split- and skip-safe), else by the whole-file
  * in-order ordinal walk. */
class SnapshotReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    unfilteredFunc: PartitionedFile => Iterator[InternalRow],
    batchMode: Boolean, dataSchema: StructType, outputSchema: StructType,
    fileOrdinal: Int, posOrdinal: Int = -1) extends PartitionReaderFactory {

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

  /** Position of the reader-generated row-index column (after the data
    * columns), -1 when `_pos` was not requested. */
  private val rowIdxSrc = if (posOrdinal < 0) -1 else dataSchema.length

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
      else if (rowIdxSrc >= 0)
        // the native row index IS the tombstone coordinate: drop by
        // binary search (the vector is sorted) — correct under splits
        raw.filter(r =>
          java.util.Arrays.binarySearch(p.dv, r.getLong(rowIdxSrc)) < 0)
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
      if (fileOrdinal < 0 && posOrdinal < 0) rows
      else {
        // splice the metadata columns in at their requested positions:
        // the reader row is data columns [+ native row index], the file
        // path rides a JoinedRow; every other output field maps to its
        // data ordinal (its position minus the metadata fields before it)
        val fileSrc = dataSchema.length + (if (rowIdxSrc >= 0) 1 else 0)
        val exprs = outputSchema.fields.zipWithIndex.map { case (f, i) =>
          if (i == fileOrdinal)
            BoundReference(fileSrc, StringType, nullable = false)
          else if (i == posOrdinal)
            BoundReference(rowIdxSrc,
              org.apache.spark.sql.types.LongType, nullable = false)
          else {
            val nMetaBefore = (if (fileOrdinal >= 0 && fileOrdinal < i) 1 else 0) +
              (if (posOrdinal >= 0 && posOrdinal < i) 1 else 0)
            BoundReference(i - nMetaBefore, f.dataType, f.nullable)
          }
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
    val stats = SnapshotStore.statsAllOf(spark, root, version)
    if (stats.isEmpty) return files
    // intersect admissibility across EVERY constrained key the sidecar
    // covers — a z-ordered layout bounds all interleaved dimensions, so a
    // predicate on any of them prunes; unconstrained keys admit everything
    files.filter { f =>
      val uri = SnapshotStore.uriPath(f)
      stats.forall { case (key, byFile) =>
        interval(pushed, key) match {
          case None => true
          case Some((lo, hi)) =>
            byFile.get(uri) match {
              case Some((flo, fhi)) => !(fhi < lo || flo > hi)
              case None => true
            }
        }
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
  extends WriteBuilder with SupportsTruncate {

  private var truncateAll = false

  /** `INSERT OVERWRITE graft.t` (whole-table): the commit drops every data
    * line and delete vector and keeps the meta lines — schema and
    * partition spec survive the truncation, history survives as the prior
    * versions (an overwrite is one more commit, time travel reaches back
    * through it). */
  override def truncate(): WriteBuilder = { truncateAll = true; this }

  override def build(): Write =
    new SnapshotWrite(spark, table, info, op, truncateAll)
}

/** The physical write is Spark's OWN parquet V2 write (codegen'd writers,
  * task-commit protocol) aimed at an invisible staging directory inside
  * the root; [[SnapshotBatchWrite.commit]] then publishes: staged files
  * rename into the root (same-FS metadata ops), and ONE manifest commit
  * replaces exactly the operation's scanned files — based on the version
  * the table was LOADED at, so a concurrent committer conflicts
  * (first-writer-wins OCC) instead of interleaving. */
class SnapshotWrite(spark: SparkSession, table: SnapshotTable,
    info: LogicalWriteInfo, op: Option[SnapshotRowLevelOperation],
    truncateAll: Boolean = false)
  extends Write
  with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  override def description(): String =
    s"graft-snapshot-write(${table.name()}, v${table.snapVersion})"

  /** The manifest's partition column when the write's schema carries it —
    * partitioned tables route through the fanout writer below. */
  private val partCol: Option[String] =
    SnapshotStore.partitionSpecOf(spark, table.root, table.snapVersion)
      .filter(info.schema().fieldNames.contains)

  /** Cluster incoming rows by the partition column (best-effort, the
    * Iceberg write-distribution contract): each task then holds few
    * values, so the fanout writer opens few files. Unpartitioned tables
    * impose nothing. */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    partCol.map(c =>
      org.apache.spark.sql.connector.distributions.Distributions.clustered(
        Array[org.apache.spark.sql.connector.expressions.Expression](
          ColumnBridge.fieldReference(c))))
      .getOrElse(org.apache.spark.sql.connector.distributions
        .Distributions.unspecified())

  override def distributionStrictlyRequired(): Boolean = false

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array.empty

  override def toBatch: BatchWrite = {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(table.root,
      s"_graft_stage_cat_$run")
    partCol match {
      case Some(c) =>
        // PARTITION-FANOUT write: one parquet file per (task, partition
        // value) through Spark's own OutputWriter; the value rides the
        // commit message, so the manifest annotates every new file with
        // its partition tuple — catalog writes KEEP partition pruning
        // power, no post-hoc scan of the data just written.
        val job = org.apache.hadoop.mapreduce.Job.getInstance(
          spark.sessionState.newHadoopConf())
        val owf = new ParquetFileFormat().prepareWrite(spark, job,
          Map.empty[String, String], info.schema())
        new SnapshotFanoutBatchWrite(spark, table, staging.toString, run,
          new SnapshotFanoutWriterFactory(staging.toString, info.schema(),
            info.schema().fieldIndex(c), owf,
            new SerializableConfiguration(job.getConfiguration)),
          op, truncateAll)
      case None =>
        val winfo = LogicalWriteInfoImpl(info.queryId(), info.schema(),
          CaseInsensitiveStringMap.empty(),
          java.util.Optional.empty[StructType](),
          java.util.Optional.empty[StructType]())
        val delegate = ParquetWrite(Seq(staging.toString), "parquet",
          (_: DataType) => true, winfo).toBatch
        new SnapshotBatchWrite(spark, table, staging.toString, run, delegate,
          op, truncateAll)
    }
  }

  /** `writeStream.toTable("graft.t")`: every micro-batch epoch becomes ONE
    * atomic manifest commit (appended data files + the epoch high-water
    * mark), so mid-stream readers only ever see whole epochs, and a
    * replayed epoch — Structured Streaming redelivers after a
    * commit-then-crash — finds its mark already stamped and skips:
    * exactly-once from at-least-once, the manifest edition of q324's
    * version arithmetic. The physical write is Spark's own parquet
    * OutputWriter per task. */
  override def toStreaming: StreamingWrite = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job,
      Map.empty[String, String], info.schema())
    new SnapshotStreamingWrite(table, info.schema(), info.queryId(), owf,
      new SerializableConfiguration(job.getConfiguration))
  }
}

class SnapshotBatchWrite(spark: SparkSession, table: SnapshotTable,
    staging: String, run: String, delegate: BatchWrite,
    op: Option[SnapshotRowLevelOperation],
    truncateAll: Boolean = false) extends BatchWrite {

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
    // new files land unannotated (pruning power narrows, rows never). A
    // truncating overwrite keeps ONLY the meta lines: schema and spec
    // survive, every data line and vector goes.
    val kept =
      if (truncateAll) SnapshotStore.metaLines(spark, table.root,
        table.snapVersion)
      else SnapshotStore.linesReplacing(spark, table.root,
        table.snapVersion, replaced)
    SnapshotStore.commitOrCleanup(spark, table.root, kept ++ moved,
      table.snapVersion, moved)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    try delegate.abort(messages)
    finally fs.delete(new org.apache.hadoop.fs.Path(staging), true)
}

/** One committed task file of a streaming epoch (staged, not yet visible). */
case class EpochStagedFile(path: String) extends WriterCommitMessage

/** One staged fanout file and the partition value all its rows share. */
case class PartStagedFile(path: String, value: String)
  extends WriterCommitMessage

/** Batch write for PARTITIONED snapshot tables: tasks fan rows out into
  * one file per partition value ([[SnapshotFanoutWriterFactory]]), and the
  * commit publishes every file WITH its value annotation — the manifest's
  * per-file partition tuple stays complete through catalog INSERT /
  * OVERWRITE / row-level rewrites, so partition pruning never loses power
  * to catalog writes. Same OCC/carry semantics as [[SnapshotBatchWrite]]. */
class SnapshotFanoutBatchWrite(spark: SparkSession, table: SnapshotTable,
    staging: String, run: String, factory: SnapshotFanoutWriterFactory,
    op: Option[SnapshotRowLevelOperation], truncateAll: Boolean)
  extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.DataWriterFactory =
    factory

  private def fs = new org.apache.hadoop.fs.Path(table.root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    val staged = messages.collect { case c: CompositePartStaged => c.files }
      .flatten.sortBy(_.path)
    val moved = staged.zipWithIndex.map { case (p, i) =>
      val dst = new org.apache.hadoop.fs.Path(table.root,
        s"cat_${run}_$i.parquet")
      require(f.rename(new org.apache.hadoop.fs.Path(p.path), dst),
        s"fanout stage publish failed: ${p.path} -> $dst")
      (dst.toString, p.value)
    }.toSeq
    f.delete(new org.apache.hadoop.fs.Path(staging), true)
    val replaced = op.map(_.replacedFiles).getOrElse(Nil)
      .map(SnapshotStore.uriPath).toSet
    val kept =
      if (truncateAll) SnapshotStore.metaLines(spark, table.root,
        table.snapVersion)
      else SnapshotStore.linesReplacing(spark, table.root,
        table.snapVersion, replaced)
    SnapshotStore.commitOrCleanup(spark, table.root,
      kept ++ moved.map { case (p, v) => SnapshotStore.partLine(p, v) },
      table.snapVersion, moved.map(_._1))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
}

/** Executor-side fanout: rows route to one Spark parquet OutputWriter per
  * partition value (opened lazily; the requested clustered distribution
  * keeps the per-task value count small). The value is rendered with the
  * same `String.valueOf` the manifest annotation layer compares with. */
class SnapshotFanoutWriterFactory(staging: String, schema: StructType,
    partIdx: Int,
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableConfiguration)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}

      private val dt = schema.fields(partIdx).dataType
      private val writers = scala.collection.mutable.LinkedHashMap
        .empty[String, (org.apache.spark.sql.execution.datasources.OutputWriter, String)]
      private var nFiles = 0

      private def writerFor(value: String) = writers.getOrElseUpdate(value, {
        val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
          conf.value,
          new TaskAttemptID(new TaskID(new JobID("graftfan", partitionId),
            TaskType.MAP, partitionId), nFiles))
        val dir = new org.apache.hadoop.fs.Path(staging)
        dir.getFileSystem(conf.value).mkdirs(dir)
        val path = new org.apache.hadoop.fs.Path(dir,
          f"part-$partitionId%05d-$taskId-$nFiles${owf.getFileExtension(ctx)}")
          .toString
        nFiles += 1
        (owf.newInstance(path, schema, ctx), path)
      })

      override def write(row: InternalRow): Unit =
        writerFor(String.valueOf(row.get(partIdx, dt)))._1.write(row)

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_._1.close())
        // one message per file is the natural shape, but the contract is
        // one per task — pack (path, value) pairs into a composite
        CompositePartStaged(writers.map { case (v, (_, p)) =>
          PartStagedFile(p, v)
        }.toSeq)
      }

      override def abort(): Unit = writers.values.foreach(_._1.close())
      override def close(): Unit = ()
    }
}

/** A task's full set of staged fanout files. */
case class CompositePartStaged(files: Seq[PartStagedFile])
  extends WriterCommitMessage

/** A manifest version as a streaming offset. */
case class SnapshotVersionOffset(version: Int)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** STREAMING READS from a snapshot table (`readStream.table("graft.t")`)
  * — the manifest IS the log: offsets are committed versions, a
  * micro-batch is the manifest DIFF between two versions, and the first
  * batch is the table's full snapshot at stream start (delete vectors
  * applied, zone pruning and column pruning as on any scan). The
  * Delta-style table-tailing source:
  *
  *  - APPEND-ONLY ENFORCEMENT: a version that removed files or added
  *    delete vectors is a CHANGE commit (rewrite, MoR delete, compaction)
  *    — emitting its additions would re-emit rewritten rows. Default:
  *    fail loudly. `option("skipChangeCommits", "true")` skips such
  *    versions whole (Delta's contract of the same name: appends flow,
  *    changed history does not re-emit).
  *  - EXACTLY-ONCE: offsets are durable version numbers in the
  *    checkpoint; replanning batch (a, b] re-reads exactly the same
  *    manifest diff — immutable files, immutable manifests.
  *  - At 100 TB: per-trigger planning cost is two manifest reads; the
  *    data read is only the appended files. Vacuum retention must cover
  *    the reader's lag (the standard table-format contract).
  */
class SnapshotMicroBatchStream(spark: SparkSession, table: SnapshotTable,
    scan: SnapshotScan, skipChangeCommits: Boolean)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {

  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = SnapshotVersionOffset(0)

  override def latestOffset(): Offset = SnapshotVersionOffset(
    math.max(table.snapVersion,
      SnapshotStore.currentVersion(spark, table.root)))

  override def deserializeOffset(json: String): Offset =
    SnapshotVersionOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotVersionOffset].version
    val e = end.asInstanceOf[SnapshotVersionOffset].version
    val parts = scala.collection.mutable.ArrayBuffer[InputPartition]()
    // the initial snapshot: the scan's own planning at the loaded version
    // (vectors applied, zone-pruned) — never change-checked
    if (s == 0) parts ++= scan.planInputPartitions()
    val from = if (s == 0) table.snapVersion else s
    SnapshotStore.versions(spark, table.root)
      .filter(v => v > from && v <= e).foreach { v =>
        val prev = SnapshotStore.files(spark, table.root, v - 1)
          .map(SnapshotStore.uriPath).toSet
        val cur = SnapshotStore.files(spark, table.root, v)
        val added = cur.filterNot(f => prev(SnapshotStore.uriPath(f)))
        val removed = prev -- cur.map(SnapshotStore.uriPath)
        val dvAdded = SnapshotStore.deleteVectors(spark, table.root, v)
          .map(SnapshotStore.uriPath).toSet --
          SnapshotStore.deleteVectors(spark, table.root, v - 1)
            .map(SnapshotStore.uriPath)
        if (removed.nonEmpty || dvAdded.nonEmpty) {
          if (!skipChangeCommits) throw new IllegalStateException(
            s"streaming read of ${table.name()} hit a CHANGE commit at " +
              s"version $v (${removed.size} files removed, ${dvAdded.size} " +
              "vectors added): rewrites/deletes cannot re-emit. Set " +
              "option(\"skipChangeCommits\", \"true\") to skip such " +
              "versions, or tail an append-only table.")
          // skip the whole version: its additions are rewrite outputs
        } else {
          parts ++= scan.partitionsFor(
            SnapshotZones.prune(spark, table.root, v, scan.pushedFilters,
              added))
        }
      }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** DELTA (merge-on-read) row-level operation — the production shape for
  * scattered mutations at 100 TB: Spark's delta rewrite rules
  * (`SupportsDelta`) plan DELETE as tombstones, UPDATE as
  * delete-and-insert, MERGE as the mix; the write lands as delete-vector
  * sidecars + insert files and ONE manifest commit — NO data file is ever
  * rewritten, so cost ∝ changed ROWS instead of covering files. The row id
  * is (`_file`, `_pos`): the scan's split path + the parquet reader's
  * native file-absolute row index — exactly a delete vector's coordinates.
  * The delta scan pushes its filters INTO the reader (no carry-over-rows
  * contract to protect) and applies existing vectors first, so a tombstone
  * can never double-delete and a dead row can never re-match. q304-style
  * compaction reconciles accumulated vectors back to clean files. */
class SnapshotDeltaOperation(spark: SparkSession, table: SnapshotTable,
    cmd: RowLevelOperation.Command)
  extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(spark, table, None, forDelta = true)

  override def newWriteBuilder(
      info: LogicalWriteInfo): org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new SnapshotDeltaWrite(spark, table, info)
    }

  override def rowId(): Array[NamedReference] = Array(
    ColumnBridge.fieldReference(SnapshotTable.FileColName),
    ColumnBridge.fieldReference(SnapshotTable.PosColName))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  /** Updates become (tombstone, insert) pairs — the delete-vector model
    * has no in-place row mutation. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true
}

/** One task's staged delta output: insert data files + tombstone files. */
case class DeltaStagedFiles(dataFiles: Seq[String], dvFiles: Seq[String])
  extends WriterCommitMessage

class SnapshotDeltaWrite(spark: SparkSession, table: SnapshotTable,
    info: LogicalWriteInfo)
  extends org.apache.spark.sql.connector.write.DeltaWrite {

  override def description(): String =
    s"graft-snapshot-delta-write(${table.name()}, v${table.snapVersion})"

  override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite = {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(table.root,
      s"_graft_stage_delta_$run").toString
    val dataSchema = info.schema()
    val dvSchema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("pos", org.apache.spark.sql.types.LongType,
        nullable = false)))
    def prepared(s: StructType) = {
      val job = org.apache.hadoop.mapreduce.Job.getInstance(
        spark.sessionState.newHadoopConf())
      (new ParquetFileFormat().prepareWrite(spark, job,
        Map.empty[String, String], s),
        new SerializableConfiguration(job.getConfiguration))
    }
    val (dataOwf, dataConf) = prepared(dataSchema)
    val (dvOwf, dvConf) = prepared(dvSchema)
    val idSchema = info.rowIdSchema().orElseThrow(() =>
      new IllegalStateException("delta write without a rowId schema"))
    new SnapshotDeltaBatchWrite(spark, table, staging, run,
      new SnapshotDeltaWriterFactory(staging, dataSchema, dataOwf, dataConf,
        dvSchema, dvOwf, dvConf,
        idSchema.fieldIndex(SnapshotTable.FileColName),
        idSchema.fieldIndex(SnapshotTable.PosColName)))
  }
}

class SnapshotDeltaBatchWrite(spark: SparkSession, table: SnapshotTable,
    staging: String, run: String, factory: SnapshotDeltaWriterFactory)
  extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory = factory

  private def fs = new org.apache.hadoop.fs.Path(table.root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Publish: staged insert files and tombstone files rename into the
    * root; the manifest gains them — every existing line (data files,
    * prior vectors, meta) carries VERBATIM, nothing is replaced. OCC on
    * the version the operation loaded: a racing committer fails this
    * statement whole, never interleaves. A no-match operation (nothing
    * staged) commits nothing — the table version only moves on change. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    val staged = messages.collect { case d: DeltaStagedFiles => d }
    val data = staged.flatMap(_.dataFiles).sorted
    val dvs = staged.flatMap(_.dvFiles).sorted
    def publish(paths: Seq[String], tag: String): Seq[String] =
      paths.zipWithIndex.map { case (p, i) =>
        val dst = new org.apache.hadoop.fs.Path(table.root,
          s"${tag}_${run}_$i.parquet")
        require(f.rename(new org.apache.hadoop.fs.Path(p), dst),
          s"delta stage publish failed: $p -> $dst")
        dst.toString
      }
    try {
      if (data.nonEmpty || dvs.nonEmpty) {
        val dataMoved = publish(data, "mor")
        val dvMoved = publish(dvs, "dv")
        val kept = SnapshotStore.linesReplacing(spark, table.root,
          table.snapVersion, Set.empty)
        SnapshotStore.commitOrCleanup(spark, table.root,
          kept ++ dataMoved ++ dvMoved.map(SnapshotStore.dvLine),
          table.snapVersion, dataMoved ++ dvMoved)
      }
    } finally f.delete(new org.apache.hadoop.fs.Path(staging), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
}

/** Executor-side delta writer: inserts stream through Spark's own parquet
  * OutputWriter; deletes append (file, pos) tombstone rows to a per-task
  * vector file. Writers open lazily — a task that only deletes stages no
  * data file and vice versa. */
class SnapshotDeltaWriterFactory(staging: String, dataSchema: StructType,
    dataOwf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    dataConf: SerializableConfiguration, dvSchema: StructType,
    dvOwf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    dvConf: SerializableConfiguration, idFileIdx: Int, idPosIdx: Int)
  extends org.apache.spark.sql.connector.write.DeltaWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
      import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}

      private def ctx(conf: SerializableConfiguration) =
        new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
          conf.value,
          new TaskAttemptID(new TaskID(new JobID("graftdelta", partitionId),
            TaskType.MAP, partitionId), 0))

      private var dataW: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var dataPath: String = _
      private var dvW: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var dvPath: String = _
      private val dvRow = new GenericInternalRow(2)

      override def insert(row: InternalRow): Unit = {
        if (dataW == null) {
          val c = ctx(dataConf)
          dataPath = new org.apache.hadoop.fs.Path(staging,
            f"data-$partitionId%05d-$taskId${dataOwf.getFileExtension(c)}")
            .toString
          new org.apache.hadoop.fs.Path(staging)
            .getFileSystem(dataConf.value).mkdirs(
              new org.apache.hadoop.fs.Path(staging))
          dataW = dataOwf.newInstance(dataPath, dataSchema, c)
        }
        dataW.write(row)
      }

      override def delete(metadata: InternalRow, id: InternalRow): Unit = {
        if (dvW == null) {
          val c = ctx(dvConf)
          dvPath = new org.apache.hadoop.fs.Path(staging,
            f"dv-$partitionId%05d-$taskId${dvOwf.getFileExtension(c)}")
            .toString
          new org.apache.hadoop.fs.Path(staging)
            .getFileSystem(dvConf.value).mkdirs(
              new org.apache.hadoop.fs.Path(staging))
          dvW = dvOwf.newInstance(dvPath, dvSchema, c)
        }
        dvRow.update(0, id.getUTF8String(idFileIdx))
        dvRow.update(1, id.getLong(idPosIdx))
        dvW.write(dvRow)
      }

      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        // unused under representUpdateAsDeleteAndInsert; defensive
        delete(metadata, id)
        insert(row)
      }

      override def commit(): WriterCommitMessage = {
        if (dataW != null) dataW.close()
        if (dvW != null) dvW.close()
        DeltaStagedFiles(Option(dataPath).toSeq, Option(dvPath).toSeq)
      }

      override def abort(): Unit = {
        if (dataW != null) dataW.close()
        if (dvW != null) dvW.close()
      }

      override def close(): Unit = ()
    }
}

/** The streaming half of the catalog write: tasks stage parquet through
  * Spark's own OutputWriter into `<root>/_graft_stage_stream_<q>/ep<n>/`,
  * and `commit(epoch)` publishes them as ONE manifest commit stamped with
  * the epoch high-water mark (`meta:epoch=<queryId>:<n>`):
  *
  *  - EXACTLY-ONCE: a replayed epoch (at-least-once redelivery) finds its
  *    id ≤ the stamped mark and discards its staging — the commit is
  *    idempotent by manifest arithmetic, no sink-side dedup;
  *  - READER ISOLATION: a mid-stream reader resolves the latest manifest —
  *    always a whole number of epochs, never a torn one;
  *  - CONCURRENCY: the commit OCC-retries against interleaving committers
  *    (a compaction, a batch INSERT) by re-deriving the carry lines; the
  *    staged epoch files move at most once.
  *
  * At 100 TB the per-epoch cost is the staged bytes + one rename — the
  * manifest grows by |epoch files| lines, and q304-style compaction folds
  * small epoch files back into clustered ones. */
class SnapshotStreamingWrite(table: SnapshotTable, schema: StructType,
    queryId: String, owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableConfiguration) extends StreamingWrite {

  private val tag = queryId.replaceAll("[^a-zA-Z0-9]", "").take(8)
  private val stagingBase = new org.apache.hadoop.fs.Path(table.root,
    s"_graft_stage_stream_$tag").toString

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new SnapshotStreamWriterFactory(stagingBase, schema, owf, conf)

  private def fs(spark: SparkSession) = new org.apache.hadoop.fs.Path(table.root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val f = fs(spark)
    val epDir = new org.apache.hadoop.fs.Path(stagingBase, s"ep$epochId")
    val staged = messages.collect { case EpochStagedFile(p) => p }.sorted
    def dropStaging(): Unit = f.delete(epDir, true)
    if (staged.isEmpty) { dropStaging(); return } // empty epoch: no version
    if (SnapshotStore.epochOf(spark, table.root, queryId)
        .exists(_ >= epochId)) { dropStaging(); return } // replayed epoch
    // publish the staged files (invisible until the manifest lands). The
    // names carry a per-ATTEMPT unique component: a crash between these
    // renames and the manifest commit leaves the epoch unmarked, so the
    // replay re-publishes — deterministic names would then rename onto
    // existing targets (wedging rename-strict filesystems); unique names
    // make the replay clean, and the crashed attempt's files stay
    // unreferenced like any abandoned staging.
    val att = java.util.UUID.randomUUID().toString.take(8)
    val moved = staged.zipWithIndex.map { case (p, i) =>
      val dst = new org.apache.hadoop.fs.Path(table.root,
        s"strm_${tag}_ep${epochId}_${att}_$i.parquet")
      require(f.rename(new org.apache.hadoop.fs.Path(p), dst),
        s"stream stage publish failed: $p -> $dst")
      dst.toString
    }.toSeq
    dropStaging()
    def dropMoved(): Unit =
      moved.foreach(p => f.delete(new org.apache.hadoop.fs.Path(p), false))
    var attempt = 0
    while (attempt < 5) {
      val cur = SnapshotStore.currentVersion(spark, table.root)
      if (SnapshotStore.epochOf(spark, table.root, queryId)
          .exists(_ >= epochId)) { // a replay raced us past this epoch
        dropMoved()
        return
      }
      val kept = SnapshotStore.linesReplacing(spark, table.root, cur, Set.empty)
      try {
        SnapshotStore.commit(spark, table.root,
          SnapshotStore.linesWithEpoch(kept ++ moved, queryId, epochId), cur)
        return
      } catch {
        case _: SnapshotStore.CommitConflictException => attempt += 1
      }
    }
    dropMoved() // give up clean: nothing references these files
    throw new SnapshotStore.CommitConflictException(
      s"stream epoch $epochId: lost 5 consecutive commit races under " +
        table.root)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    fs(SparkSession.active).delete(
      new org.apache.hadoop.fs.Path(stagingBase, s"ep$epochId"), true)
}

/** Executor-side epoch writer: Spark's own parquet OutputWriter aimed at
  * the epoch's staging directory; task retries write distinct attempt
  * files and only committed tasks' files reach the manifest. */
class SnapshotStreamWriterFactory(stagingBase: String, schema: StructType,
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graftstream", (epochId % Int.MaxValue).toInt),
        TaskType.MAP, partitionId), 0)
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf.value, attempt)
    val dir = new org.apache.hadoop.fs.Path(stagingBase, s"ep$epochId")
    val f = dir.getFileSystem(conf.value)
    f.mkdirs(dir)
    val path = new org.apache.hadoop.fs.Path(dir,
      f"part-$partitionId%05d-$taskId${owf.getFileExtension(ctx)}").toString
    val w = owf.newInstance(path, schema, ctx)
    new DataWriter[InternalRow] {
      override def write(r: InternalRow): Unit = w.write(r)
      override def commit(): WriterCommitMessage = {
        w.close(); EpochStagedFile(path)
      }
      override def abort(): Unit = {
        w.close()
        f.delete(new org.apache.hadoop.fs.Path(path), false)
      }
      override def close(): Unit = ()
    }
  }
}
