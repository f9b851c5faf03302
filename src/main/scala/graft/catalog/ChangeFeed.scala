package graft.catalog

import scala.jdk.CollectionConverters._

import graft.sources.SnapshotStore
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** CHANGE-DATA-FEED TABLE — `graft.<t>.changes` (Iceberg's changelog-table
  * surface): each committed version's row-level changes as data rows with
  * `_change_type` ('insert' | 'delete') and `_commit_version` appended.
  *
  *  - BATCH: the full feed from version 1 (genesis = all inserts) to the
  *    loaded version.
  *  - STREAMING (`readStream.table("graft.t.changes")`): manifest versions
  *    are the offsets; batch n is EXACTLY the feed of version n — change
  *    commits (rewrites, MoR deletes) that the plain table stream must
  *    fail/skip on become classified rows here. `option("startingVersion",
  *    n)` replays history from n+1 on (0 = genesis); the default starts at
  *    the load version (only future changes).
  *
  * Feed derivation per version (manifest DIFF — reads only changed files):
  *  - added data files → their rows as 'insert';
  *  - removed data files → their rows AT THE PRIOR VERSION (existing
  *    vectors applied — already-dead rows never re-emit) as 'delete';
  *  - newly added delete vectors → ONLY the tombstoned rows of covered
  *    files (keep-only read on the native row index) as 'delete'.
  * A copy-on-write UPDATE therefore emits delete+insert pairs; carry-over
  * rows appear on both sides with identical content and cancel under the
  * consumer's net-classification join (Iceberg's changelog contract —
  * Delta emits the same shape without CDF capture files). Compaction
  * commits are `meta:maintenance=` stamped (dataChange=false) and emit
  * NOTHING. Equality-delete commits and schema evolution decline loudly —
  * their feed is not derivable from the manifest alone.
  *
  * At 100 TB: per-version planning is two manifest reads; the data read
  * is only the changed files — never the table.
  */
class ChangeFeedTable(@transient val spark: SparkSession, tableName: String,
    val base: SnapshotTable) extends Table with SupportsRead {

  override def name(): String = tableName

  override lazy val schema: StructType = StructType(base.schema.fields ++ Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_version", IntegerType, nullable = false)))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var required: StructType = schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new ChangeFeedScan(spark, base, required,
        Option(options.get("startingVersion")).map(_.toInt))
    }
}

/** One changed file (or keep-only vector slice) of one version's feed. */
class ChangeFeedInputPartition(val file: String, val start: Long,
    val length: Long, val fileSize: Long, val changeType: String,
    val version: Int, val dvPaths: Seq[(String, Long)],
    val keepOnly: Seq[(String, Long)]) extends InputPartition

class ChangeFeedScan(spark: SparkSession, base: SnapshotTable,
    outSchema: StructType, startingVersion: Option[Int])
  extends Scan with Batch {

  // the feed reads every changed file under ONE schema: tables with
  // rename/add history would need per-epoch dispatch per HISTORICAL
  // version — decline loudly rather than misread old epochs
  require(graft.sources.SchemaEvo.isTrivial(base.schema),
    s"change feed of ${base.root}: schema-evolved tables are not supported")

  /** The DATA columns the (possibly pruned) output actually needs — what
    * the parquet reader decodes; `_change_type`/`_commit_version` are
    * partition constants, never read bytes. */
  private[graft] val dataSchema = StructType(outSchema.fields.filterNot(
    f => f.name == "_change_type" || f.name == "_commit_version"))

  override def readSchema(): StructType = outSchema

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val from = startingVersion.getOrElse(0)
    SnapshotStore.versions(spark, base.root)
      .filter(v => v > from && v <= base.snapVersion)
      .flatMap(feedPartitions).toArray
  }

  /** The classified partitions of version `v`'s manifest diff. */
  private[catalog] def feedPartitions(v: Int): Seq[InputPartition] = {
    val root = base.root
    // the dataChange=false marker lives in ITS OWN version's manifest —
    // read it there, so a compaction committed AFTER the stream's load
    // version is still recognized (the load-version manifest predates it)
    if (SnapshotStore.maintenanceVersionsOf(spark, root, v)
        .contains(v)) return Nil // dataChange=false: net-zero by contract
    // a diff needs BOTH manifests: a vacuumed predecessor means this
    // version's feed is no longer derivable — decline loudly (the
    // standard retention-vs-CDC contract), never a raw read failure
    if (v > 1 && !SnapshotStore.versions(spark, root).contains(v - 1))
      throw new IllegalStateException(
        s"change feed of $root: version ${v - 1} has been vacuumed — " +
          s"version $v's feed is not derivable; start at or after the " +
          "retention window")
    val prev = if (v <= 1) Nil else SnapshotStore.files(spark, root, v - 1)
    val cur = SnapshotStore.files(spark, root, v)
    val prevSet = prev.map(SnapshotStore.uriPath).toSet
    val curSet = cur.map(SnapshotStore.uriPath).toSet
    if (v > 1 && SnapshotStore.schemaOf(spark, root, v) !=
        SnapshotStore.schemaOf(spark, root, v - 1))
      throw new IllegalStateException(
        s"change feed of $root: version $v evolved the schema — the feed " +
          "is fixed to the stream-start schema")
    val eqPrev = if (v <= 1) Set.empty[String]
      else SnapshotStore.eqDeletes(spark, root, v - 1)
        .map(e => SnapshotStore.uriPath(e.path)).toSet
    if (SnapshotStore.eqDeletes(spark, root, v)
        .exists(e => !eqPrev(SnapshotStore.uriPath(e.path))))
      throw new IllegalStateException(
        s"change feed of $root: version $v added equality deletes — key " +
          "tombstones have no manifest-derivable row feed (compact first)")
    val lens = SnapshotStore.fileLens(spark, root, v)
    val lensPrev = if (v <= 1) Map.empty[String, Long]
      else SnapshotStore.fileLens(spark, root, v - 1)
    val dvPrev = if (v <= 1) Map.empty[String, Seq[(String, Long)]]
      else SnapshotTable.dvPointersAt(spark, root, v - 1)
    val dvCur = SnapshotTable.dvPointersAt(spark, root, v)
    val conf = spark.sparkContext.hadoopConfiguration
    def lenOf(f: String, m: Map[String, Long]): Long =
      m.getOrElse(SnapshotStore.uriPath(f), {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      })
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    def splits(f: String, len: Long, tpe: String, dv: Seq[(String, Long)],
        keep: Seq[(String, Long)]) =
      (0L until len by maxBytes).map(start =>
        new ChangeFeedInputPartition(f, start,
          math.min(maxBytes, len - start), len, tpe, v, dv, keep))
    val inserts = cur.filterNot(f => prevSet(SnapshotStore.uriPath(f)))
      .flatMap(f => splits(f, lenOf(f, lens), "insert",
        dvCur.getOrElse(SnapshotStore.uriPath(f), Nil), Nil))
    val deletes = prev.filterNot(f => curSet(SnapshotStore.uriPath(f)))
      .flatMap(f => splits(f, lenOf(f, lensPrev), "delete",
        dvPrev.getOrElse(SnapshotStore.uriPath(f), Nil), Nil))
    // MoR deletes: emit ONLY the newly tombstoned rows of still-live files
    val vectorDeletes = dvCur.toSeq.flatMap { case (uri, ptrs) =>
      val fresh = ptrs.filterNot(dvPrev.getOrElse(uri, Nil).toSet)
      if (fresh.isEmpty || !curSet(uri)) Nil
      else {
        val f = cur.find(x => SnapshotStore.uriPath(x) == uri).get
        splits(f, lenOf(f, lens), "delete",
          dvPrev.getOrElse(uri, Nil), fresh)
      }
    }
    inserts ++ deletes ++ vectorDeletes
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fmt = new ParquetFileFormat()
    def build(schema: StructType) =
      fmt.buildReaderWithPartitionValues(spark, base.schema,
        new StructType(), schema, Nil,
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
        spark.sessionState.newHadoopConf())
    def withIdx(s: StructType) = s.add(org.apache.spark.sql.execution
      .datasources.parquet.ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
      org.apache.spark.sql.types.LongType)
    val dvSchema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("pos", org.apache.spark.sql.types.LongType,
        nullable = false)))
    val dvbSchema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("bm", org.apache.spark.sql.types.BinaryType,
        nullable = false)))
    def auxReader(s: StructType) =
      new ParquetFileFormat().buildReaderWithPartitionValues(
        spark, s, new StructType(), s, Nil,
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
        spark.sessionState.newHadoopConf())
    new ChangeFeedReaderFactory(build(dataSchema),
      build(withIdx(dataSchema)), auxReader(dvSchema), auxReader(dvbSchema),
      dataSchema, outSchema)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ChangeFeedMicroBatchStream(spark, base, this, startingVersion)
}

/** Executor-side feed reading: the changed file's rows (row mode — feed
  * reads are change-sized), dv-filtered or keep-only-filtered on the
  * native row index, with the partition's `_change_type` and
  * `_commit_version` constants appended. */
class ChangeFeedReaderFactory(
    rowFunc: PartitionedFile => Iterator[InternalRow],
    idxRowFunc: PartitionedFile => Iterator[InternalRow],
    dvFunc: PartitionedFile => Iterator[InternalRow],
    dvbFunc: PartitionedFile => Iterator[InternalRow],
    dataSchema: StructType, outSchema: StructType)
  extends PartitionReaderFactory {

  private val nData = dataSchema.length

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangeFeedInputPartition]
    val needIdx = p.dvPaths.nonEmpty || p.keepOnly.nonEmpty
    val fn = if (needIdx) idxRowFunc else rowFunc
    val raw = fn(PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(p.file), p.start, p.length, Array.empty,
      0L, p.fileSize))
      .asInstanceOf[Iterator[Any]].flatMap {
        case b: ColumnarBatch => b.rowIterator().asScala
        case r: InternalRow => Iterator.single(r)
      }
    val dv =
      if (p.dvPaths.isEmpty) null
      else SnapshotReaderFactory.loadTombstones(p.file, p.dvPaths, dvFunc,
        dvbFunc)
    val keep =
      if (p.keepOnly.isEmpty) null
      else SnapshotReaderFactory.loadTombstones(p.file, p.keepOnly, dvFunc,
        dvbFunc)
    val filtered =
      if (!needIdx) raw
      else raw.filter { r =>
        val pos = r.getLong(nData)
        (dv == null || !dv.contains(pos)) &&
          (keep == null || keep.contains(pos))
      }
    // project to the (pruned) OUTPUT order: the reader row is
    // [data cols][idx?], joined with [change_type, version] — each output
    // field maps to its data ordinal or one of the two constants
    val constBase = nData + (if (needIdx) 1 else 0)
    val proj = UnsafeProjection.create(outSchema.fields.toSeq.map { f =>
      f.name match {
        case "_change_type" =>
          BoundReference(constBase, StringType, nullable = false)
        case "_commit_version" =>
          BoundReference(constBase + 1, IntegerType, nullable = false)
        case n =>
          val i = dataSchema.fieldIndex(n)
          BoundReference(i, f.dataType, f.nullable)
      }
    })
    val constRow = new GenericInternalRow(
      Array[Any](UTF8String.fromString(p.changeType), p.version))
    val joined = new JoinedRow
    val out = filtered.map(r => proj(joined(r, constRow)))
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (out.hasNext) { cur = out.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** Streaming half: versions are offsets, batch n = the feed of version n. */
class ChangeFeedMicroBatchStream(spark: SparkSession, base: SnapshotTable,
    scan: ChangeFeedScan, startingVersion: Option[Int])
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.Offset

  /** `Trigger.AvailableNow`: pin the drain target BEFORE the first
    * batch — the query never chases writers that keep committing. */
  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(current)

  /** A pinned `main` (write-audit-publish staging) caps the feed exactly
    * like the plain table stream: staged commits never leak. */
  private def current: Int = {
    val tip = math.max(base.snapVersion,
      SnapshotStore.currentVersion(spark, base.root))
    SnapshotStore.refsOf(spark, base.root).get("main").flatten match {
      case Some(pin) if pin >= base.snapVersion => pin
      case _ => tip
    }
  }

  override def initialOffset(): Offset =
    SnapshotVersionOffset(startingVersion.getOrElse(base.snapVersion))

  override def latestOffset(): Offset =
    SnapshotVersionOffset(availableNowCap.getOrElse(current))

  // SupportsTriggerAvailableNow extends SupportsAdmissionControl: the
  // feed's unit of arrival is the version — no finer limit to honor
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = SnapshotVersionOffset(availableNowCap.getOrElse(current))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset = SnapshotVersionOffset(current)

  override def deserializeOffset(json: String): Offset =
    SnapshotVersionOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotVersionOffset].version
    val e = end.asInstanceOf[SnapshotVersionOffset].version
    SnapshotStore.versions(spark, base.root)
      .filter(v => v > s && v <= e).flatMap(scan.feedPartitions).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
