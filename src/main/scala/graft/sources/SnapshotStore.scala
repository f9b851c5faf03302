package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SNAPSHOT LAYER over a directory of parquet data files — the manifest
  * mechanism every table format (and the reference's own commit protocol,
  * `ReduceRunner.java:113-122` via the graft-tsv `_SUCCESS` manifest) uses
  * to make multi-file mutation atomic, here generalized to VERSIONED
  * manifests so the copy-on-write family (q288-q290) gains what a bare
  * directory cannot give:
  *
  *  - ATOMIC COMMIT: a writer stages new data files, then publishes ONE
  *    manifest file `_graft_snapshots/v%05d.txt` (temp + rename — the
  *    filesystem's atomicity primitive). Readers resolve the max committed
  *    version and read exactly its file list: no reader ever sees a
  *    half-applied rewrite (the read-consistency hole the manifest-less
  *    q288 documents).
  *  - TIME TRAVEL: old versions' manifests AND data files stay on disk
  *    until vacuumed, so `read(root, v)` reproduces any historical
  *    snapshot bit-for-bit — rewrites APPEND new files, never delete.
  *  - OPTIMISTIC CONCURRENCY: `commit` takes the version the writer based
  *    its rewrite on; if another writer published meanwhile, the rename
  *    target exists and the commit fails with a conflict instead of
  *    silently clobbering (first-writer-wins, the standard OCC contract).
  *  - VACUUM: drop all but the newest `keep` versions and delete the data
  *    files no retained version references (the q218 generation-GC
  *    argument: new readers resolve only retained versions; the retention
  *    window covers in-flight readers of expired ones).
  *
  * At 100 TB: a manifest is |files| lines of driver-scale metadata; commit
  * cost is one rename regardless of table size; time travel and change
  * feeds (q304) are manifest DIFFS — they read only the files that
  * changed, never the table.
  */
object SnapshotStore {

  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapDir(root: String) =
    new org.apache.hadoop.fs.Path(root, "_graft_snapshots")

  private val VersionRe = "v(\\d{5})\\.txt".r

  /** Committed versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val d = snapDir(root)
    val f = fs(spark, d)
    if (!f.exists(d)) return Nil
    f.listStatus(d).map(_.getPath.getName).toSeq
      .collect { case VersionRe(n) => n.toInt }.sorted
  }

  def currentVersion(spark: SparkSession, root: String): Int =
    versions(spark, root).lastOption.getOrElse(0)

  /** The file list of `version` (default: latest). */
  def files(spark: SparkSession, root: String, version: Int = -1): Seq[String] = {
    val v = if (version > 0) version else currentVersion(spark, root)
    require(v > 0, s"no committed snapshot under $root")
    val p = new org.apache.hadoop.fs.Path(snapDir(root), f"v$v%05d.txt")
    val in = fs(spark, p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Read snapshot `version` (default: latest). */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame =
    spark.read.parquet(files(spark, root, version): _*)

  /** Publish `fileList` as the next version after `expectedVersion`.
    * Fails with [[CommitConflictException]] if another writer committed
    * first (the rename target already exists). Returns the new version. */
  def commit(spark: SparkSession, root: String, fileList: Seq[String],
      expectedVersion: Int): Int = {
    val d = snapDir(root)
    val f = fs(spark, d)
    f.mkdirs(d)
    val next = expectedVersion + 1
    val tmp = new org.apache.hadoop.fs.Path(d,
      s".v$next.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, false)
    try out.write((fileList.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = new org.apache.hadoop.fs.Path(d, f"v$next%05d.txt")
    // rename is the atomicity primitive: false when the target exists
    // (another writer won the race) — clean up and report the conflict
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new CommitConflictException(
        s"snapshot v$next already committed under $root " +
          s"(writer based on v$expectedVersion lost the race)")
    }
    next
  }

  /** Write `df` as new data files under `root`, named uniquely per commit
    * attempt; returns their paths (NOT yet visible — only a manifest
    * commit publishes them). */
  def writeData(spark: SparkSession, root: String, df: DataFrame,
      tag: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val staging = java.nio.file.Files.createTempDirectory("graft_snap_stage")
    try {
      df.write.parquet(s"$staging/d")
      val rootPath = java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(root).toUri.getPath)
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$staging/d"))
        .iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .zipWithIndex.map { case (p, i) =>
          val dst = rootPath.resolve(
            s"${tag}_${java.util.UUID.randomUUID().toString.take(8)}_$i.parquet")
          java.nio.file.Files.move(p, dst)
          dst.toString
        }.toList
    } finally {
      graft.streaming.EventStreams.deleteTreeOnExit(staging)
    }
  }

  // ---- per-file statistics in the manifest sidecar -------------------------
  //
  // What real formats store NEXT TO the file list: per-file [min, max] of
  // the clustering key, so a snapshot read with a key predicate opens only
  // admissible files — the SkippingIndexRule economics made a property of
  // the COMMIT (statistics are computed when the files are written and
  // versioned with them, so they can never go stale: a new version gets
  // new stats, an old version's stats describe exactly its frozen files).

  private def statsPath(root: String, v: Int) =
    new org.apache.hadoop.fs.Path(snapDir(root), f"v$v%05d_stats.parquet")

  private def uriPath(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  /** Compute and persist per-file [min, max] of `keyCol` for `version`
    * (default: latest) — one aggregate over the snapshot's files. */
  def writeStats(spark: SparkSession, root: String, keyCol: String,
      version: Int = -1): Unit = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val v = if (version > 0) version else currentVersion(spark, root)
    spark.read.parquet(files(spark, root, v): _*)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"))
      .coalesce(1).write.mode("overwrite")
      .parquet(statsPath(root, v).toString)
  }

  /** The files of `version` admissible for keyCol ∈ [lo, hi]: interval
    * overlap against the sidecar stats; files without a stats row (or a
    * missing sidecar) are kept unconditionally — pruning loses power,
    * never rows. */
  def filesWhere(spark: SparkSession, root: String, lo: Long, hi: Long,
      version: Int = -1): Seq[String] = {
    val v = if (version > 0) version else currentVersion(spark, root)
    val fl = files(spark, root, v)
    val sp = statsPath(root, v)
    if (!fs(spark, sp).exists(sp)) return fl
    val byFile = spark.read.parquet(sp.toString).collect()
      .map(r => uriPath(r.getString(0)) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    fl.filter { f =>
      byFile.get(uriPath(f)) match {
        case Some((l, h)) => !(h < lo || l > hi)
        case None => true
      }
    }
  }

  /** Retain the newest `keep` versions; delete expired manifests and every
    * data file no retained version references. Returns (removed data
    * files, removed versions). */
  def vacuum(spark: SparkSession, root: String,
      keep: Int): (Seq[String], Seq[Int]) = {
    require(keep >= 1, "vacuum must keep at least the latest snapshot")
    val all = versions(spark, root)
    val expired = all.dropRight(keep)
    if (expired.isEmpty) return (Nil, Nil)
    val live = all.takeRight(keep)
      .flatMap(v => files(spark, root, v)).toSet
    val doomed = expired.flatMap(v => files(spark, root, v)).distinct
      .filterNot(live)
    val f = fs(spark, new org.apache.hadoop.fs.Path(root))
    doomed.foreach(p =>
      f.delete(new org.apache.hadoop.fs.Path(p), false))
    expired.foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(snapDir(root), f"v$v%05d.txt"),
        false)
      f.delete(statsPath(root, v), true) // stats die with their version
    }
    (doomed, expired)
  }
}
