package graft.queries

import graft.{QueryDef, Tables}
import graft.Exact.{dsum2, sqlSum2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level table mutation — the lakehouse primitives (MERGE INTO,
  * predicate DELETE, streaming CDC apply) over a plain parquet layout,
  * implemented COPY-ON-WRITE with statistics-pruned file rewrites.
  *
  * The reference's only mutation story is "rewrite the whole output"
  * (`ReduceRunner.java:113-122` commits a full file per reducer); every
  * table format since has converged on the same answer at scale: cluster
  * the table by its key, keep per-file key statistics, and rewrite ONLY
  * the files a change batch can possibly touch. This module closes the
  * warehouse-maintenance family (q213 partition refresh, q215 compaction,
  * q218 vacuum, q222 IVM) with the missing member: KEYED row mutation.
  *
  * Mechanics shared by all three entries:
  *  - the base table is written clustered by key (`repartitionByRange`),
  *    so each file owns a key interval;
  *  - a change batch's AFFECTED FILES are found by range-joining the
  *    |files|-row zone map (min/max key per file, one aggregate pass)
  *    against the change keys — the zone test is conservative (a covering
  *    file is rewritten even if the key is absent) and therefore sound;
  *  - the rewrite reads ONLY affected files, applies the row operations,
  *    stages the result off the table (`localCheckpoint` — the q215
  *    self-insert discipline), deletes the replaced files, and appends
  *    the new ones; untouched files are never opened, let alone
  *    rewritten — the `history_untouched` gate pins them bit-identical
  *    by (path, length, mtime) snapshot, and `pruned` pins that strictly
  *    fewer than all files were rewritten.
  *
  * At 100 TB: the zone map is |files| rows (driver-scale); affected-file
  * discovery is one broadcast join of the zone frame against the change
  * batch; rewrite cost is O(affected slice), not O(table). Single-writer
  * per table, the documented warehouse contract (SURVEY §7.10); readers
  * between the delete and the append of one commit see a partial table —
  * the same window every manifest-less parquet directory has, and why
  * real formats add a manifest (the graft-tsv sink demonstrates that
  * commit protocol; here the subject is the REWRITE economics).
  */
object Lakehouse {

  // ---- shared copy-on-write machinery --------------------------------------

  private def listDataFiles(layout: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(layout)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      .toSeq
  }

  /** Write `df` clustered by `key` into a fresh temp layout of ~`nFiles`
    * files (each file owns a key interval — the precondition every
    * stats-pruned mutation shares with q125's z-order clustering). */
  private def writeClustered(spark: SparkSession, df: DataFrame, key: String,
      nFiles: Int, tag: String): String = {
    val out = java.nio.file.Files.createTempDirectory(s"graft_cow_$tag")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val layout = s"$out/table"
    df.repartitionByRange(nFiles, col(key)).write.parquet(layout)
    layout
  }

  /** The files whose [min,max] key interval covers at least one key of
    * `keys` — the zone-map admissibility test run as one broadcast join.
    * Conservative: covering-but-not-containing files are returned too
    * (an extra rewrite, never a lost row). */
  private def affectedFilesOf(spark: SparkSession, layout: String,
      key: String, keys: DataFrame): Seq[String] = {
    val zones = spark.read.parquet(layout)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(key)).as("lo"), max(col(key)).as("hi"))
    keys.toDF("k").join(broadcast(zones),
        col("k") >= col("lo") && col("k") <= col("hi"))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq // |files|-bounded
  }

  private def normName(s: String): String =
    new org.apache.hadoop.fs.Path(s).getName

  /** Apply a copy-on-write rewrite: replace `affected` files with
    * `newContent` (staged off the table first), append `extra` rows as
    * new files, and return (pruned, historyUntouched). */
  private def commitRewrite(spark: SparkSession, layout: String,
      affected: Seq[String], newContent: Option[DataFrame],
      extra: Option[DataFrame]): (Boolean, Boolean) = {
    val all = listDataFiles(layout)
    val affectedNames = affected.map(normName).toSet
    val untouchedBefore = all.filterNot(p => affectedNames(p.getFileName.toString))
      .map(p => p.toString ->
        ((java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)))
      .toMap
    val pruned = affected.nonEmpty && affected.size < all.size
    // stage BEFORE deleting the files the content was read from
    val staged = newContent.map(_.localCheckpoint())
    val extraStaged = extra.map(_.localCheckpoint())
    all.filter(p => affectedNames(p.getFileName.toString))
      .foreach(java.nio.file.Files.delete(_))
    staged.foreach(_.write.mode("append").parquet(layout))
    extraStaged.foreach(_.write.mode("append").parquet(layout))
    val after = listDataFiles(layout)
      .map(p => p.toString ->
        ((java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)))
      .toMap
    val untouched = untouchedBefore.forall { case (f, sig) =>
      after.get(f).contains(sig)
    }
    (pruned, untouched)
  }

  // ---- q288: MERGE INTO, copy-on-write, stats-pruned -----------------------

  /** q288: MERGE — the full three-way contract over the orders table:
    * WHEN MATCHED [range, key%3=0] UPDATE (price += 1, priority tagged),
    * WHEN MATCHED [range, key%3=1] DELETE,
    * WHEN NOT MATCHED [range, key%3=2 re-keyed out of domain] INSERT.
    * The change batch targets ONE key decile ([max/2, max/2 + max/10]),
    * so the clustered layout localizes every matched row to 1-2 of the 8
    * files — `pruned` pins that the other files were not rewritten, the
    * oracle (the same merge in SQL) pins that no row was lost, duplicated,
    * or half-updated, and `history_untouched` pins the untouched files
    * bit-identical. Updates are exact by the dsum2 argument: price is a
    * raw 2-dp double, +1.0 is the identical IEEE op in both engines. */
  def cowMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "orders")
    val layout = writeClustered(spark, base, "o_orderkey", 8, "merge")
    val table = spark.read.parquet(layout)
    val mx = table.agg(max(col("o_orderkey"))).head().getLong(0)
    val lo = mx / 2
    val hi = lo + mx / 10
    val inRange = table.where(col("o_orderkey").between(lo, hi))
      .localCheckpoint() // feeds keys, updates, inserts — one scan
    val updKeys = inRange.where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"))
    val delKeys = inRange.where(col("o_orderkey") % 3 === 1)
      .select(col("o_orderkey"))
    val inserts = inRange.where(col("o_orderkey") % 3 === 2)
      .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
        col("o_custkey"), lit("N").as("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    val matched = updKeys.union(delKeys)
    val affected = affectedFilesOf(spark, layout, "o_orderkey", matched)
    val content = spark.read.parquet(affected: _*)
    val merged = content
      .join(updKeys.withColumnRenamed("o_orderkey", "uk"),
        col("o_orderkey") === col("uk"), "left")
      .join(delKeys.withColumnRenamed("o_orderkey", "dk"),
        col("o_orderkey") === col("dk"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        when(col("uk").isNotNull, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderdate"),
        when(col("uk").isNotNull, lit("MERGED"))
          .otherwise(col("o_orderpriority")).as("o_orderpriority"))
    val (pruned, untouched) =
      commitRewrite(spark, layout, affected, Some(merged), Some(inserts))
    spark.read.parquet(layout)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total_price"),
        sum(when(col("o_orderpriority") === "MERGED", lit(1L))
          .otherwise(lit(0L))).as("n_merged"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        col("n_merged"), lit(pruned).as("pruned"),
        lit(untouched).as("history_untouched"))
  }

  private val cowMergeSql =
    s"""WITH rng AS (
       |  SELECT (max(o_orderkey) // 2) AS lo,
       |         (max(o_orderkey) // 2) + (max(o_orderkey) // 10) AS hi
       |  FROM orders),
       |upd AS (SELECT o_orderkey FROM orders, rng
       |        WHERE o_orderkey BETWEEN lo AND hi AND o_orderkey % 3 = 0),
       |del AS (SELECT o_orderkey FROM orders, rng
       |        WHERE o_orderkey BETWEEN lo AND hi AND o_orderkey % 3 = 1),
       |fin AS (
       |  SELECT b.o_orderstatus,
       |    CASE WHEN u.o_orderkey IS NOT NULL THEN b.o_totalprice + 1.0
       |         ELSE b.o_totalprice END AS price,
       |    CASE WHEN u.o_orderkey IS NOT NULL THEN 'MERGED'
       |         ELSE b.o_orderpriority END AS prio
       |  FROM orders b LEFT JOIN upd u ON b.o_orderkey = u.o_orderkey
       |  WHERE NOT EXISTS (SELECT 1 FROM del d WHERE d.o_orderkey = b.o_orderkey)
       |  UNION ALL
       |  SELECT 'N' AS o_orderstatus, o_totalprice AS price,
       |    o_orderpriority AS prio
       |  FROM orders, rng
       |  WHERE o_orderkey BETWEEN lo AND hi AND o_orderkey % 3 = 2)
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum2("price")} AS total_price,
       |  CAST(count(*) FILTER (WHERE prio = 'MERGED') AS BIGINT) AS n_merged,
       |  TRUE AS pruned, TRUE AS history_untouched
       |FROM fin GROUP BY 1""".stripMargin

  // ---- q289: predicate DELETE, copy-on-write, stats-pruned -----------------

  /** q289: DELETE WHERE key BETWEEN — the GDPR/retention shape: a pure
    * range predicate on the clustering key, where zone pruning is EXACT
    * (affected files are precisely those whose interval meets the range).
    * The rewrite anti-filters the affected slice; every other file is
    * untouched. Oracle = the surviving table, so a row deleted too many
    * or too few fails the hash. */
  def cowDelete(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "orders")
    val layout = writeClustered(spark, base, "o_orderkey", 8, "delete")
    val table = spark.read.parquet(layout)
    val mx = table.agg(max(col("o_orderkey"))).head().getLong(0)
    val lo = mx / 10
    val hi = lo + mx / 20
    val matched = table.where(col("o_orderkey").between(lo, hi))
      .select(col("o_orderkey"))
    val affected = affectedFilesOf(spark, layout, "o_orderkey", matched)
    val survivors = spark.read.parquet(affected: _*)
      .where(!col("o_orderkey").between(lo, hi))
    val (pruned, untouched) =
      commitRewrite(spark, layout, affected, Some(survivors), None)
    spark.read.parquet(layout)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        lit(pruned).as("pruned"), lit(untouched).as("history_untouched"))
  }

  private val cowDeleteSql =
    s"""WITH rng AS (
       |  SELECT (max(o_orderkey) // 10) AS lo,
       |         (max(o_orderkey) // 10) + (max(o_orderkey) // 20) AS hi
       |  FROM orders)
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum2("o_totalprice")} AS total_price,
       |  TRUE AS pruned, TRUE AS history_untouched
       |FROM orders, rng
       |WHERE o_orderkey NOT BETWEEN lo AND hi
       |GROUP BY 1""".stripMargin

  // ---- q290: streaming CDC apply (absolute row images, idempotent) --------

  /** q290: STREAMING CDC APPLY — the change stream lands as micro-batches
    * of ABSOLUTE row images (the CDC contract that makes apply idempotent
    * under foreachBatch's at-least-once retry: re-applying an image is a
    * no-op, unlike a delta). Each batch MERGEs into the clustered table
    * copy-on-write: affected files full-outer the batch slice (update
    * where matched, insert where the file range covers a new key), keys
    * outside every file's range append as new files. Three staged change
    * files × `maxFilesPerTrigger=1` force three real micro-batches
    * through `MicroBatchExecution`; the oracle is the ONE-SHOT merge in
    * SQL, so the sequential applies must compose to exactly the batch
    * semantics. Updates set price to a value derived from the key alone
    * (`key % 1000 + 0.5`, exactly representable), so any re-ordering or
    * re-delivery that double-applied would still hash-match only if the
    * final state is right. */
  def streamCdcApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val base = Tables(spark, dir, "orders")
    val layout = writeClustered(spark, base, "o_orderkey", 8, "cdc")
    // the change stream: updates (existing keys % 7 = 0, new price) and
    // inserts (keys % 11 = 0 re-keyed out of domain), absolute images
    val updates = base.where(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        ((col("o_orderkey") % 1000).cast("double") + lit(0.5))
          .as("o_totalprice"),
        col("o_orderdate"), lit("CDC").as("o_orderpriority"))
    val inserts = base.where(col("o_orderkey") % 11 === 0)
      .select((col("o_orderkey") + lit(200000000L)).as("o_orderkey"),
        col("o_custkey"), lit("N").as("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    val changes = updates.unionByName(inserts).localCheckpoint()
    val inDir = java.nio.file.Files.createTempDirectory("graft_cdc_in")
    graft.streaming.EventStreams.deleteTreeOnExit(inDir)
    (0 until 3).foreach { b =>
      changes.where(pmod(col("o_orderkey"), lit(3)) === b)
        .coalesce(1).write.parquet(s"$inDir/c$b")
    }
    val ck = java.nio.file.Files.createTempDirectory("graft_cdc_ck")
    graft.streaming.EventStreams.deleteTreeOnExit(ck)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream
      .schema(changes.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/c*")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck.toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.incrementAndGet()
        applyImages(spark, layout, batch)
      }
      .start()
    q.awaitTermination()
    val threeBatches = batches.get() == 3
    spark.read.parquet(layout)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total_price"),
        sum(when(col("o_orderpriority") === "CDC", lit(1L))
          .otherwise(lit(0L))).as("n_cdc"))
      .select(col("o_orderstatus"), col("n"), col("total_price"),
        col("n_cdc"), lit(threeBatches).as("three_batches"))
  }

  /** MERGE one batch of absolute row images into the clustered layout:
    * rows in affected files are replaced-or-kept (anti-join + union —
    * exact upsert even when a zone covers a key the file doesn't hold),
    * images no file's range covers are appended as new files. */
  private[graft] def applyImages(spark: SparkSession, layout: String,
      batch: DataFrame): Unit = {
    val images = batch.localCheckpoint() // one materialization per batch
    val keys = images.select(col("o_orderkey"))
    val affected = affectedFilesOf(spark, layout, "o_orderkey", keys)
    val zones = spark.read.parquet(layout)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
    val covered = images.join(broadcast(zones),
        col("o_orderkey") >= col("lo") && col("o_orderkey") <= col("hi"),
        "left_semi")
    val uncovered = images.join(broadcast(zones),
        col("o_orderkey") >= col("lo") && col("o_orderkey") <= col("hi"),
        "left_anti")
    val merged =
      if (affected.isEmpty) None
      else Some(spark.read.parquet(affected: _*)
        .join(keys.withColumnRenamed("o_orderkey", "k"),
          col("o_orderkey") === col("k"), "left_anti")
        .unionByName(covered))
    commitRewrite(spark, layout, affected, merged, Some(uncovered))
  }

  private val streamCdcApplySql =
    s"""WITH fin AS (
       |  SELECT o_orderstatus,
       |    CASE WHEN o_orderkey % 7 = 0
       |         THEN CAST(o_orderkey % 1000 AS DOUBLE) + 0.5
       |         ELSE o_totalprice END AS price,
       |    CASE WHEN o_orderkey % 7 = 0 THEN 'CDC'
       |         ELSE o_orderpriority END AS prio
       |  FROM orders
       |  UNION ALL
       |  SELECT 'N' AS o_orderstatus, o_totalprice AS price,
       |    o_orderpriority AS prio
       |  FROM orders WHERE o_orderkey % 11 = 0)
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       |  ${sqlSum2("price")} AS total_price,
       |  CAST(count(*) FILTER (WHERE prio = 'CDC') AS BIGINT) AS n_cdc,
       |  TRUE AS three_batches
       |FROM fin GROUP BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q288_cow_merge", cowMerge, Some(cowMergeSql)),
    QueryDef("q289_cow_delete", cowDelete, Some(cowDeleteSql)),
    QueryDef("q290_stream_cdc_apply", streamCdcApply, Some(streamCdcApplySql)))
}
