package graft

import org.scalatest.funsuite.AnyFunSuite

/** Copy-on-write mutation on closed-form inputs: a tiny clustered table
  * whose affected files, survivors, and merged images are known exactly —
  * the upsert edge cases (covered-but-absent key, out-of-range key) that
  * the registry's oracle can't isolate. */
class LakehouseSpec extends AnyFunSuite {
  import TestSpark.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** keys 1..40 except 25, clustered into 4 files of 10-key ranges. */
  private def freshTable(): String = {
    val out = java.nio.file.Files.createTempDirectory("lakehousespec")
    val layout = s"$out/table"
    (1L to 40L).filter(_ != 25L)
      .map(k => (k, k * 10, "O", k.toDouble, new java.sql.Timestamp(0L), "P"))
      .toDF(cols: _*)
      .repartitionByRange(4, col("o_orderkey")).write.parquet(layout)
    layout
  }

  private def files(layout: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(layout))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toSet
  }

  test("applyImages updates matched rows, inserts covered-but-absent and out-of-range keys") {
    val layout = freshTable()
    val before = files(layout)
    assert(before.size == 4)
    // images: 12 exists (update), 25 is covered by a file's [21,30] zone
    // but ABSENT (must insert, not vanish), 999 is outside every zone
    // (must append as a new file)
    val images = Seq(
      (12L, 0L, "U", 1200.0, new java.sql.Timestamp(0L), "CDC"),
      (25L, 0L, "U", 2500.0, new java.sql.Timestamp(0L), "CDC"),
      (999L, 0L, "U", 9990.0, new java.sql.Timestamp(0L), "CDC"))
      .toDF(cols: _*)
    graft.queries.Lakehouse.applyImages(spark, layout, images)
    val t = spark.read.parquet(layout)
    assert(t.count() == 41) // 39 base + inserted 25 + appended 999
    val got = t.where(col("o_orderpriority") === "CDC")
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((12L, 1200.0), (25L, 2500.0), (999L, 9990.0)))
    // exactly one pre-image row was replaced, none duplicated
    assert(t.where(col("o_orderkey") === 12L).count() == 1)
    // untouched ranges' files survive bit-identical (same names still present)
    val after = files(layout)
    assert(before.intersect(after).size >= 2,
      s"too many files rewritten: before=$before after=$after")
  }

  test("snapshot commits are atomic; racing writers conflict, never clobber") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("snapspec")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val f1 = SnapshotStore.writeData(spark,
      root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "w1")
    assert(SnapshotStore.commit(spark, root, f1, 0) == 1)
    // two writers both based on v1: the second rename loses
    val f2 = SnapshotStore.writeData(spark,
      root, Seq((3L, "c")).toDF("k", "v"), "w2")
    val f3 = SnapshotStore.writeData(spark,
      root, Seq((4L, "d")).toDF("k", "v"), "w3")
    assert(SnapshotStore.commit(spark, root, f1 ++ f2, 1) == 2)
    intercept[SnapshotStore.CommitConflictException] {
      SnapshotStore.commit(spark, root, f1 ++ f3, 1)
    }
    // the loser retries against the new current version and succeeds
    assert(SnapshotStore.commit(spark, root,
      SnapshotStore.files(spark, root) ++ f3, 2) == 3)
    // time travel: every version reproduces its exact content
    assert(SnapshotStore.read(spark, root, 1).count() == 2)
    assert(SnapshotStore.read(spark, root, 2).count() == 3)
    assert(SnapshotStore.read(spark, root, 3).count() == 4)
    // vacuum to the latest: old manifests gone, latest intact
    val (_, gone) = SnapshotStore.vacuum(spark, root, keep = 1)
    assert(gone == Seq(1, 2))
    assert(SnapshotStore.read(spark, root).count() == 4)
  }

  test("snapshot stats prune key-range reads; no sidecar means no pruning, never loss") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("snapstatspec")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val fLow = SnapshotStore.writeData(spark, root,
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1), "low")
    val fHigh = SnapshotStore.writeData(spark, root,
      (100L to 110L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1), "high")
    SnapshotStore.commit(spark, root, fLow ++ fHigh, 0)
    // no sidecar yet: filesWhere keeps everything (sound fallback)
    assert(SnapshotStore.filesWhere(spark, root, 1L, 5L).size == 2)
    // with stats: only the interval-admissible file is opened
    SnapshotStore.writeStats(spark, root, "k")
    val admitted = SnapshotStore.filesWhere(spark, root, 1L, 5L)
    assert(admitted.size == 1, admitted)
    assert(spark.read.parquet(admitted: _*)
      .where(col("k").between(1L, 5L)).count() == 5)
    // a disjoint range admits nothing; the read would be empty, not wrong
    assert(SnapshotStore.filesWhere(spark, root, 50L, 60L).isEmpty)
    // stats die with their version: a v2 commit has no sidecar -> fallback
    val f3 = SnapshotStore.writeData(spark, root,
      Seq((200L, "x")).toDF("k", "v").coalesce(1), "mid")
    SnapshotStore.commit(spark, root, fLow ++ fHigh ++ f3, 1)
    assert(SnapshotStore.filesWhere(spark, root, 1L, 5L).size == 3)
    // vacuum removes v1's sidecar together with the version
    SnapshotStore.writeStats(spark, root, "k")
    SnapshotStore.vacuum(spark, root, keep = 1)
    assert(SnapshotStore.filesWhere(spark, root, 1L, 5L).size == 1)
  }

  test("OCC is race-proof: concurrent commits to one version, exactly one wins, never clobbered") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("snaprace")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val f1 = SnapshotStore.writeData(spark,
      root, Seq((1L, "a")).toDF("k", "v"), "w1")
    assert(SnapshotStore.commit(spark, root, f1, 0) == 1)
    // two threads race the SAME next version with different manifests —
    // the check-then-rename hazard window; publication must be exclusive
    val lists = Seq(
      SnapshotStore.writeData(spark, root, Seq((2L, "b")).toDF("k", "v"), "wA"),
      SnapshotStore.writeData(spark, root, Seq((3L, "c")).toDF("k", "v"), "wB"))
      .map(f1 ++ _)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results =
      new java.util.concurrent.ConcurrentHashMap[Int, Either[Unit, Int]]()
    val threads = lists.zipWithIndex.map { case (fl, i) =>
      new Thread(() => {
        barrier.await()
        try results.put(i, Right(SnapshotStore.commit(spark, root, fl, 1)))
        catch {
          case _: SnapshotStore.CommitConflictException =>
            results.put(i, Left(()))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val outcomes = results.asScala
    assert(outcomes.values.count(_.isRight) == 1, outcomes)
    assert(outcomes.values.count(_.isLeft) == 1, outcomes)
    // the manifest holds exactly the WINNER's list — not a torn mix
    val winner = lists(outcomes.collectFirst {
      case (i, Right(_)) => i
    }.get)
    assert(SnapshotStore.files(spark, root, 2).toSet == winner.toSet)
  }

  test("snapshot layer works through an explicit file: URI (Hadoop FileSystem path)") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("snapuri")
    val root = s"file://$out/t"
    val f1 = SnapshotStore.writeData(spark, root,
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1), "a")
    assert(SnapshotStore.commit(spark, root, f1, 0) == 1)
    val f2 = SnapshotStore.writeData(spark, root,
      Seq((11L, "x")).toDF("k", "v").coalesce(1), "b")
    assert(SnapshotStore.commit(spark, root, f1 ++ f2, 1) == 2)
    assert(SnapshotStore.read(spark, root, 1).count() == 10)
    assert(SnapshotStore.read(spark, root, 2).count() == 11)
    SnapshotStore.writeStats(spark, root, "k")
    assert(SnapshotStore.filesWhere(spark, root, 11L, 11L).size == 1)
    val (gone, vs) = SnapshotStore.vacuum(spark, root, keep = 1)
    assert(vs == Seq(1) && gone.isEmpty) // v1's files all live in v2
    assert(SnapshotStore.read(spark, root).count() == 11)
  }

  test("reader overlapping a snapshot commit sees v_n or v_n+1, never a partial table") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("snapreader")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val f1 = SnapshotStore.writeData(spark, root,
      (1L to 20L).map(k => (k, k.toDouble)).toDF("k", "p")
        .repartitionByRange(2, col("k")), "base")
    SnapshotStore.commit(spark, root, f1, 0)
    // reader resolves BEFORE the mutation commits
    val early = SnapshotStore.read(spark, root)
    // a second reader lands MID-COMMIT: after staging, before publish —
    // it must resolve v1 (staged files are invisible, live files intact)
    val staged = SnapshotStore.writeData(spark, root,
      Seq((99L, 99.0)).toDF("k", "p"), "mid")
    assert(SnapshotStore.read(spark, root).count() == 20)
    SnapshotStore.commit(spark, root, f1 ++ staged, 1)
    // the early reader still returns exactly v1's content (no file of a
    // committed version is ever deleted by a rewrite — vacuum owns that)
    assert(early.count() == 20)
    assert(early.agg(sum(col("k"))).head().getLong(0) == 210L)
    assert(SnapshotStore.read(spark, root).count() == 21)
  }

  test("racing mergers: the loser retries against the winner's snapshot and both changes land") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("snapmergers")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val f1 = SnapshotStore.writeData(spark, root,
      (1L to 40L).map(k => (k, k.toDouble)).toDF("k", "p")
        .repartitionByRange(4, col("k")), "base")
    SnapshotStore.commit(spark, root, f1, 0)
    def bump(lo: Long, hi: Long)(cur: Seq[String]) = {
      val t = spark.read.parquet(cur: _*)
      val affected = t.where(col("k").between(lo, hi))
        .select(input_file_name().as("f")).distinct()
        .collect().map(r =>
          new org.apache.hadoop.fs.Path(r.getString(0)).toUri.getPath).toSeq
      val repl = spark.read.parquet(affected: _*)
        .select(col("k"), when(col("k").between(lo, hi), col("p") + 1000.0)
          .otherwise(col("p")).as("p"))
      (affected, Some(repl): Option[org.apache.spark.sql.DataFrame], None)
    }
    // merger B reads v1; merger A commits underneath it (simulated by
    // running A inside B's first derivation); B's commit conflicts, the
    // retry re-derives from A's v2, and BOTH updates land
    var bDerivations = 0
    val (vB, _) = graft.queries.Lakehouse.mutateSnapshot(spark, root, "B") {
      cur =>
        bDerivations += 1
        if (bDerivations == 1)
          graft.queries.Lakehouse.mutateSnapshot(spark, root, "A")(bump(1, 10))
        bump(31, 40)(cur)
    }
    assert(bDerivations == 2, "B must have re-derived after the conflict")
    assert(vB == 3)
    val fin = SnapshotStore.read(spark, root)
    assert(fin.count() == 40)
    assert(fin.where(col("p") > 1000.0).count() == 20) // both ranges applied
    // and the intermediate versions time-travel: v2 has only A's change
    assert(SnapshotStore.read(spark, root, 2)
      .where(col("p") > 1000.0).count() == 10)
  }

  test("attachSkipping prunes manifest reads via the rule; a newer version's unknown files fall back, re-attach restores pruning") {
    import graft.sources.SnapshotStore
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def filesIn(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r.relation match {
          case h: HadoopFsRelation => h.location.inputFiles.length
          case _ => 0
        }
      }.sum
    val out = java.nio.file.Files.createTempDirectory("attachskip")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val f1 = SnapshotStore.writeData(spark, root,
      (1L to 100L).map(k => (k, k * 2)).toDF("k", "v")
        .repartitionByRange(4, col("k")), "base")
    SnapshotStore.commit(spark, root, f1, 0)
    SnapshotStore.writeStats(spark, root, "k")
    try {
      assert(SnapshotStore.attachSkipping(spark, root) == 1)
      val pruned = SnapshotStore.read(spark, root).where(col("k") === 5L)
      assert(filesIn(pruned) == 1, filesIn(pruned))
      assert(pruned.collect().map(_.getLong(1)).toSeq == Seq(10L))
      // a NEW commit appends files the attached (v1) stats never saw:
      // they are kept unconditionally — pruning power lost, rows never
      val f2 = SnapshotStore.writeData(spark, root,
        Seq((200L, 400L)).toDF("k", "v").coalesce(1), "more")
      SnapshotStore.commit(spark, root, f1 ++ f2, 1)
      val fallback = SnapshotStore.read(spark, root).where(col("k") === 5L)
      assert(filesIn(fallback) == 2, filesIn(fallback)) // 1 admitted + 1 unknown
      assert(fallback.count() == 1)
      // re-attach the CURRENT version's stats: full pruning returns
      SnapshotStore.writeStats(spark, root, "k")
      assert(SnapshotStore.attachSkipping(spark, root) == 2)
      val again = SnapshotStore.read(spark, root).where(col("k") === 5L)
      assert(filesIn(again) == 1, filesIn(again))
      assert(SnapshotStore.read(spark, root).where(col("k") === 200L)
        .count() == 1)
    } finally SnapshotStore.dropSkipping(spark, root)
  }

  test("merge-on-read: delete vectors apply on read, stack across commits, reconcile, vacuum") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("snapmor")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val f1 = SnapshotStore.writeData(spark, root,
      (1L to 30L).map(k => (k, k.toDouble)).toDF("k", "p")
        .repartitionByRange(3, col("k")), "base")
    SnapshotStore.commit(spark, root, f1, 0)
    // a reader resolves v1 BEFORE the MoR commit
    val early = SnapshotStore.read(spark, root)
    // v2: tombstone k in [5, 8] — data files untouched
    val dv1 = SnapshotStore.writeData(spark, root,
      SnapshotStore.tombstonesWhere(spark, root, col("k").between(5, 8))
        .coalesce(1), "dv1")
    SnapshotStore.commit(spark, root,
      f1 ++ dv1.map(SnapshotStore.dvLine), 1)
    assert(SnapshotStore.read(spark, root).count() == 26)
    assert(SnapshotStore.read(spark, root)
      .where(col("k").between(5, 8)).isEmpty)
    // the overlapping reader still sees all of v1 (atomic publication)
    assert(early.count() == 30)
    assert(SnapshotStore.read(spark, root, 1).count() == 30) // time travel
    // v3: a SECOND vector stacks — tombstones derive from the LIVE view,
    // so re-tombstoning an already-deleted row is impossible
    val dv2 = SnapshotStore.writeData(spark, root,
      SnapshotStore.tombstonesWhere(spark, root, col("k") === 20L)
        .coalesce(1), "dv2")
    assert(SnapshotStore.tombstonesWhere(spark, root,
      col("k").between(5, 8)).isEmpty) // already dead rows yield no rows
    SnapshotStore.commit(spark, root,
      f1 ++ (dv1 ++ dv2).map(SnapshotStore.dvLine), 2)
    assert(SnapshotStore.read(spark, root).count() == 25)
    // v4: compaction reconciles vectors into clean files
    val clean = SnapshotStore.writeData(spark, root,
      SnapshotStore.read(spark, root).repartitionByRange(3, col("k")), "opt")
    SnapshotStore.commit(spark, root, clean, 3)
    assert(SnapshotStore.deleteVectors(spark, root).isEmpty)
    assert(SnapshotStore.read(spark, root).count() == 25)
    assert(SnapshotStore.read(spark, root).agg(sum(col("k")))
      .head().getLong(0) == (1L to 30L).sum - 5 - 6 - 7 - 8 - 20)
    // vacuum to the clean version: DV files are references, then garbage
    val (gone, vs) = SnapshotStore.vacuum(spark, root, keep = 1)
    assert(vs == Seq(1, 2, 3))
    assert((dv1 ++ dv2).forall(d => gone.map(graft.queries.Lakehouse.normPath)
      .contains(graft.queries.Lakehouse.normPath(d))),
      s"DVs must be vacuumed: $gone")
    assert(SnapshotStore.read(spark, root).count() == 25)
  }

  test("partition spec: per-version isolation, evolution, and decline cases") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("snappart")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val df = (1L to 40L).map(k => (k, if (k % 2 == 0) "a" else "b", k.toDouble))
      .toDF("k", "g", "p")
    // v1 partitioned by g
    SnapshotStore.commit(spark, root,
      SnapshotStore.writeDataPartitioned(spark, root, df, "g", 2, "k", "v1"), 0)
    assert(SnapshotStore.partitionSpecOf(spark, root, 1).contains("g"))
    val ga = SnapshotStore.filesWherePartition(spark, root, "g", "a")
    assert(ga.size == 2 && ga.size < SnapshotStore.files(spark, root).size)
    assert(spark.read.parquet(ga: _*).count() == 20)
    // DECLINE: a predicate on a NON-spec column prunes nothing
    assert(SnapshotStore.filesWherePartition(spark, root, "k", "1").size == 4)
    // partition EVOLUTION: v2 re-partitions by a derived bucket column
    val evolved = df.withColumn("kb", (col("k") % 4).cast("string"))
    SnapshotStore.commit(spark, root,
      SnapshotStore.writeDataPartitioned(spark, root,
        evolved, "kb", 1, "k", "v2"), 1)
    assert(SnapshotStore.partitionSpecOf(spark, root, 2).contains("kb"))
    // the NEW spec prunes on kb; the OLD column declines on v2...
    assert(SnapshotStore.filesWherePartition(spark, root, "kb", "0").size == 1)
    assert(SnapshotStore.filesWherePartition(spark, root, "g", "a").size == 4)
    // ...and v1 still prunes on ITS OWN spec (per-version isolation)
    assert(SnapshotStore.filesWherePartition(spark, root, "g", "a", 1).size == 2)
    assert(SnapshotStore.filesWherePartition(spark, root, "kb", "0", 1).size == 4)
    // content identical across the evolution
    assert(SnapshotStore.read(spark, root, 2).agg(sum(col("k")))
      .head().getLong(0) == (1L to 40L).sum)
  }

  test("kitchen-sink manifest: every line kind coexists and every accessor parses exactly its own") {
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("lkspec_sink")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    import spark.implicits._
    val df = (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
    val data = SnapshotStore.writeData(spark, root,
      df.repartitionByRange(2, col("k")), "d")
    val dv = SnapshotStore.writeData(spark, root,
      Seq((data.head, 0L)).toDF("file", "pos").coalesce(1), "dv")
    val schema = df.schema
    // one manifest carrying ALL line kinds: schema, partition spec, write
    // mode, stream epoch mark, annotated + plain data lines, a vector
    val lines = Seq(
      SnapshotStore.schemaLine(schema),
      SnapshotStore.partSpecLine("v"),
      SnapshotStore.modeLine("mor"),
      SnapshotStore.epochLine("qx", 5L),
      SnapshotStore.partLine(data.head, "a"),
      data(1),
      SnapshotStore.dvLine(dv.head))
    SnapshotStore.commit(spark, root, lines, 0)
    // each accessor sees exactly its own line kind
    assert(SnapshotStore.files(spark, root).toSet == data.toSet)
    assert(SnapshotStore.deleteVectors(spark, root) == Seq(dv.head))
    assert(SnapshotStore.schemaOf(spark, root).contains(schema))
    assert(SnapshotStore.partitionSpecOf(spark, root).contains("v"))
    assert(SnapshotStore.writeModeOf(spark, root).contains("mor"))
    assert(SnapshotStore.epochOf(spark, root, "qx").contains(5L))
    assert(SnapshotStore.epochOf(spark, root, "other").isEmpty)
    assert(SnapshotStore.partitionValuesOf(spark, root).values.toSeq == Seq("a"))
    // the read applies the vector under the recorded schema
    assert(SnapshotStore.read(spark, root).count() == 19)
    // line-level rewrite primitives preserve the other kinds
    val repl = SnapshotStore.linesReplacing(spark, root, 1, Set.empty)
    assert(repl.size == lines.size)
    val withSchema = SnapshotStore.linesWithSchema(repl,
      schema.add("extra", "string"))
    assert(withSchema.count(_.startsWith("meta:schema=")) == 1)
    assert(withSchema.count(_.startsWith("meta:writemode=")) == 1)
    val withEpoch = SnapshotStore.linesWithEpoch(withSchema, "qx", 6L)
    assert(withEpoch.count(_.startsWith("meta:epoch=qx:")) == 1)
    assert(withEpoch.contains("meta:epoch=qx:6"))
    // metaLines carries exactly the four meta kinds
    assert(SnapshotStore.metaLines(spark, root).size == 4)
    // vacuum counts data AND vector files as references, never meta lines
    SnapshotStore.commit(spark, root,
      SnapshotStore.linesReplacing(spark, root, 1, Set.empty), 1)
    val (removed, versions) = SnapshotStore.vacuum(spark, root, 1)
    assert(versions == Seq(1) && removed.isEmpty) // v2 still references all
    assert(SnapshotStore.read(spark, root).count() == 19)
  }

  test("bare-COW mutation declines on vectored tables; anonymous filesWhere declines on multi-key sidecars") {
    import graft.sources.SnapshotStore
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("lkspec_guard")
    val root = s"$out/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val df = (1L to 50L).map(k => (k, k % 7)).toDF("o_orderkey", "m")
    SnapshotStore.commit(spark, root,
      SnapshotStore.writeData(spark, root,
        df.repartitionByRange(4, col("o_orderkey")), "d"), 0)
    // a multi-key sidecar: the anonymous-threshold pruner must decline
    SnapshotStore.writeStatsMulti(spark, root, Seq("o_orderkey", "m"))
    assert(SnapshotStore.filesWhere(spark, root, 1L, 2L).size == 4,
      "multi-key sidecar must decline anonymous pruning, not guess a key")
    // tombstone one row merge-on-read; the bare-COW path must refuse
    val dv = SnapshotStore.writeData(spark, root,
      SnapshotStore.tombstonesWhere(spark, root, col("o_orderkey") === 1L)
        .coalesce(1), "dv")
    SnapshotStore.commit(spark, root,
      SnapshotStore.files(spark, root) ++ dv.map(SnapshotStore.dvLine), 1)
    val e = intercept[IllegalArgumentException] {
      graft.queries.Lakehouse.mutateSnapshot(spark, root, "guard") { cur =>
        (cur.take(1), Some(spark.read.parquet(cur.head)), None)
      }
    }
    assert(e.getMessage.contains("delete vectors"))
  }

  test("cowMerge and cowDelete gates hold on the sf0.001 tables") {
    val dir = "/root/testdata/sf0.001"
    val m = graft.queries.Lakehouse.cowMerge(spark, dir).collect()
    assert(m.nonEmpty)
    assert(m.forall(_.getAs[Boolean]("pruned")), "merge must not rewrite every file")
    assert(m.forall(_.getAs[Boolean]("history_untouched")))
    assert(m.exists(_.getAs[String]("o_orderstatus") == "N"), "inserts missing")
    val d = graft.queries.Lakehouse.cowDelete(spark, dir).collect()
    assert(d.nonEmpty)
    assert(d.forall(_.getAs[Boolean]("pruned")))
    assert(d.forall(_.getAs[Boolean]("history_untouched")))
  }
}
