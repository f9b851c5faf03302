package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",...}.
  *
  * Results are materialized through the `noop` sink — every row is fully
  * computed and handed to the writer, but nothing is serialized to disk.
  * (A bare `.count()` would let Catalyst prune all projected columns and
  * time an empty row count instead of the query.)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // Scratch on tmpfs when available (SPARK_GRAFT_TMPFS=0 opts out): the
    // streaming queries pay a per-micro-batch state-store/checkpoint fsync
    // tax that on a contended ext4 /tmp swings 40% run-to-run on identical
    // binaries (BENCH_NOTES §r11 adjudication). Temp dirs — checkpoints,
    // COW layouts, snapshot stores — move to /dev/shm so the measurement
    // isolates COMPUTE, matching how a production cluster provisions
    // local-SSD scratch rather than sharing a cold system disk. Must run
    // before any temp-dir allocation.
    // The artifact stamps whichever mode actually ran ("scratch" below),
    // so bench_full.json is self-describing across rounds, and tmpfs is
    // only opted into when /dev/shm has real headroom (>=4 GiB free) —
    // at larger scale factors a near-full RAM disk would trade the fsync
    // tax for ENOSPC mid-run.
    var scratchMode = "ext4"
    if (sys.env.getOrElse("SPARK_GRAFT_TMPFS", "1") == "1") {
      val shm = java.nio.file.Paths.get("/dev/shm")
      val freeOk = try java.nio.file.Files.getFileStore(shm)
        .getUsableSpace >= (4L << 30) catch { case _: Throwable => false }
      if (java.nio.file.Files.isWritable(shm) && freeOk) {
        val scratch = java.nio.file.Files.createTempDirectory(shm, "graft_bench")
        graft.streaming.EventStreams.deleteTreeOnExit(scratch)
        System.setProperty("java.io.tmpdir", scratch.toString)
        scratchMode = "tmpfs"
        System.err.println(s"[bench] scratch on tmpfs: $scratch")
      } else if (java.nio.file.Files.isWritable(shm)) {
        System.err.println("[bench] /dev/shm under 4 GiB free - staying on ext4")
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = Sessions.master(s"local[$cpus]")
    val spark = Sessions.forMaster(SparkSession.builder(), master)
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Sessions.warehouseDir())
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v;k2=v2": session-conf pins for measurement runs
    // (e.g. graft.graph.triangleImpl=wedge to time the fallback path).
    Sessions.applyEnvConf(spark)
    // Default TWO passes: pass 1 cold (JIT + codegen compile included),
    // pass 2 warm — the shape a long-lived cluster sees. Per-query times
    // are the MIN across passes (a one-off host-contention spike on any
    // single pass then can't masquerade as a regression) and per-pass
    // totals are reported alongside so cold-vs-warm remains visible.
    // SPARK_GRAFT_PASSES=1 restores a single cold pass for iteration.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt)
    // Measured shuffle attribution: a stage listener accumulates shuffle
    // write + spill bytes; the bus is DRAINED at each query boundary
    // (ListenerBridge — async delivery would otherwise credit a query's
    // tail stages to its successor) and pass-1 deltas are recorded per
    // query. This turns SCALE.md's shuffle-shape claims into numbers the
    // bench artifact carries (bench_full.json "shuffle_w_mb"/"spill_mb").
    val shufW = new java.util.concurrent.atomic.AtomicLong(0)
    val spill = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          }
        }
      })
    var shuffleMb = Map.empty[String, (Double, Double)] // pass-1 (write, spill)
    // per pass: name -> (elapsed, succeeded)
    var passResults = Seq.empty[Seq[(String, (Double, Boolean))]]
    var failed = Seq.empty[String] // accumulated across passes, tagged @p<N>
    for (pass <- 1 to passes) {
      // A warm pass must re-pay memoized work (the q55/q57/q99 cluster map)
      // or its timings would exclude the clustering compute entirely.
      if (pass > 1) queries.Dedup.clearCcCache()
      // SPARK_GRAFT_ONLY (same contract as Verify): comma-separated names,
      // for timing a query in isolation while iterating on its plan.
      val only = sys.env.get("SPARK_GRAFT_ONLY")
        .map(_.split(",").map(_.trim).toSet)
      passResults :+= SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .map { case (name, fn) =>
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        val (w0, s0) = (shufW.get, spill.get)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failed :+= (if (passes == 1) name else s"$name@p$pass")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        if (pass == 1) {
          org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
          shuffleMb += name -> (((shufW.get - w0) / 1e6, (spill.get - s0) / 1e6))
        }
        name -> ((elapsed, ok))
      }
    }
    // min across SUCCESSFUL passes, in the stable pass-1 query order — a
    // pass that threw early must not report its short elapsed as a speedup;
    // a query that never succeeded falls back to min over all its passes.
    val results = passResults.head.map { case (name, _) =>
      val runs = passResults.map(_.toMap.apply(name))
      val good = runs.filter(_._2).map(_._1)
      name -> (if (good.nonEmpty) good.min else runs.map(_._1).min)
    }
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // The driver keeps only the LAST ~2000 chars of output and parses the
    // JSON line out of that tail; with ~100 queries the full-name map blows
    // that budget and the line arrives truncated (unparseable). stdout gets
    // short keys (the unique qNN prefix before the first underscore) to stay
    // well under the window; the full-name map goes to bench_full.json.
    // qNN prefixes must stay unique or two queries would silently share a
    // JSON key on the stdout line (one timing dropped, no error anywhere).
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.size == shortKeys.size,
      "duplicate short query keys: " +
        shortKeys.diff(shortKeys.distinct).distinct.mkString(", "))
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fsShort = (if (failed.size > 10) failed.take(10) :+ s"+${failed.size - 10}_more" else failed)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val passTotals = passResults.map(r => f"${r.map(_._2._1).sum}%.3f")
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val shufJson = results.map { case (k, _) =>
      val (w, s) = shuffleMb.getOrElse(k, (0.0, 0.0))
      "\"" + k + "\":" + f"[$w%.1f,$s%.1f]"
    }.mkString("{", ",", "}")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fsShort,"pass_totals":$passTotals,"n_queries":${results.size},"sf":"$sfDir"}"""
    val fullLine = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$fullQs,"failed":$fs,"pass_totals":$passTotals,"n_queries":${results.size},"shuffle_w_spill_mb":$shufJson,"scratch":"$scratchMode","sf":"$sfDir"}"""
    // Full-fidelity copy with long query names; SPARK_GRAFT_OUT_DIR anchors
    // it (default: cwd) so running from another directory doesn't scatter it.
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "."), "bench_full.json")
    try {
      java.nio.file.Files.createDirectories(fullPath.getParent)
      java.nio.file.Files.write(fullPath, (fullLine + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full results: ${fullPath.toAbsolutePath}")
    }
    catch { case e: Throwable => System.err.println(s"[bench] ${fullPath.toAbsolutePath} write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
