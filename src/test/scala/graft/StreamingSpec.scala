package graft

import graft.streaming.EventStreams
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The `readStream` forms must agree with their batch equivalents on a
  * finite input (same aggregation semantics, complete output mode). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  /** FileStreamSource wants a directory of files — stage the events table
    * the way a production stream would land it. */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"), d.resolve("events.parquet"))
    d.toString
  }

  private def runToMemory(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming sliding window agg matches batch") {
    val streamed = runToMemory(EventStreams.slidingStream(spark, eventsDir), "slide")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.slidingBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming tumbling window agg matches batch") {
    val streamed = runToMemory(EventStreams.tumblingStream(spark, eventsDir), "tumb")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.tumblingBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("mapGroupsWithState running counts match batch groupBy count") {
    val q = EventStreams.runningUserCounts(spark, eventsDir)
      .writeStream.format("memory").queryName("ruc")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ruc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables(spark, sf, "events")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("flatMapGroupsWithState emits one alert per crossed threshold") {
    val q = EventStreams.thresholdAlerts(spark, eventsDir, every = 10L)
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("alerts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Batch oracle: user with n events crosses thresholds 10, 20, ..., n/10*10.
    val batch = Tables(spark, sf, "events")
      .groupBy("user_id").count()
      .collect().flatMap { r =>
        (1L to r.getLong(1) / 10).map(k => (r.getLong(0), k * 10))
      }.toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stream-static broadcast join enriches every event exactly once") {
    val q = EventStreams.enrichedStream(spark, eventsDir, sf)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("enriched")
    assert(streamed.count() == Tables(spark, sf, "events").count())
    assert(streamed.where(org.apache.spark.sql.functions.col("nation").isNotNull)
      .count() > 0)
  }

  test("foreachBatch sink lands every micro-batch to parquet") {
    val out = Files.createTempDirectory("fb_out").toString
    val q = EventStreams.readEventsStream(spark, eventsDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
          .write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(out).count() ==
      Tables(spark, sf, "events").count())
  }

  test("watermarked streaming dedup keeps exactly the distinct event_ids") {
    val q = EventStreams.dedupStream(spark, eventsDir)
      .writeStream.format("memory").queryName("dedup_s")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup_s")
    val distinctIds = Tables(spark, sf, "events")
      .select("event_id").distinct().count()
    assert(streamed.count() == distinctIds)
    assert(streamed.select("event_id").distinct().count() == distinctIds)
  }

  test("stream-stream interval join matches the batch join") {
    val q = EventStreams.streamStreamJoin(spark, eventsDir)
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(240000)
    val streamed = spark.table("ssj")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.streamStreamJoinBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming sessionization produces the same session count as batch") {
    val streamed = runToMemory(EventStreams.sessionStream(spark, eventsDir), "sess")
    // Same number of (user, session) rows and same total event count; the
    // batch form reports ordinal ids instead of window bounds, so compare
    // the session partitioning, not the id columns.
    val batch = EventStreams.sessionBatch(spark, sf)
    assert(streamed.count() == batch.count())
    val sTotal = streamed.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    val bTotal = batch.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    assert(sTotal == bTotal && sTotal > 0)
  }

  test("append-mode micro-batch sink is idempotent under batch retry") {
    import spark.implicits._
    // foreachBatch is at-least-once: a batch that fails mid-write is
    // re-delivered under the SAME batchId. The sink writes batch_<id>
    // subdirs in overwrite mode, so the retry replaces its own output
    // instead of appending a second copy.
    val out = java.nio.file.Files.createTempDirectory("graft_retry")
    val sink = EventStreams.batchSink(out, "append")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    sink(b0, 0L)
    sink(b0, 0L) // re-delivery of batch 0
    sink(Seq((3L, "c")).toDF("k", "v"), 1L)
    val got = spark.read.parquet(s"$out/batch_*").collect()
    assert(got.length == 3, got.toSeq) // retry contributed no duplicates
  }

  test("bounded session-window run equals the batch session_window agg") {
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    val streamed = EventStreams.sessionStreamRun(spark, sf)
      .collect().map(_.toSeq).toSet
    // Same aggregation on the batch DAG — the micro-batch run must converge
    // to it exactly (session-window state store merge == batch merge).
    val batch = Tables(spark, sf, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("bounded stream-stream join run emits exactly the batch join") {
    val streamed = EventStreams.streamStreamJoinRun(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.streamStreamJoinBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("bounded streaming dedup run emits exactly the batch distinct key set") {
    import spark.implicits._
    val streamed = EventStreams.dedupStreamRun(spark, sf)
      .as[Long].collect().toSet
    val batch = Tables(spark, sf, "events")
      .select("user_id").distinct().as[Long].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("dropDuplicates state survives a restart: overlapping keys are not re-emitted") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val d = Files.createTempDirectory("evrestart")
    val ev = Files.createDirectory(d.resolve("ev")).toString
    val cp = Files.createTempDirectory("evrestart_cp").toString
    val out = Files.createTempDirectory("evrestart_out").toString + "/sink"
    // write each batch to scratch, then move its part file INTO the
    // watched directory (FileStreamSource does not recurse)
    def stage(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val scratch = Files.createTempDirectory("evrestart_stage")
      rows.toDF("event_id", "ts", "user_id")
        .withColumn("ts", col("ts").cast(TimestampNTZType))
        .withColumn("event_type", org.apache.spark.sql.functions.lit("view"))
        .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
        .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
        .coalesce(1).write.parquet(scratch.resolve("w").toString)
      val part = Files.list(scratch.resolve("w")).iterator()
      var moved = false
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, Paths.get(ev, s"$name.parquet")); moved = true
        }
      }
      assert(moved, "no part file staged")
    }
    stage("b0", Seq((1L, "2024-01-01 10:00:00", 1L),
      (2L, "2024-01-01 10:01:00", 2L), (3L, "2024-01-01 10:02:00", 3L)))
    def runOnce(): Unit = {
      val q = EventStreams.readEventsStream(spark, ev)
        .dropDuplicates("user_id")
        .select(col("user_id"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    runOnce()
    // while stopped: a new file with OVERLAPPING users (2,3) + new user 4
    stage("b1", Seq((4L, "2024-01-01 11:00:00", 2L),
      (5L, "2024-01-01 11:01:00", 3L), (6L, "2024-01-01 11:02:00", 4L)))
    runOnce()
    val users = spark.read.parquet(out).as[Long].collect().toSeq
    // lost state would re-emit users 2 and 3 on the second run
    assert(users.sorted == Seq(1L, 2L, 3L, 4L), users.sorted)
  }

  test("transformWithState MapState/ValueState persist across micro-batches") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val d = Files.createTempDirectory("evtws")
    val ev = Files.createDirectory(d.resolve("ev")).toString
    def stage(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      val scratch = Files.createTempDirectory("evtws_stage")
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("ts", col("ts").cast(TimestampNTZType))
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .coalesce(1).write.parquet(scratch.resolve("w").toString)
      val part = Files.list(scratch.resolve("w")).iterator()
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.move(p, Paths.get(ev, s"$name.parquet"))
      }
    }
    // the cross-batch claim: batch 1's click count for user 1 must come
    // from the PERSISTED MapState (2 prior clicks), and the running total
    // from the persisted ValueState — losing either yields 1 and 1
    stage("b0", Seq((1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:01:00", 1L, "click"),
      (3L, "2024-01-01 10:02:00", 1L, "view")))
    val s = spark.newSession()
    graft.streaming.EventStreams.rocksDbProviderConf
      .foreach { case (k, v) => s.conf.set(k, v) }
    val q = graft.streaming.EventStreams.typedStateAgg(
        graft.streaming.EventStreams.readEventsStream(s, ev))
      .writeStream.format("memory").queryName("tws_counts")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      stage("b1", Seq((4L, "2024-01-01 11:00:00", 1L, "click"),
        (5L, "2024-01-01 11:05:00", 2L, "view")))
      q.processAllAvailable()
      // counts only grow, so max(n) per (user, type) is the final MapState
      // entry; max(n_total) per USER is the final ValueState (an untouched
      // type's row keeps its older total — update mode only re-emits
      // touched types, which is the point of per-entry MapState updates)
      val t = s.table("tws_counts")
      val fin = t.groupBy(col("user_id"), col("event_type"))
        .agg(org.apache.spark.sql.functions.max(col("n")).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(fin == Set((1L, "click", 3L), (1L, "view", 1L),
        (2L, "view", 1L)), fin)
      val totals = t.groupBy(col("user_id"))
        .agg(org.apache.spark.sql.functions.max(col("n_total")).as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(totals == Set((1L, 4L), (2L, 1L)), totals)
    } finally {
      q.stop()
      s.sql("DROP VIEW IF EXISTS tws_counts")
    }
  }

  test("event-time timeout closes idle sessions and evicts their state") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val d = Files.createTempDirectory("evtimeout")
    val ev = Files.createDirectory(d.resolve("ev")).toString
    def stage(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val scratch = Files.createTempDirectory("evtimeout_stage")
      rows.toDF("event_id", "ts", "user_id")
        .withColumn("ts", col("ts").cast(TimestampNTZType))
        .withColumn("event_type", org.apache.spark.sql.functions.lit("view"))
        .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
        .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
        .coalesce(1).write.parquet(scratch.resolve("w").toString)
      val part = Files.list(scratch.resolve("w")).iterator()
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.move(p, Paths.get(ev, s"$name.parquet"))
      }
    }
    // user 1's session: two events a minute apart
    stage("b0", Seq((1L, "2024-01-01 10:00:00", 1L),
      (2L, "2024-01-01 10:01:00", 1L)))
    val q = EventStreams.idleSessionFinalize(spark, ev, gapMinutes = 30)
      .writeStream.format("memory").queryName("idle_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("idle_sessions").count() == 0) // still open
      // user 2 events far in the future push the watermark past
      // 10:01 + 30min -> user 1's timeout fires, session finalizes
      stage("b1", Seq((3L, "2024-01-01 12:00:00", 2L)))
      q.processAllAvailable()
      // one more batch so the timeout (evaluated against the PREVIOUS
      // batch's watermark) is guaranteed to have run
      stage("b2", Seq((4L, "2024-01-01 12:30:00", 2L)))
      q.processAllAvailable()
      val rows = spark.table("idle_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((1L, 2L)), rows) // user 1: 2-event session closed
      assert(!rows.exists(_._1 == 2L), rows) // user 2 still active: no emit
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS idle_sessions")
    }
  }

  test("transformWithState ListState buffer persists and trims across batches (q174)") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val d = Files.createTempDirectory("evlastk")
    val ev = Files.createDirectory(d.resolve("ev")).toString
    def stage(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      val scratch = Files.createTempDirectory("evlastk_stage")
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("ts", col("ts").cast(TimestampNTZType))
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .coalesce(1).write.parquet(scratch.resolve("w").toString)
      val part = Files.list(scratch.resolve("w")).iterator()
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.move(p, Paths.get(ev, s"$name.parquet"))
      }
    }
    stage("b0", Seq((1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:01:00", 1L, "b")))
    val s = spark.newSession()
    graft.streaming.EventStreams.rocksDbProviderConf
      .foreach { case (k, v) => s.conf.set(k, v) }
    val q = graft.streaming.EventStreams.lastKAgg(
        graft.streaming.EventStreams.readEventsStream(s, ev), 3)
      .writeStream.format("memory").queryName("lastk")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      assert(s.table("lastk").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "a,b")))
      // b1: two more events -> the PERSISTED buffer must carry a,b and
      // trim to the 3 most recent (losing the list means "c,d"; losing
      // the trim means "a,b,c,d")
      stage("b1", Seq((3L, "2024-01-01 10:02:00", 1L, "c"),
        (4L, "2024-01-01 10:03:00", 1L, "d")))
      q.processAllAvailable()
      // final update row for user 1 is the cross-batch last-3
      val rows = s.table("lastk").collect().map(_.getString(1)).toSet
      assert(rows.contains("b,c,d"), rows)
      assert(!rows.contains("a,b,c,d"), rows)
    } finally {
      q.stop()
      s.sql("DROP VIEW IF EXISTS lastk")
    }
  }

  test("transformWithState timers re-register as sessions extend (q173)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val d = Files.createTempDirectory("evtimer")
    val ev = Files.createDirectory(d.resolve("ev")).toString
    def stage(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val scratch = Files.createTempDirectory("evtimer_stage")
      rows.toDF("event_id", "ts", "user_id")
        .withColumn("ts", col("ts").cast(TimestampNTZType))
        .withColumn("event_type", org.apache.spark.sql.functions.lit("view"))
        .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
        .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
        .coalesce(1).write.parquet(scratch.resolve("w").toString)
      val part = Files.list(scratch.resolve("w")).iterator()
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.move(p, Paths.get(ev, s"$name.parquet"))
      }
    }
    def ms(s: String): Long = java.time.Instant.parse(s).toEpochMilli
    stage("b0", Seq((1L, "2024-01-01 10:00:00", 1L),
      (2L, "2024-01-01 10:01:00", 1L)))
    val s = spark.newSession()
    graft.streaming.EventStreams.rocksDbProviderConf
      .foreach { case (k, v) => s.conf.set(k, v) }
    val q = graft.streaming.EventStreams.timerSessionAgg(
        graft.streaming.EventStreams.readEventsStream(s, ev), 30)
      .writeStream.format("memory").queryName("timer_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // b1 EXTENDS user 1's session (10:20 within the 30-min gap): the
      // 10:31 timer must be DELETED and re-armed at 10:50
      stage("b1", Seq((3L, "2024-01-01 10:20:00", 1L),
        (4L, "2024-01-01 10:25:00", 9L)))
      q.processAllAvailable()
      // b2 pushes the watermark to 10:45 — PAST the stale 10:31 expiry but
      // BEFORE the re-registered 10:50. A surviving stale timer would fire
      // here: the session would emit early (2 or 3 events, end 10:20) and
      // evict, then the 10:50 timer would fire on cleared state and crash.
      stage("b2", Seq((5L, "2024-01-01 10:45:00", 9L)))
      q.processAllAvailable()
      val early = s.table("timer_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!early.exists(_._1 == 1L), s"stale timer fired: $early")
      // b3 pushes the watermark past 10:50: user 1 closes exactly once,
      // with the MERGED 3-event session
      stage("b3", Seq((6L, "2024-01-01 11:30:00", 9L)))
      q.processAllAvailable()
      stage("b4", Seq((7L, "2024-01-01 11:35:00", 9L)))
      q.processAllAvailable()
      val u1 = s.table("timer_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).filter(_._1 == 1L).toSeq
      assert(u1 == Seq((1L, 3L,
        ms("2024-01-01T10:00:00Z"), ms("2024-01-01T10:20:00Z"))), u1)
    } finally {
      q.stop()
      s.sql("DROP VIEW IF EXISTS timer_sessions")
    }
  }

  test("streaming ingest screen decides exactly like the batch screen (q115/q117)") {
    import org.apache.spark.sql.functions.col
    // same stores, same semantics: the per-doc (is_exact_dup, decision)
    // pair must be identical whether the batch is screened in one pass
    // (q115) or doc-by-doc as a stream (q117)
    val batch = SparkEntry.queries("q115_incremental_dedup")(spark, sf)
      .select(col("doc_id"), col("is_exact_dup"), col("decision"))
      .collect().map(_.toSeq).toSet
    val streamed = SparkEntry.queries("q117_stream_ingest_dedup")(spark, sf)
      .select(col("doc_id"), col("is_exact_dup"), col("decision"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming CMS counters accumulate across micro-batches to the batch matrix") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    import spark.implicits._
    val d = Files.createTempDirectory("cms_stream")
    val docsDir = Files.createDirectory(d.resolve("docs")).toString
    def stage(name: String, texts: Seq[String]): Unit = {
      val scratch = Files.createTempDirectory("cms_stream_stage")
      texts.toDF("text").coalesce(1).write.parquet(scratch.resolve("w").toString)
      val part = Files.list(scratch.resolve("w")).iterator()
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.move(p, Paths.get(docsDir, s"$name.parquet"))
      }
    }
    stage("b0", Seq("a b a", "c"))
    val s = spark.newSession()
    val q = EventStreams.cmsCellCounts(
        s.readStream.schema("text STRING").parquet(docsDir))
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stage("b1", Seq("a d", "b b"))
      q.processAllAvailable()
      // the claim: batch 1's counters come from the PERSISTED agg state —
      // losing it would leave a=1-ish cells instead of the union's a=3
      val got = s.table("cms_cells").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      graft.functions.GraftExtensions.registerCms(spark)
      val matrix = Seq("a", "b", "a", "c", "a", "d", "b", "b")
        .toDF("t").withColumn("c", lit(1L))
        .agg(expr("cms_agg(t, c, 4, 512)").as("m"))
        .head().getSeq[Long](0)
      val expected = matrix.zipWithIndex.collect {
        case (v, idx) if v != 0L => ((idx / 512).toLong, (idx % 512).toLong) -> v
      }.toMap
      assert(got == expected, s"got=$got expected=$expected")
      assert(got.values.sum == 8L * 4) // mass: 8 tokens × depth rows
    } finally {
      q.stop()
      s.sql("DROP VIEW IF EXISTS cms_cells")
    }
  }
}
