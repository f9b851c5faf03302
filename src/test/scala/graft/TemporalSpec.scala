package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.queries.Temporal
import org.scalatest.funsuite.AnyFunSuite

/** Temporal family on closed-form inputs: hand-built event logs whose
  * point-in-time matches, compacted states, concurrency peaks (including
  * an interval crossing midnight — the carry-in case the two-phase prefix
  * sum exists for), and transition counts are known exactly. */
class TemporalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  /** Stage events.parquet (+ optionally orders.parquet) into a temp dir.
    * The driver's events table stores `ts` as native parquet
    * `timestamp[us]` (TIMESTAMP_NTZ to Spark) — stage that same shape so
    * these suites pin the production contract. The legacy nanos-long shape
    * is covered by `LoaderSpec` and `AnalyticsExtrasSpec`. */
  private def stage(events: Seq[(Long, Timestamp, Long, String, Double)],
                    orders: Seq[(Long, Timestamp, Double)] = Nil): String = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampNTZType
    val d = Files.createTempDirectory("temporalspec")
    events
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    if (orders.nonEmpty)
      orders.toDF("o_custkey", "o_orderdate", "o_totalprice")
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d.toString
  }

  test("q136 point-in-time picks the covering SCD2 version, left-extends before the first") {
    // user 7 has versions at day 10 (spend 100) and day 20 (spend 50).
    // Events: before any version -> nulls; inside v1; inside open-ended v2.
    val dir = stage(
      events = Seq(
        (1L, t("2024-01-05 00:00:00"), 7L, "view", 0.0),
        (2L, t("2024-01-15 00:00:00"), 7L, "view", 0.0),
        (3L, t("2024-02-01 00:00:00"), 7L, "view", 0.0)),
      orders = Seq(
        (7L, t("2024-01-10 00:00:00"), 100.0),
        (7L, t("2024-01-20 00:00:00"), 50.0)))
    val got = Temporal.scd2PointInTime(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.toString)).toMap
    assert(got == Map(1L -> None, 2L -> Some("100.0"), 3L -> Some("50.0")),
      got)
  }

  test("q137 CDC compaction: last writer wins, delete tombstones the key") {
    val dir = stage(Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, "view", 10.0),
      (2L, t("2024-01-02 00:00:00"), 1L, "click", 20.0), // user 1 latest: upsert 20
      (3L, t("2024-01-01 00:00:00"), 2L, "view", 30.0),
      (4L, t("2024-01-02 00:00:00"), 2L, "error", 40.0), // user 2 latest: delete
      // same-ts tie on user 3: event_id 6 > 5 wins
      (5L, t("2024-01-03 00:00:00"), 3L, "view", 1.0),
      (6L, t("2024-01-03 00:00:00"), 3L, "view", 2.0)))
    val got = Temporal.cdcCompact(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 20.0, 3L -> 2.0), got)
  }

  test("q138 peak concurrency is exact, including an interval crossing midnight") {
    // Day 1: three events within one 300s window -> peak 3.
    // 23:58 event spills 180s into day 2: day 2 opens at concurrency 1
    // (the carry), and its own 00:01 event overlaps -> peak 2.
    val dir = stage(Seq(
      (1L, t("2024-03-01 12:00:00"), 1L, "view", 0.0),
      (2L, t("2024-03-01 12:01:00"), 1L, "view", 0.0),
      (3L, t("2024-03-01 12:02:00"), 1L, "view", 0.0),
      (4L, t("2024-03-01 23:58:00"), 1L, "view", 0.0),
      (5L, t("2024-03-02 00:01:00"), 1L, "view", 0.0)))
    val got = Temporal.peakConcurrency(spark, dir).collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    assert(got == Map("2024-03-01" -> 3L, "2024-03-02" -> 2L), got)
  }

  test("q138 half-open boundary: an end at instant T closes before a start at T opens") {
    // Event 1 occupies [0,300); event 2 starts exactly at +300s -> never
    // concurrent; peak stays 1.
    val dir = stage(Seq(
      (1L, t("2024-03-01 12:00:00"), 1L, "view", 0.0),
      (2L, t("2024-03-01 12:05:00"), 1L, "view", 0.0)))
    val got = Temporal.peakConcurrency(spark, dir).collect()
      .map(r => r.getLong(1)).toSeq
    assert(got == Seq(1L), got)
  }

  test("q139 transition matrix counts and ppm are exact integers") {
    // user 1: a->b->a ; user 2: a->b. Transitions: a->b x2, b->a x1.
    val dir = stage(Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, "a", 0.0),
      (2L, t("2024-01-01 00:01:00"), 1L, "b", 0.0),
      (3L, t("2024-01-01 00:02:00"), 1L, "a", 0.0),
      (4L, t("2024-01-01 00:00:00"), 2L, "a", 0.0),
      (5L, t("2024-01-01 00:01:00"), 2L, "b", 0.0)))
    val got = Temporal.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("a", "b", 2L, 1000000L), ("b", "a", 1L, 1000000L)),
      got)
  }

  test("q188 merge closes touched keys, chains the batch, passes untouched keys") {
    // cutoff is 2000-01-01: key 1 has history + batch, key 2 history only,
    // key 3 batch only
    val dir = stage(
      events = Seq((1L, t("1999-01-01 00:00:00"), 1L, "view", 1.0)),
      orders = Seq(
        (1L, t("1999-01-10 00:00:00"), 10.0),
        (1L, t("1999-02-10 00:00:00"), 20.0),
        (1L, t("2000-03-01 00:00:00"), 30.0),
        (1L, t("2000-04-01 00:00:00"), 40.0),
        (2L, t("1999-05-01 00:00:00"), 50.0),
        (3L, t("2000-06-01 00:00:00"), 60.0)))
    val got = graft.queries.Temporal.scd2Merge(spark, dir)
      .as[(Long, Timestamp, Double, Option[Timestamp], Long)].collect()
      .sortBy(r => (r._1, r._2.getTime))
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq == Seq(
      // key 1: two history versions; the formerly-open 02-10 row CLOSED to
      // the first batch day; batch versions chained, last one current
      (1L, t("1999-01-10 00:00:00"), 10.0, Some(t("1999-02-10 00:00:00")), 0L),
      (1L, t("1999-02-10 00:00:00"), 20.0, Some(t("2000-03-01 00:00:00")), 0L),
      (1L, t("2000-03-01 00:00:00"), 30.0, Some(t("2000-04-01 00:00:00")), 0L),
      (1L, t("2000-04-01 00:00:00"), 40.0, None, 1L),
      // key 2: untouched — still open
      (2L, t("1999-05-01 00:00:00"), 50.0, None, 1L),
      // key 3: fresh chain from the batch alone
      (3L, t("2000-06-01 00:00:00"), 60.0, None, 1L)), got.toSeq)
  }

  /** Orders staging for the IVM pair — q222/q223 key off o_orderkey%10
    * (history ≤7 / insert ≥8), o_orderkey%17=3 and o_custkey%97=13
    * (retractions). */
  private def stageIvm(rows: Seq[(Long, Long, Double)]): String = {
    val d = Files.createTempDirectory("temporalspec_ivm")
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d.toString
  }

  test("q222 counting-algebra IVM: retraction-to-zero drops the group, money is exact") {
    val dir = stageIvm(Seq(
      // custkey 13 (%97=13): entire history retracted, no inserts → vanishes
      (1L, 13L, 99.99),
      // custkey 10: okey 2 kept, okey 3 (%17=3) retracted, okey 8 inserted
      (2L, 10L, 10.01), (3L, 10L, 5.55), (8L, 10L, 20.02),
      // custkey 20: untouched history
      (4L, 20L, 7.77)))
    val got = graft.queries.Temporal.ivmDelta(spark, dir)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 2L, 30.03, true), (20L, 1L, 7.77, true)), got)
  }

  test("q223 streaming IVM over micro-batched CDC equals the batch delta merge") {
    val dir = stageIvm(Seq(
      (1L, 13L, 99.99),
      (2L, 10L, 10.01), (3L, 10L, 5.55), (8L, 10L, 20.02),
      (4L, 20L, 7.77),
      // a second insert landing in a different %3 arrival file than okey 8
      (9L, 20L, 1.23)))
    val batch = graft.queries.Temporal.ivmDelta(spark, dir)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val stream = graft.queries.Temporal.streamIvm(spark, dir)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(stream == batch, s"stream=$stream batch=$batch")
    assert(stream.forall(_._4), "matches_rebuild must hold")
  }

  test("q280 replica drift localizes exactly the injected faults") {
    import org.apache.spark.sql.functions.col
    val sf = TestSpark.sf
    val rows = graft.queries.Temporal.replicaDrift(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == rows.map(_._1).distinct.size, "one row per bucket")
    // count delta across all buckets == number of injected deletions
    val deletions = graft.Tables(spark, sf, "orders")
      .where(col("o_orderkey") % 997L === 0L).count()
    assert(deletions > 0, "fault injection must be non-empty at this sf")
    assert(rows.map(r => r._2 - r._3).sum == deletions, rows.take(5))
    // a count mismatch is always drift; clean buckets exist too
    assert(rows.filter(r => r._2 != r._3).forall(_._4 == 1L))
    assert(rows.exists(_._4 == 0L), "some buckets must be clean")
    // pure corruption (equal counts, changed content) is caught by the
    // checksum alone — at least one such bucket must be flagged, since
    // corruptions outnumber bucket collisions with deletions at this sf
    assert(rows.exists(r => r._2 == r._3 && r._4 == 1L),
      "checksum must catch an equal-count corrupted bucket")
  }

  test("q285 bitemporal snapshot masks late arrivals, keeps on-time truth") {
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("bitemporal")
    // key 1: 12-28 (day%7=0 -> recorded 01-07 > T) masks; 12-20 visible.
    // key 2: on-time 12-29. key 3: ONLY a late version -> absent.
    // key 4: 02-01 is beyond V for BOTH winners; 11-14 late but recorded
    // 11-24 <= T -> visible, not masked.
    Seq(
      (1L, 50.00, "1995-12-28"), (1L, 30.00, "1995-12-20"),
      (2L, 20.00, "1995-12-29"),
      (3L, 77.00, "1995-12-28"),
      (4L, 99.99, "1995-11-14"), (4L, 11.11, "1996-02-01"))
      .toDF("o_custkey", "o_totalprice", "d")
      .select(col("o_custkey"), col("o_totalprice"),
        col("d").cast("timestamp").as("o_orderdate"))
      .write.parquet(s"$d/orders.parquet")
    val got = graft.queries.Temporal.bitemporalSnapshot(spark, d.toString)
      .selectExpr("key", "CAST(valid_from AS STRING)", "day_spend",
        "late_masked")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got == Set(
      (1L, "1995-12-20 00:00:00", 30.0, 1L),
      (2L, "1995-12-29 00:00:00", 20.0, 0L),
      (4L, "1995-11-14 00:00:00", 99.99, 0L)), got)
  }

  test("q287 restatement diff classifies late arrivals between as-at dates") {
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("restate")
    // key 1: 12-20 known at T1, 12-28 lands late -> 'restated' with both
    // spends. key 2: on-time only -> absent. key 3: ONLY the late version
    // -> 'appeared' with NULL spend_t1.
    Seq(
      (1L, 50.00, "1995-12-28"), (1L, 30.00, "1995-12-20"),
      (2L, 20.00, "1995-12-29"),
      (3L, 77.00, "1995-12-28"))
      .toDF("o_custkey", "o_totalprice", "dd")
      .select(col("o_custkey"), col("o_totalprice"),
        col("dd").cast("timestamp").as("o_orderdate"))
      .write.parquet(s"$d/orders.parquet")
    val got = graft.queries.Temporal.restatementDiff(spark, d.toString)
      .as[(Long, String, Option[Double], Double)].collect().toSet
    assert(got == Set(
      (1L, "restated", Some(30.0), 50.0),
      (3L, "appeared", None, 77.0)), got)
  }

  test("q281 repair emits exactly the injected fault rows, classified") {
    import org.apache.spark.sql.functions.col
    val sf = TestSpark.sf
    val keys = graft.Tables(spark, sf, "orders")
      .select(col("o_orderkey")).as[Long].collect().toSet
    // deletion wins over corruption for a key divisible by both moduli
    val missing = keys.filter(_ % 997L == 0L)
    val altered = keys.filter(k => k % 991L == 0L && k % 997L != 0L)
    val got = graft.queries.Temporal.replicaRepair(spark, sf)
      .as[(Long, String)].collect().toSet
    assert(got == missing.map((_, "missing")) ++ altered.map((_, "altered")),
      got.take(10))
  }
}
