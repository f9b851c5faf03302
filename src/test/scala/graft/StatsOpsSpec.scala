package graft

import java.nio.file.Files
import graft.queries.{Relational, TextAnalysis, TimeSeries}
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form fixtures for the analytics-statistics wave: skyline
  * dominance, systematic-sampling quotas, the z² rational, and equi-depth
  * binning — each pinned against hand-computed answers, including the
  * degenerate shapes (zero variance, ties) the sf corpora don't hit. */
class StatsOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def stageOrders(rows: Seq[(Long, Double, String)]): String = {
    val d = Files.createTempDirectory("statsops")
    rows.toDF("o_orderkey", "o_totalprice", "ts_s")
      .selectExpr("o_orderkey", "o_totalprice",
        "CAST(ts_s AS TIMESTAMP) AS o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    d.toString
  }

  test("q236 skyline: dominated points drop, frontier and equal-point ties survive") {
    // (price, date): A(100, d3) frontier; B(200, d2) frontier; C(150, d1)
    // dominated by B (200>=150, d2>=d1, strict on both); D == B duplicate
    // (mutually non-dominating -> BOTH kept); E(200, d1) dominated by B
    // (same price, later date)
    val dir = stageOrders(Seq(
      (1L, 100.0, "1995-01-03 00:00:00"), // A
      (2L, 200.0, "1995-01-02 00:00:00"), // B
      (3L, 150.0, "1995-01-01 00:00:00"), // C dominated
      (4L, 200.0, "1995-01-02 00:00:00"), // D = B's twin
      (5L, 200.0, "1995-01-01 00:00:00"))) // E dominated
    val got = Relational.skyline(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L), got)
  }

  test("q236 skyline: cross-band domination still eliminates (phase-2 exactness)") {
    // bands are $10k wide: X(5000, d1) in band 0 is band-locally a
    // frontier point but Y(15000, d2) in band 1 dominates it globally
    val dir = stageOrders(Seq(
      (1L, 5000.0, "1995-01-01 00:00:00"),
      (2L, 15000.0, "1995-01-02 00:00:00")))
    val got = Relational.skyline(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L), got)
  }

  test("q239 equi-depth: 20 rows over 10 bins -> 2 per bin with exact bounds") {
    val dir = stageOrders((1L to 20L).map(i =>
      (i, i * 1.0, "1995-01-01 00:00:00")))
    val got = Relational.equiDepthHist(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 10 && got.values.forall(_._1 == 2L), got)
    assert(got(1L) == ((2L, 100L, 200L)), got) // cents of 1.0, 2.0
    assert(got(10L) == ((2L, 1900L, 2000L)), got)
  }

  test("q237 weighted sampling: k per uniform stratum; a certainty unit absorbs its boundaries") {
    val d = Files.createTempDirectory("statsops_ws")
    // lang 'aa': 30 docs of weight 1 + one doc of weight 970 (97% of
    // mass): the heavy doc spans ALL ten k-quantile boundaries, so it is
    // the stratum's single certainty selection (selected once, never
    // duplicated — sample size <= k when weights exceed W/k).
    // lang 'bb': 10 docs of weight 7 -> every doc crosses exactly one
    // boundary: exactly k = 10 selected (all weights <= W/k).
    val docs = (0L until 30L).map(i => (i, "aa", 1L)) ++
      Seq((30L, "aa", 970L)) ++
      (40L until 50L).map(i => (i, "bb", 7L))
    docs.toDF("doc_id", "lang", "n_chars")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .write.parquet(s"$d/documents.parquet")
    val got = TextAnalysis.weightedSample(spark, d.toString).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.filter(_._1 == "aa").toSeq == Seq(("aa", 30L)), got.toSeq)
    assert(got.count(_._1 == "bb") == 10, got.toSeq)
  }

  test("q238 A/B: hand-computed z² ppm and the zero-variance guard") {
    val d = Files.createTempDirectory("statsops_ab")
    // users 0,2 (arm 0): one converts; users 1,3 (arm 1): none convert.
    // n1=2 x1=1 n2=2 x2=0: z² = (1*2-0)²*4/(2*2*1*3) = 16/12 = 1.333333
    Seq(
      (1L, 0L, "purchase", 150.0), (2L, 2L, "purchase", 50.0),
      (3L, 1L, "view", 10.0), (4L, 3L, "purchase", 99.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "CAST('1995-01-01 00:00:00' AS TIMESTAMP)"))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.parquet(s"$d/events.parquet")
    val r = TimeSeries.abTest(spark, d.toString).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 2L, 0L)), r)
    assert(r.getLong(4) == 1333333L, r)
    assert(!r.getBoolean(5), r)

    // zero variance: nobody converts anywhere -> z² = 0, not an error
    val d2 = Files.createTempDirectory("statsops_ab0")
    Seq((1L, 0L, "view", 10.0), (2L, 1L, "view", 10.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "CAST('1995-01-01 00:00:00' AS TIMESTAMP)"))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.parquet(s"$d2/events.parquet")
    val r2 = TimeSeries.abTest(spark, d2.toString).collect().head
    assert(r2.getLong(4) == 0L && !r2.getBoolean(5), r2)
  }

  private def stageEvents(rows: Seq[(Long, Long, String, Double, String)]): String = {
    val d = Files.createTempDirectory("statsops_ev")
    rows.toDF("event_id", "user_id", "event_type", "value", "ts_s")
      .selectExpr("event_id", "user_id", "event_type", "value",
        "CAST(ts_s AS TIMESTAMP) AS ts", "'{}' AS props")
      .write.parquet(s"$d/events.parquet")
    d.toString
  }

  test("q240 Markov: hand-built sequences give exact transition ppm") {
    // u0: view -> click -> view; u1: click -> click
    val dir = stageEvents(Seq(
      (1L, 0L, "view", 1.0, "1995-01-01 00:00:01"),
      (2L, 0L, "click", 1.0, "1995-01-01 00:00:02"),
      (3L, 0L, "view", 1.0, "1995-01-01 00:00:03"),
      (4L, 1L, "click", 1.0, "1995-01-01 00:00:01"),
      (5L, 1L, "click", 1.0, "1995-01-01 00:00:02")))
    val got = TimeSeries.markovTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      ("view", "click") -> ((1L, 1000000L)),
      ("click", "view") -> ((1L, 500000L)),
      ("click", "click") -> ((1L, 500000L))), got)
  }

  test("q241 TWAP: closed intervals weight values by exact microsecond holds") {
    // type 'a': $1.00 held 10s, $3.00 held 20s, last point open (excluded)
    // twap = (100c*10e6us + 300c*20e6us) / 30e6us = 7e9/3e7 c = 233.33 c
    val dir = stageEvents(Seq(
      (1L, 0L, "a", 1.0, "1995-01-01 00:00:00"),
      (2L, 0L, "a", 3.0, "1995-01-01 00:00:10"),
      (3L, 0L, "a", 9.9, "1995-01-01 00:00:30")))
    val r = TimeSeries.twap(spark, dir).collect().head
    assert(r.getLong(1) == 2L, r)
    assert(r.getLong(2) == 30000000L, r)
    assert(r.getLong(3) == 233333333L, r) // ppm-cents, floor
  }

  test("q259 streaks: the longest run wins, ties break to the earliest") {
    // u0: A A B A A A -> longest A-run is 3 (starting at t4)
    // u1: A A B B -> two runs of 2: tie breaks to the EARLIER (A at t1)
    val dir = stageEvents(Seq(
      (1L, 0L, "A", 1.0, "1995-01-01 00:00:01"),
      (2L, 0L, "A", 1.0, "1995-01-01 00:00:02"),
      (3L, 0L, "B", 1.0, "1995-01-01 00:00:03"),
      (4L, 0L, "A", 1.0, "1995-01-01 00:00:04"),
      (5L, 0L, "A", 1.0, "1995-01-01 00:00:05"),
      (6L, 0L, "A", 1.0, "1995-01-01 00:00:06"),
      (7L, 1L, "A", 1.0, "1995-01-01 00:00:01"),
      (8L, 1L, "A", 1.0, "1995-01-01 00:00:02"),
      (9L, 1L, "B", 1.0, "1995-01-01 00:00:03"),
      (10L, 1L, "B", 1.0, "1995-01-01 00:00:04")))
    val got = TimeSeries.streaks(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(0L -> (("A", 3L)), 1L -> (("A", 2L))), got)
  }

  test("q260 SSSP: path-graph distances are exact, 7th hop excluded") {
    import graft.queries.Graph
    val d = Files.createTempDirectory("statsops_sssp")
    // orders {i, i+1} build the path 0-1-2-...-7 (7 edges)
    (0L until 7L).flatMap(i => Seq((i + 1, i), (i + 1, i + 1)))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$d/lineitem.parquet")
    val got = Graph.sssp(spark, d.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // weights w(i,i+1) = 1 + (2i+1) % 3: 2,1,3,2,1,3,2 -> prefix sums
    val w = (0 until 7).map(i => 1L + (2 * i + 1) % 3)
    val want = (0 to 6).map(n => n.toLong -> w.take(n).sum).toMap
    // node 7 needs 7 hops -> outside the 6-sweep contract
    assert(got == want, got)
  }

  test("q242 CUSUM peaks exactly at a constructed level shift") {
    // three 0-cent points then three 100-dollar points: the scaled cusum
    // C_i = n*cum_i - i*S peaks (|C|=90000) at i=3 — the pre-shift point
    val dir = stageEvents((1 to 6).map(i =>
      (i.toLong, 0L, "a", if (i <= 3) 0.0 else 100.0,
        f"1995-01-01 00:00:0$i")))
    val r = TimeSeries.cusum(spark, dir).collect().head
    assert(r.getLong(1) == 6L, r)
    // 90000 * 1e6 div 36 = 2.5e9 ppm-cents
    assert(r.getLong(2) == 2500000000L, r)
    assert(r.getString(3) == "1995-01-01 00:00:03", r)
  }

  test("q282 CMS join-size estimate is exact when keys don't collide") {
    // 4 distinct keys in 16384 cells: some sketch row has no colliding
    // pair (deterministic md5 layout — green once, green always), so
    // min-of-rows recovers the true size exactly:
    // exact = cnt_e(1)*cnt_o(1) + cnt_e(2)*cnt_o(2) = 3*1 + 2*2 = 7.
    val d = Files.createTempDirectory("jcard")
    Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("user_id")
      .selectExpr("user_id", "CAST('1995-01-01' AS TIMESTAMP) AS ts")
      .write.parquet(s"$d/events.parquet")
    Seq(1L, 2L, 2L, 4L).toDF("o_custkey")
      .write.parquet(s"$d/orders.parquet")
    val r = graft.queries.TextAnalysis.cmsJoinCard(spark, d.toString)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((7L, 7L, 1L, 0L)), r)
  }

  test("q283 selectivity estimate is within one bin's mass of exact") {
    // The estimator's theorem: full bins contribute exactly, only the
    // straddling bin interpolates — so |est - exact| is bounded by the
    // largest bin's row count, at every threshold.
    val sf = TestSpark.sf
    val maxBin = graft.queries.Relational.equiDepthHist(spark, sf)
      .agg(org.apache.spark.sql.functions.max("n")).as[Long].collect().head
    val rows = graft.queries.Relational.selectivityEst(spark, sf)
      .selectExpr("thr", "est_rows", "exact_rows")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.size == 6 && rows.exists(_._3 > 0), rows)
    rows.foreach { case (thr, est, exact) =>
      assert(math.abs(est - exact) <= maxBin, s"thr=$thr est=$est exact=$exact")
    }
  }

  test("q284 skew list is bounded by the share floor and internally exact") {
    val rows = graft.queries.TextAnalysis.skewKeys(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 100, rows.size) // 1% floor => <=100
    rows.foreach { case (k, ce, co, pairs, share) =>
      assert(pairs == ce * co, s"k=$k")
      assert(share >= 10000L && share <= 1000000L, s"k=$k share=$share")
    }
    assert(rows.map(_._5).sum <= 1000000L, "shares cannot exceed the whole")
  }
}
