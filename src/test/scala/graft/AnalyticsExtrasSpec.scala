package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.queries.{Graph, Joins, Similarity, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form specs for the fixed-point PageRank, the exact-integer
  * distribution-shift, and the PPS systematic sample — each pinned to
  * hand-computed (or brute-force-modeled) expectations on tiny graphs and
  * corpora, the shapes where the arithmetic can be checked by eye.
  */
class AnalyticsExtrasSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def stageLineitem(rows: Seq[(Long, Long)]): String = {
    val d = Files.createTempDirectory("prspec")
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d.toString
  }

  private def stageDocs(rows: Seq[(Long, String, String, String)]): String = {
    val d = Files.createTempDirectory("docspec")
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d.toString
  }

  test("q140: K3 is a fixed point of the integer PageRank update") {
    // complete triangle: perfect symmetry -> every iteration maps
    // 10^9 -> 0.15*10^9 + 0.85*10^9 = 10^9 exactly (no rounding loss)
    val dir = stageLineitem(Seq(1L, 2L, 3L).map(p => (10L, p)))
    val pr = Graph.pageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L),
      pr)
  }

  test("q140: star graph ranks match the hand-run fixed-point recurrence") {
    // center 0 with leaves 1,2,3 (each order contributes one spoke edge);
    // three rounds of r' = 15e7 + 85*(sum of r div d) div 100, floor at
    // every division, computed by hand below
    val dir = stageLineitem(
      Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 2L), (3L, 0L), (3L, 3L)))
    val pr = Graph.pageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r1: leaf 433333333, center 2700000000
    // r2: leaf 915000000, center 1254999999
    // r3: leaf 505583333, center 2483250000
    assert(pr == Map(0L -> 2483250000L, 1L -> 505583333L,
      2L -> 505583333L, 3L -> 505583333L), pr)
  }

  test("q141: two disjoint-vocabulary sources each sit at TV = 0.5") {
    // corpus is x,x,y,y; source A is all-x, B is all-y ->
    // TV(A, corpus) = (|8-4| + |0-4|) * 1e6 / (2*2*4) = 500000 exactly
    val dir = stageDocs(Seq(
      (1L, "x x", "en", "A"),
      (2L, "y y", "en", "B")))
    val tv = TextAnalysis.sourceShift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tv == Map("A" -> 500000L, "B" -> 500000L), tv)
  }

  test("q141: a single source is indistinguishable from the corpus") {
    val dir = stageDocs(Seq(
      (1L, "a b c", "en", "only"),
      (2L, "b c d", "en", "only")))
    val tv = TextAnalysis.sourceShift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tv == Map("only" -> 0L), tv)
  }

  test("q143: RRF fuses disagreeing cosine/dot rankings with exact integer scores") {
    // query [1,0]; c5=[2,0] wins cosine, c6=[30,40] wins dot, c7=[0,1]
    // trails both -> RRF ties c5/c6 exactly (symmetric rank swap) and the
    // deterministic id tie-break puts c5 first
    val d = Files.createTempDirectory("rrfspec")
    Seq((0L, Array(1f, 0f)), (5L, Array(2f, 0f)),
      (6L, Array(30f, 40f)), (7L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = Similarity.rrfFusion(spark, d.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    // 1e9 div 61 + 1e9 div 62 = 16393442 + 16129032; third place gets
    // 2 * (1e9 div 63)
    assert(rows.toSeq == Seq(
      (0L, 5L, 32522474L, 1L),
      (0L, 6L, 32522474L, 2L),
      (0L, 7L, 31746030L, 3L)), rows.toSeq)
  }

  test("q144: half-open overlap semantics and exactly-once pairs across grid cells") {
    def ev(id: Long, ts: String, ty: String): (Long, Long, Long, String, Double) =
      (id, Timestamp.valueOf(ts).getTime * 1000000L, id, ty, 0.0)
    val d = Files.createTempDirectory("ivspec")
    Seq(
      ev(1L, "2024-01-01 10:00:00", "error"),    // [10:00:00, 10:05:00)
      ev(2L, "2024-01-01 10:02:30", "purchase"), // overlaps E1 by 150s
      ev(3L, "2024-01-01 10:05:00", "purchase"), // touches E1 end: NOT a pair
      ev(4L, "2024-01-01 10:30:00", "purchase"), // disjoint
      ev(5L, "2024-01-01 10:18:00", "error"),    // spans the 10:20 cell edge
      ev(6L, "2024-01-01 10:19:00", "purchase")) // also spans it: ONE pair
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val pairs = Joins.intervalOverlap(spark, d.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // multiset equality: a pair surfacing in both shared grid cells would
    // show up as a duplicate row here
    assert(pairs.sorted.toSeq == Seq(
      (1L, 2L, 150000000L),
      (5L, 6L, 240000000L)), pairs.toSeq)
  }

  test("q145: day-sketch union counts a cross-day repeat user once") {
    // Mon {1,2,3} + Tue {3,4}: the union must estimate 4, not 5 — at this
    // cardinality the HLL is in exact sparse mode, so a double-counting
    // merge is a deterministic failure, not a bounds coin-flip
    def ev(id: Long, ts: String, u: Long) =
      (id, Timestamp.valueOf(ts).getTime * 1000000L, u, "view", 0.0)
    val d = Files.createTempDirectory("hllspec")
    Seq(ev(1L, "2024-01-01 10:00:00", 1L), ev(2L, "2024-01-01 11:00:00", 2L),
      ev(3L, "2024-01-01 12:00:00", 3L), ev(4L, "2024-01-02 10:00:00", 3L),
      ev(5L, "2024-01-02 11:00:00", 4L))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.queries.Scalars.sketchRollup(spark, d.toString).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 4L &&
      rows(0).getBoolean(2), rows.toSeq)
  }

  test("q146: token mass pulls the weighted median past the plain median") {
    // source A: lengths 10,20,30 with token weights 1,1,8 — half the mass
    // (5 of 10) is crossed only at the 30-char doc, where a plain median
    // would report 20; source B pins the exact-tie crossing (2cw == tw)
    val d = Files.createTempDirectory("wmspec")
    Seq(
      (1L, "t", "en", "A", 10L), (2L, "t", "en", "A", 20L),
      (3L, Seq.fill(8)("t").mkString(" "), "en", "A", 30L),
      (4L, "t t", "en", "B", 5L), (5L, "t t", "en", "B", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.weightedMedian(spark, d.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map("A" -> ((30L, 10L)), "B" -> ((5L, 4L))), rows)
  }

  test("q147: trigram paths count overlapping windows per ordered journey") {
    def ev(id: Long, ts: String, u: Long, ty: String) =
      (id, Timestamp.valueOf(ts).getTime * 1000000L, u, ty, 0.0)
    val d = Files.createTempDirectory("trispec")
    Seq(
      ev(1L, "2024-01-01 10:00:00", 1L, "view"),
      ev(2L, "2024-01-01 10:01:00", 1L, "click"),
      ev(3L, "2024-01-01 10:02:00", 1L, "purchase"),
      ev(4L, "2024-01-01 10:03:00", 1L, "signup"),
      ev(5L, "2024-01-01 09:00:00", 2L, "view"),
      ev(6L, "2024-01-01 09:01:00", 2L, "click"),
      ev(7L, "2024-01-01 09:02:00", 2L, "purchase"),
      ev(8L, "2024-01-01 08:00:00", 3L, "view"), // 2-event journey: no trigram
      ev(9L, "2024-01-01 08:01:00", 3L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.queries.Temporal.pathTrigrams(spark, d.toString).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(
      ("view>click>purchase", 2L), ("click>purchase>signup", 1L)), rows.toSeq)
  }

  test("q149: frequency-ranked ids, ordered fingerprint, and OOV past the cap") {
    // corpus a:3 b:1 c:1 -> ids a=1, b=2, c=3 ((count desc, token) rank);
    // doc 3 carries 1100 distinct once-tokens, so exactly the 100 ranked
    // past the 1000-cap encode as OOV id 0
    val rare = (1 to 1100).map(i => f"t$i%04d")
    val dir = stageDocs(Seq(
      (1L, "a a b", "en", "s"),
      (2L, "a c", "en", "s"),
      (3L, rare.mkString(" "), "en", "s")))
    val rows = TextAnalysis.vocabEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    // vocab: a=1, then the 999 smallest once-tokens in (count, token) rank
    // order b, c, t0001..t0997 -> doc1 = 1,1,2; doc2 = 1,3
    assert(rows(1L) == ((3L, 0L, md5("1,1,2"))), rows(1L))
    assert(rows(2L) == ((2L, 0L, md5("1,3"))), rows(2L))
    assert(rows(3L)._1 == 1100L && rows(3L)._2 == 103L, rows(3L))
  }

  test("q150: length-sorted batching eliminates the padding the naive order pays") {
    // 32 one-token docs interleaved with 32 five-token docs: naive batches
    // mix lengths (every batch pads to 5), sorted batches are homogeneous
    val docs = (1L to 64L).map { i =>
      val w = if (i % 2 == 1) 1 else 5
      (i, Seq.fill(w)("t").mkString(" "), "en", "s")
    }
    val rows = TextAnalysis.batchShaping(spark, stageDocs(docs)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // total = 32*1 + 32*5 = 192; naive padded = 2 batches * 32*5 = 320
    // -> (320-192)/320 = 400000 ppm; sorted padded = 32*1 + 32*5 = 192 -> 0
    assert(rows.toSeq == Seq(("en", 2L, 192L, 0L, 400000L)), rows.toSeq)
  }

  test("q151: pane-merged sliding distinct unions exactly the trailing 7 days") {
    def ev(id: Long, ts: String, u: Long) =
      (id, Timestamp.valueOf(ts).getTime * 1000000L, u, "view", 0.0)
    val d = Files.createTempDirectory("slidespec")
    // Mon {1,2}, Tue {2,3}, and a day 9 days later {4}: the trailing
    // window must carry Mon into Tue (3 distinct) but NOT into the far
    // day (1 distinct) — sparse-mode HLL makes both checks exact
    Seq(ev(1L, "2024-01-01 10:00:00", 1L), ev(2L, "2024-01-01 11:00:00", 2L),
      ev(3L, "2024-01-02 10:00:00", 2L), ev(4L, "2024-01-02 11:00:00", 3L),
      ev(5L, "2024-01-10 10:00:00", 4L))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.queries.Scalars.slidingDistinct(spark, d.toString)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 2L, true),
      ("2024-01-02 00:00:00.0", 3L, true),
      ("2024-01-10 00:00:00.0", 1L, true)), rows.toSeq)
  }

  test("q152: attribution credits only clicks within the trailing 7-day window") {
    def ev(id: Long, ts: String, u: Long, ty: String) =
      (id, Timestamp.valueOf(ts).getTime * 1000000L, u, ty, 0.0)
    val d = Files.createTempDirectory("attrspec")
    Seq(
      ev(1L, "2024-01-08 09:00:00", 1L, "click"),    // 2d before: attributed
      ev(2L, "2024-01-01 09:00:00", 2L, "click"),    // 9d before: organic
      ev(3L, "2024-01-11 09:00:00", 4L, "click"),    // after purchase: organic
      ev(10L, "2024-01-10 12:00:00", 1L, "purchase"),
      ev(11L, "2024-01-10 12:00:00", 2L, "purchase"),
      ev(12L, "2024-01-10 12:00:00", 3L, "purchase"), // no click at all
      ev(13L, "2024-01-10 12:00:00", 4L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.queries.Joins.attribution(spark, d.toString).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSeq == Seq(("2024-01-10 00:00:00.0", 4L, 1L, 3L)),
      rows.toSeq)
  }

  test("the whole new-operator wave yields empty results on an empty corpus, no crash") {
    import org.apache.spark.sql.types._
    val d = Files.createTempDirectory("emptyspec")
    def empty(file: String, schema: StructType): Unit =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(s"$d/$file")
    empty("lineitem.parquet", StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType))))
    empty("documents.parquet", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))))
    empty("events.parquet", StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType))))
    empty("embeddings.parquet", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
    val dir = d.toString
    val fns: Seq[(String, () => Long)] = Seq(
      "q140" -> (() => Graph.pageRank(spark, dir).count()),
      "q141" -> (() => TextAnalysis.sourceShift(spark, dir).count()),
      "q142" -> (() => TextAnalysis.ppsSample(spark, dir).count()),
      "q143" -> (() => Similarity.rrfFusion(spark, dir).count()),
      "q144" -> (() => Joins.intervalOverlap(spark, dir).count()),
      "q145" -> (() => graft.queries.Scalars.sketchRollup(spark, dir).count()),
      "q146" -> (() => TextAnalysis.weightedMedian(spark, dir).count()),
      "q147" -> (() => graft.queries.Temporal.pathTrigrams(spark, dir).count()),
      "q149" -> (() => TextAnalysis.vocabEncode(spark, dir).count()),
      "q150" -> (() => TextAnalysis.batchShaping(spark, dir).count()),
      "q151" -> (() => graft.queries.Scalars.slidingDistinct(spark, dir).count()),
      "q152" -> (() => Joins.attribution(spark, dir).count()))
    for ((name, f) <- fns)
      assert(f() == 0L, s"$name should be empty on an empty corpus")
  }

  test("q157: rollup levels dedup across panes — day, week, and grand total") {
    def ev(id: Long, ts: String, u: Long) =
      (id, Timestamp.valueOf(ts).getTime * 1000000L, u, "view", 0.0)
    val d = Files.createTempDirectory("cubespec")
    // week of Jan 1: Mon {1,2}, Tue {2,3}; week of Jan 8: Thu {3,4}.
    // week subtotals 3 and 2; grand total 4 — user 3 spans weeks and
    // must collapse in the top-level union (sparse HLL => exact)
    Seq(ev(1L, "2024-01-01 10:00:00", 1L), ev(2L, "2024-01-01 11:00:00", 2L),
      ev(3L, "2024-01-02 10:00:00", 2L), ev(4L, "2024-01-02 11:00:00", 3L),
      ev(5L, "2024-01-11 10:00:00", 3L), ev(6L, "2024-01-11 11:00:00", 4L))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.queries.Scalars.sketchCube(spark, d.toString).collect()
      .map(r => (Option(r.getTimestamp(0)).map(_.toString).getOrElse("-"),
        Option(r.getTimestamp(1)).map(_.toString).getOrElse("-"),
        r.getLong(2), r.getBoolean(3))).sortBy(t => (t._1, t._2))
    assert(rows.forall(_._4), rows.toSeq)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq == Seq(
      ("-", "-", 4L),
      ("2024-01-01 00:00:00.0", "-", 3L),
      ("2024-01-01 00:00:00.0", "2024-01-01 00:00:00.0", 2L),
      ("2024-01-01 00:00:00.0", "2024-01-02 00:00:00.0", 2L),
      ("2024-01-08 00:00:00.0", "-", 2L),
      ("2024-01-08 00:00:00.0", "2024-01-11 00:00:00.0", 2L)), rows.toSeq)
  }

  test("q142: selection matches a brute-force stride walk, ~50 per stratum") {
    // 100 unit-weight docs + one 49-token doc in a second stratum; model
    // the stride walk in plain Scala and require the exact same pick set
    val en = (1L to 100L).map(i => (i, "t", "en", "s"))
    val de = Seq((200L, Seq.fill(49)("w").mkString(" "), "de", "s")) ++
      (201L to 251L).map(i => (i, "w", "de", "s"))
    val dir = stageDocs(en ++ de)
    val picked = TextAnalysis.ppsSample(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(0))).toSet

    def model(docs: Seq[(Long, Long)]): Set[Long] = {
      val total = docs.map(_._2).sum
      val step = math.max(total / 50, 1L)
      var cw = 0L
      docs.sortBy(_._1).flatMap { case (id, w) =>
        val prev = cw; cw += w
        if (cw / step > prev / step) Some(id) else None
      }.toSet
    }
    val expected =
      model(en.map(d => (d._1, 1L))).map("en" -> _) ++
        model((200L, 49L) +: (201L to 251L).map(_ -> 1L)).map("de" -> _)
    assert(picked == expected,
      s"diff: ${picked.diff(expected)} / ${expected.diff(picked)}")
    // en stratum: W=100, step=2 -> exactly the even-cumsum docs (50 picks)
    assert(picked.count(_._1 == "en") == 50)
  }

  test("q160: linear scorer matches an independent JVM reimplementation of the model") {
    // Reimplement hash->bucket->weight in plain Scala (MessageDigest, not
    // Spark's conv/md5) — agreement proves the SQL expression computes the
    // intended model, not merely something self-consistent.
    def bucket(t: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16) % 1024L
    }
    def weight(b: Long): Long = (b * 31L + 7L) % 1999L - 999L
    def model(text: String): (Long, Long) = {
      val ws = text.split(" ").filter(_.nonEmpty)
      val feats = ws.toSeq ++ ws.toSeq.sliding(2).filter(_.size == 2)
        .map(p => p(0) + "_" + p(1))
      (feats.size.toLong, feats.map(t => weight(bucket(t))).sum)
    }
    val docs = Seq(
      (1L, "the quick brown fox", "en", "web"),
      (2L, "one", "en", "web"),           // single word: no bigrams
      (3L, "a a a", "en", "web"))         // repeated features count per occurrence
    val dir = stageDocs(docs)
    val got = TextAnalysis.linearQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    docs.foreach { case (id, text, _, _) =>
      val (nf, sc) = model(text)
      assert(got(id) == ((nf, sc, sc > 0L)), s"doc $id: ${got(id)} vs ($nf,$sc)")
    }
  }

  test("q159: BPE learns the hand-computed merge sequence; encode is greedy lowest-rank") {
    import graft.operators.Bpe
    // corpus {abab x2, ab x1}: pair counts (a,b)=5, (b,a)=2 -> merge 1 is
    // (a,b); then (ab,ab)=2 is the only pair -> merge 2; then every word
    // is a single symbol -> early stop despite k=5
    val merges = Bpe.train(spark,
      Seq(("abab", 2L), ("ab", 1L)).toDF("w", "freq"), k = 5)
    assert(merges == Seq(("a", "b"), ("ab", "ab")), merges)
    val rank = merges.zipWithIndex.toMap
    // rank-0 merge applies everywhere first, then the rank-1 fuse;
    // leftover "ab" stays (no (abab,ab) merge was learned)
    assert(Bpe.encode("ababab", rank) == Seq("abab", "ab"))
    assert(Bpe.encode("ba", rank) == Seq("b", "a")) // nothing applies
    assert(Bpe.encode("aab", rank) == Seq("a", "ab"))
    assert(Bpe.encode("", rank) == Seq.empty)
    // encode round-trips by construction: merges only concatenate
    Seq("ababab", "ba", "aab", "abba", "a").foreach { w =>
      assert(Bpe.encode(w, rank).mkString == w)
    }
    // deterministic tie-break: equal pair counts -> lexicographically
    // first pair wins, on any partitioning
    val tie = Bpe.train(spark,
      Seq(("xy", 1L), ("yz", 1L)).toDF("w", "freq").repartition(4), k = 1)
    assert(tie == Seq(("x", "y")), tie)
    // the saved-tokenizer artifact round-trips with rank order intact
    val p = Files.createTempDirectory("bpesave").toString + "/merges"
    Bpe.save(spark, merges, p)
    assert(Bpe.load(spark, p) == merges)
  }

  test("BPE local and distributed trainers learn identical merges") {
    import graft.operators.Bpe
    // irregular vocabulary with re-merging symbols, ties, and a
    // single-char word that drops out of pair counting immediately
    val vocab = Seq(("abab", 2L), ("ab", 1L), ("banana", 3L),
      ("bandana", 1L), ("x", 9L), ("xyxy", 2L), ("yz", 2L))
    def run(impl: String): Seq[(String, String)] = {
      spark.conf.set("graft.bpe.trainImpl", impl)
      try Bpe.train(spark, vocab.toDF("w", "freq").repartition(3), k = 8)
      finally spark.conf.unset("graft.bpe.trainImpl")
    }
    val local = run("local")
    val dist = run("distributed")
    assert(local == dist, s"$local vs $dist")
    assert(local.size == 8, local)
    // auto takes SOME path and agrees; a typo'd impl fails loudly
    assert(run("auto") == local)
    val bad = intercept[IllegalArgumentException] { run("lcoal") }
    assert(bad.getMessage.contains("trainImpl"), bad.getMessage)
  }

  test("q161: two exact-duplicate clusters co-locate 100% with full drop coverage") {
    // ids 0-4 are EXACTLY e1, ids 5-9 EXACTLY e2 (zero jitter, so the
    // outcome is closed-form): seeds 0-7 duplicate e1 five times and e2
    // three times; the (d2, cid) tie-break sends every e1 point to cid 0
    // and every e2 point to cid 5, empty centroids vanish at the first
    // update, and Lloyd is stable — co-location is exactly 100% and every
    // within-cluster pair's larger id is dropped. (With per-point jitter
    // and k near the point count, Lloyd keeps singleton clusters and
    // recall collapses — the k-vs-recall trade the operator documents;
    // the first draft of this test proved it empirically.)
    val d = Files.createTempDirectory("semspec")
    val rows = (0 until 10).map { i =>
      val c = i / 5
      val base = if (c == 0) Array(1.0f, 0.0f, 0.0f)
                 else Array(0.0f, 1.0f, 0.0f)
      (i.toLong, s"c$c", base.toSeq)
    }
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = Similarity.semanticDedup(spark, d.toString).collect().head
    assert(r.getAs[Long]("n_true_pairs") == 20L, r) // 2 * C(5,2)
    assert(r.getAs[Boolean]("subset_ok"), r)
    assert(r.getAs[Boolean]("drop_covers_ok"), r)
    assert(r.getAs[Boolean]("recall_ok"), r)
  }

  test("ScaleUp writes factor-x slices with disjoint ids and preserved density") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val src = Files.createTempDirectory("scaleup_src").toString
    val dst = Files.createTempDirectory("scaleup_dst").toString
    Seq((0L, 10L, 1.0), (1L, 11L, 2.0), (2L, 10L, 3.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$src/lineitem.parquet")
    Seq((0L, "alpha beta", "en", "s0"), (1L, "gamma", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    Seq((0L, Array(0.5f, -0.25f), 0), (1L, Array(0.25f, 0.125f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
    graft.tools.ScaleUp.run(spark, src, dst, 3)
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    assert(li.count() == 9)
    // disjoint keys per copy: 3x the source's 3 distinct orders — degrees flat
    assert(li.agg(countDistinct(col("l_orderkey"))).head.getLong(0) == 9)
    val docs = spark.read.parquet(s"$dst/documents.parquet")
      .as[(Long, String, String, String)].collect()
    assert(docs.length == 6 && docs.map(_._1).distinct.length == 6)
    // copies i>0 carry suffixed tokens: cross-copy shingles disjoint
    assert(docs.count(_._2.contains("_1")) == 2)
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
      .as[(Long, Seq[Float], Int)].collect()
    assert(emb.length == 6 && emb.map(_._1).distinct.length == 6)
    // vectors verbatim in every copy (cost model: rows x dims only)
    assert(emb.count(_._2 == Seq(0.5f, -0.25f)) == 3)
  }
}
