package graft

import graft.operators.MRJob
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Semantics invariants of the MapReduce surface (SURVEY.md §5.2):
  * the reference's add-merge model is only correct for commutative
  * monoids — our facade must satisfy the same algebraic laws.
  * (Raw scalacheck Gens sampled with fixed seeds — the scalatest
  * bridge artifact isn't on the offline classpath.) */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val word = Gen.oneOf("a", "b", "cc", "ddd", "ef")
  private val doc = Gen.listOf(word).map(_.mkString(" "))
  private val corpus = Gen.listOfN(8, doc)

  private def sample(seed: Long): List[String] =
    corpus.apply(Gen.Parameters.default, Seed(seed)).get

  private def wc(lines: Seq[String]): Map[String, Long] =
    MRJob(spark.createDataset(lines))
      .mapToPairs(l => l.split(" ", -1).iterator.filter(_.nonEmpty).map(_ -> 1L))
      .reduceByKey(_ + _)
      .pairs.collect().toMap

  test("native as-of join == brute-force model on random inputs") {
    // the custom physical operator against an independent O(n·m) in-memory
    // model: for every probe row, the build row with the same key and the
    // greatest time <= probe time, ties impossible (unique build times per
    // key by construction), absent keys null-extended
    val rnd = new scala.util.Random(31)
    for (round <- 1 to 5) {
      val probe = Seq.fill(200)(
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt()))
      val build = rnd.shuffle(
        (for (k <- 0 until 6; t <- 0 until 1000 by (7 + round))
          yield (k.toLong, t.toLong)).toList)
        .map { case (k, t) => (k, t, s"v${k}_$t") }
      val model: Map[(Long, Long, Int), Option[String]] = probe.map { case (k, t, id) =>
        (k, t, id) -> build.filter(b => b._1 == k && b._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      val rows = graft.plans.AsOfJoin(
        probe.toDF("k", "t", "id"), build.toDF("bk", "bt", "v"),
        "k", "bk", "t", "bt")
        .collect()
      assert(rows.length == probe.size, s"round $round: cardinality")
      val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) ->
        Option(r.getString(5))).toMap
      assert(got == model, s"round $round")
    }
  }

  test("q144 grid interval join == brute-force quadratic model on random inputs") {
    // the 600s-cell equi-join decomposition against the O(n·m) definition:
    // same pair set, same half-open overlap lengths, and NO duplicate
    // pairs (the first-shared-cell rule under random cell-edge straddles)
    val rnd = new scala.util.Random(47)
    for (round <- 1 to 3) {
      val base = 1704100000L + round
      val errs = (1 to 60).map(i => (i.toLong, base + rnd.nextInt(7200).toLong))
      val buys = (1 to 60).map(i => (100L + i, base + rnd.nextInt(7200).toLong))
      val dir = java.nio.file.Files.createTempDirectory("ivprop")
      (errs.map { case (id, s) => (id, s * 1000000000L, id, "error", 0.0) } ++
        buys.map { case (id, s) => (id, s * 1000000000L, id, "purchase", 0.0) })
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val model = (for {
        (ei, es) <- errs; (bi, bs) <- buys
        if es < bs + 300 && bs < es + 300
      } yield (ei, bi,
        (math.min(es, bs) + 300 - math.max(es, bs)) * 1000000L)).toSet
      val got = graft.queries.Joins.intervalOverlap(spark, dir.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == got.toSet.size, s"round $round: duplicate pairs")
      assert(got.toSet == model, s"round $round")
    }
  }

  test("WordCount over a concatenation == monoid merge of per-part WordCounts") {
    for (seed <- 1L to 5L) {
      val (p1, p2) = (sample(seed), sample(seed + 100))
      val whole = wc(p1 ++ p2)
      val merged = (wc(p1).toSeq ++ wc(p2).toSeq)
        .groupMapReduce(_._1)(_._2)(_ + _)
      assert(whole == merged, s"seed=$seed")
    }
  }

  test("reduceByKey agrees with a driver-side fold for any merge order") {
    for (seed <- 10L to 14L) {
      val lines = sample(seed)
      val expected = lines.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupMapReduce(identity)(_ => 1L)(_ + _)
      assert(wc(lines) == expected, s"seed=$seed")
    }
  }

  test("q51 shingle df cap bounds the self-join pair space") {
    import org.apache.spark.sql.functions.{col, count, lit, max}
    val cap = graft.queries.Dedup.maxShingleDf
    // 1. No surviving shingle on the real test table exceeds the cap.
    val sh = graft.queries.Dedup.cappedShingles(spark, TestSpark.sf)
    val maxDf = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).head.getLong(0)
    assert(maxDf <= cap, s"max shingle df $maxDf exceeds cap $cap")
    // 2. A synthetic stop-shingle shared by cap+16 docs is dropped, while a
    //    genuine near-dup pair sharing rare shingles is still found.
    val hotDocs = (1L to (cap + 16L)).map(i =>
      (i, s"hot stop shingle plus unique word$i tail$i"))
    val nearDup = Seq(
      (9001L, "rare alpha beta gamma delta epsilon zeta"),
      (9002L, "rare alpha beta gamma delta epsilon eta"))
    val dir = java.nio.file.Files.createTempDirectory("dfcap").toString
    (hotDocs ++ nearDup).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.queries.Dedup.jaccardPairs(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((9001L, 9002L)), pairs)
    // hot docs share ONLY the capped shingle -> no pair between them
    assert(!pairs.exists { case (a, b) => a <= cap + 16 && b <= cap + 16 },
      pairs)
  }

  test("q279 PPJoin prefix filter finds exactly the qualifying pairs") {
    // doc0/doc1: 12 words, last differs -> 10 shingles each, 9 shared:
    // jac = 9/11 = 818181 ppm (kept). doc2/doc3: 11 words, last differs ->
    // 9 shingles, 8 shared: jac = 8/10 = exactly 0.8 (the boundary —
    // MUST survive the prefix filter). doc4 disjoint; doc5/doc6 share
    // 1 of 7 shingles (dropped).
    val a11 = (1 to 11).map(i => s"a$i").mkString(" ")
    val b10 = (1 to 10).map(i => s"b$i").mkString(" ")
    val rows = Seq(
      (0L, s"$a11 tailx"), (1L, s"$a11 taily"),
      (2L, s"$b10 endx"), (3L, s"$b10 endy"),
      (4L, (1 to 12).map(i => s"c$i").mkString(" ")),
      (5L, "d1 d2 d3 d4 d5 d6"), (6L, "d1 d2 d3 e4 e5 e6"))
    val dir = java.nio.file.Files.createTempDirectory("ppjoin").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Dedup.ppjoinPairs(spark, dir)
      .select("d1", "d2", "jac_ppm").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 818181L), (2L, 3L, 800000L)), got)
  }

  test("q56 SimHash bands are 4x16-bit with bounded bucket membership") {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max}
    val cap = graft.queries.Dedup.maxBandBucket
    val bands = graft.queries.Dedup.cappedSimhashBands(spark, TestSpark.sf)
    // 1. After capping, no (band, bits) bucket exceeds the membership cap —
    //    the band self-join's pair space is bounded by cap^2/2 per bucket.
    val stats = bands.groupBy(col("band"), col("bits"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("maxN")).head
    assert(stats.getLong(0) <= cap, s"bucket of ${stats.getLong(0)} > cap $cap")
    // 2. Band values fit 16 bits and there are 4 bands per doc: the bucket
    //    key space is 4 * 65536, so expected occupancy at corpus size N is
    //    N/65536 per band — not the 64-value buckets of a 16-bit print.
    val shape = bands.agg(
      max(col("bits")).as("maxBits"),
      countDistinct(col("band")).as("nBands")).head
    assert(shape.getLong(0) <= 65535L)
    assert(shape.getLong(1) == 4L)
    // 3. A degenerate corpus (many identical docs -> one bucket per band)
    //    is capped out instead of going quadratic.
    val dir = java.nio.file.Files.createTempDirectory("bandcap").toString
    (1L to (cap + 64L)).map(i => (i, "same text in every document"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(graft.queries.Dedup.simhashPairs(spark, dir).count() == 0L)
  }

  test("span family handles degenerate corpora without failing") {
    // All-identical corpus: every position duplicated, every doc fully cut.
    val same = java.nio.file.Files.createTempDirectory("spans_same").toString
    (1L to 6L).map(i => (i, "every doc is exactly this same twelve token sentence here now", "src1"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$same/documents.parquet")
    val cut = graft.queries.Dedup.spanCut(spark, same)
      .select("n_removed", "clean_text")
      .as[(Long, String)].collect()
    assert(cut.length == 6 && cut.forall(r => r._1 == 11L && r._2.isEmpty), cut.toSeq)

    // All-tiny corpus (< 3 tokens): no shingles exist — span stats are
    // empty, the cut passes every doc through untouched.
    val tiny = java.nio.file.Files.createTempDirectory("spans_tiny").toString
    Seq((1L, "one two", "src1"), (2L, "x", "src2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tiny/documents.parquet")
    assert(graft.queries.Dedup.dupSpans(spark, tiny).count() == 0L)
    assert(graft.queries.Dedup.dupSpanExtract(spark, tiny).count() == 0L)
    val through = graft.queries.Dedup.spanCut(spark, tiny)
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(through(1L) == ((1L, 0L, "one two")) &&
      through(2L) == ((2L, 0L, "x")), through)
  }

  test("q112 winnowing guarantee: adjacent fingerprints within one window") {
    // Schleimer et al. Thm: every window of w consecutive positions
    // contains a selected fingerprint, so consecutive selections in a doc
    // are at most w positions apart. Pinned on the real table.
    val w = graft.queries.Dedup.winnowW
    val fps = graft.queries.Dedup.winnowFingerprints(spark, TestSpark.sf)
      .select("doc_id", "fp_pos").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(fps.nonEmpty)
    fps.foreach { case (d, ps) =>
      ps.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= w, s"doc $d gap $a -> $b")
        case _ =>
      }
    }
  }

  test("q107 multi-probe IVF candidates subsume q62's single probe") {
    // Multi-probe's candidate set is a strict superset (probes[1] == the
    // single-probe bucket), so its per-query top-3 cosine mass can only be
    // >= single-probe's — a theorem of the construction, pinned here on the
    // real embeddings table.
    val single = graft.queries.Similarity.knnIvf(spark, TestSpark.sf)
      .groupBy("query_id").sum("cos")
      .as[(Long, Double)].collect().toMap
    val multi = graft.queries.Similarity.knnIvfMultiprobe(spark, TestSpark.sf)
      .groupBy("query_id").sum("cos")
      .as[(Long, Double)].collect().toMap
    assert(multi.nonEmpty && single.keySet == multi.keySet)
    single.foreach { case (q, s) =>
      assert(multi(q) >= s - 1e-12, s"query $q: multi ${multi(q)} < single $s")
    }
  }

  test("q103 dup spans / q104 novelty / q105 cross-dedup semantics") {
    // q103: docs 1-2 share a 12-token verbatim block -> 10 consecutive
    // duplicated shingle positions (boundary shingles differ); doc 3 is
    // fully unique. Docs 4-5 are exact copies (novelty 0 -> boilerplate).
    val block = (1 to 12).map(i => s"block$i").mkString(" ")
    val docs = Seq(
      (1L, s"one lead tokens $block trailing unique1 text1", "src2"),
      (2L, s"two other start $block different unique2 tail2", "src2"),
      (3L, "entirely unique document with no duplicated spans at all", "src2"),
      (4L, "copy of common text repeated verbatim across the whole corpus body today", "src9"),
      (5L, "copy of common text repeated verbatim across the whole corpus body today", "src1"),
      (6L, block, "src5")) // doc 6 = the block alone: contained in 1 and 2
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val spans = graft.queries.Dedup.dupSpans(spark, dir)
      .select("doc_id", "n_dup", "max_run", "flagged")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(spans(1L)._3 == 10L && spans(1L)._4, spans(1L)) // run of 10 >= 8
    assert(spans(2L)._3 == 10L && spans(2L)._4, spans(2L))
    assert(spans(3L) == ((3L, 0L, 0L, false)), spans(3L))  // nothing shared
    assert(spans(4L)._4 && spans(5L)._4)                   // whole-doc copy

    val nov = graft.queries.Dedup.novelty(spark, dir)
      .select("doc_id", "n_shingles", "n_novel", "boilerplate")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(nov(3L)._3 == nov(3L)._2 && !nov(3L)._4, nov(3L)) // all novel
    assert(nov(4L)._3 == 0L && nov(4L)._4, nov(4L)) // exact copy: 0 novel
    assert(nov(5L)._3 == 0L && nov(5L)._4, nov(5L))

    // q109: containment catches the subset cases Jaccard misses — doc 6's
    // shingles are ALL inside docs 1 and 2 (containment 1.0, contained_id
    // = the smaller-set doc 6) while the 1-2 overlap itself (10 of 16
    // shingles) stays under the 0.8 bar; exact copies 4-5 hit 1.0.
    val contain = graft.queries.Dedup.containmentPairs(spark, dir)
      .select("d1", "d2", "containment", "contained_id")
      .as[(Long, Long, Double, Long)].collect()
    val c16 = contain.find(p => p._1 == 1L && p._2 == 6L).get
    assert(c16._3 == 1.0 && c16._4 == 6L, c16)
    assert(contain.exists(p => p._1 == 4L && p._2 == 5L && p._3 == 1.0))
    assert(!contain.exists(p => p._1 == 1L && p._2 == 2L), contain.toSeq)

    // q110: the span cut removes exactly the duplicated block from doc 1
    // (span of 10 positions covers tokens 3..14), empties the whole-doc
    // copies, and leaves the span-free doc 3 untouched.
    val cutRes = graft.queries.Dedup.spanCut(spark, dir)
      .select("doc_id", "n_before", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(cutRes(1L)._4 == "one lead tokens trailing unique1 text1", cutRes(1L))
    assert(cutRes(4L)._4 == "" && cutRes(4L)._3 == 12L, cutRes(4L))
    assert(cutRes(3L)._3 == 0L &&
      cutRes(3L)._4 == "entirely unique document with no duplicated spans at all")
    assert(cutRes.size == docs.size)

    // q105: exact copies in src9/src1 -> keep the src1 copy (priority =
    // numeric suffix, lower wins); singletons keep themselves.
    val keep = graft.queries.Dedup.crossDedup(spark, dir)
      .select("keep_id", "keep_source", "n_copies", "n_sources")
      .as[(Long, String, Long, Long)].collect()
    val dup = keep.find(_._3 == 2L).get
    assert(dup == ((5L, "src1", 2L, 2L)), dup)
    assert(keep.map(_._3).sum == docs.size) // every doc in exactly one group

    // Invariants on the real table: counts nest and the flag matches the
    // threshold arithmetic exactly.
    val real = graft.queries.Dedup.dupSpans(spark, TestSpark.sf)
      .select("n_pos", "n_dup", "max_run", "flagged")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(real.nonEmpty)
    real.foreach { case (nPos, nDup, maxRun, flagged) =>
      assert(nDup <= nPos && maxRun <= nDup)
      assert(flagged == (maxRun >= graft.queries.Dedup.minDupRun))
    }
  }

  test("q61 sign-LSH bands are 4x16-bit with bounded bucket membership") {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max}
    val cap = graft.queries.Similarity.maxSignBucket
    val bands = graft.queries.Similarity.cappedSignBands(spark, TestSpark.sf)
    // 1. After capping, no (band, bits) bucket exceeds the membership cap —
    //    the candidate self-join's pair space is bounded by cap^2/2 per
    //    bucket (the r2/q56 scale defect cannot recur here).
    val stats = bands.groupBy(col("band"), col("bits"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("maxN")).head
    assert(stats.getLong(0) <= cap, s"bucket of ${stats.getLong(0)} > cap $cap")
    // 2. Band values fit 16 bits and there are 4 bands per vector: 2^16
    //    bucket values per band, expected occupancy N/65536 — not the 256
    //    uncapped buckets of the old 8-bit signature.
    val shape = bands.agg(
      max(col("bits")).as("maxBits"),
      countDistinct(col("band")).as("nBands")).head
    assert(shape.getLong(0) <= 65535L)
    assert(shape.getLong(1) == 4L)
    // 3. A degenerate corpus (many identical vectors -> one bucket per band)
    //    is capped out instead of going quadratic.
    val dir = java.nio.file.Files.createTempDirectory("signcap").toString
    (1L to (cap + 64L)).map(i => (i, Array.fill(64)(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(graft.queries.Similarity.nearDupLsh(spark, dir).count() == 0L)
    // 4. Pigeonhole guarantee: a pair differing in <= 3 of the 64 sign bits
    //    keeps at least one band intact and IS surfaced (uncapped buckets).
    val dir2 = java.nio.file.Files.createTempDirectory("signpair").toString
    val base = Array.fill(64)(1.0f)
    val flipped = base.clone(); flipped(0) = -1.0f; flipped(1) = -1.0f
    val far = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    Seq((1L, base, 0), (2L, flipped, 0), (3L, far, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    val pairs = graft.queries.Similarity.nearDupLsh(spark, dir2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), pairs)
  }

  test("PII scrub redacts every pattern occurrence") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "mail me at john.doe+spam@sub.example.co.uk or jane_d@ex.io now"),
      (2L, "call +1 (415) 555-0123 or +44 20 7946 0958 today"),
      (3L, "card 4111111111111111 acct 000123456789"),
      (4L, "mixed: a@b.cc +1 222 333 4444 and 987654321 done"),
      (5L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = graft.queries.TextAnalysis.scrubPii(docs, "text")
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        col("n_digit_runs"), col("clean"))
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    val counts = out.map(r => (r._1, r._2, r._3, r._4)).toSeq
    assert(counts == Seq((1L, 2L, 0L, 0L), (2L, 0L, 2L, 0L),
      (3L, 0L, 0L, 2L), (4L, 1L, 1L, 1L), (5L, 0L, 0L, 0L)), counts)
    // the redacted text must contain NO residual match of any pattern
    val rescanned = graft.queries.TextAnalysis
      .scrubPii(out.map(r => (r._1, r._5)).toSeq.toDF("doc_id", "text"), "text")
      .select(col("n_emails") + col("n_phones") + col("n_digit_runs"))
      .as[Long].collect()
    assert(rescanned.forall(_ == 0L), rescanned.toSeq)
  }

  test("q87 sequence packing: offsets are a per-lang cumsum cut at the budget") {
    val rows = graft.queries.TextAnalysis.seqPacking(spark, TestSpark.sf)
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    for ((_, rs) <- rows.groupBy(_._2)) {
      var cum = 0L
      for ((docId, lang, nTok, startOff, packId, offInPack, straddles)
           <- rs.sortBy(_._1)) {
        assert(startOff == cum, s"$lang/$docId start offset")
        assert(packId == startOff / 512 && offInPack == startOff % 512,
          s"$lang/$docId pack arithmetic")
        assert(straddles == (offInPack + nTok > 512), s"$lang/$docId straddle")
        cum += nTok
      }
    }
  }

  test("q88 repetition filter drops degenerate docs, keeps diverse ones") {
    val dir = java.nio.file.Files.createTempDirectory("repq").toString
    Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // one token repeated
      (2L, "ab cd ab cd ab cd ab cd ab cd"),           // one bigram repeated
      (3L, "all words in this sentence are totally different tokens now ok"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextAnalysis.repetitionQuality(spark, dir)
      .as[(Long, Long, Double, Double, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._6)).toSeq ==
      Seq((1L, false), (2L, false), (3L, true)), out.toSeq)
    // metrics are consistent fractions and keep is exactly the conjunction
    for ((_, n, dup, top, big, keep) <- out) {
      assert(n >= 2 && dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0 && big > 0.0 && big <= 1.0)
      assert(keep == (dup <= 0.6 && top <= 0.2 && big <= 0.1))
    }
  }

  test("q166 Simpson diversity separates degenerate from diverse docs") {
    val dir = java.nio.file.Files.createTempDirectory("lexdiv").toString
    Seq(
      (1L, "spam spam spam spam spam"),            // one type: simpson = 0
      (2L, "one two three four five six seven"),   // all distinct: max
      (3L, "a a b b"))                             // two types: 1 - 8/16
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextAnalysis.lexicalDiversity(spark, dir)
      .as[(Long, Long, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._5 == 0.0 && !byId(1L)._6, byId(1L))
    assert(byId(2L)._5 == 1.0 - 7.0 / 49 && byId(2L)._6, byId(2L))
    assert(byId(3L)._5 == 0.5 && !byId(3L)._6, byId(3L)) // n_tokens < 5
    // structural invariants: N <= sum_sq <= N^2, types consistent
    for ((_, n, types, ss, simpson, _) <- out) {
      assert(ss >= n && ss <= n * n)
      assert(types >= 1 && types <= n)
      assert(simpson == 1.0 - ss.toDouble / (n * n))
    }
  }

  test("q165 temperature mix up-weights small sources, ppm sums to ~1e6") {
    val rows = graft.queries.TextAnalysis.temperatureMix(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // per-source floor rounding loses < 1 ppm each
    val ppmSum = rows.map(_._5).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - rows.length, ppmSum)
    // sqrt temperature flattens the distribution: the smallest source's
    // upsample factor must be >= the largest source's
    val bySize = rows.sortBy(_._3)
    assert(bySize.head._6 >= bySize.last._6, bySize.mkString("; "))
    // natural-share-weighted upsample factors average to ~1 by construction
    for ((_, _, tok, w, _, up) <- rows) {
      assert(w == math.floor(math.sqrt(tok.toDouble) * 1000).toLong)
      assert(up > 0)
    }
  }

  test("q167 bigram familiarity: counts, floors, and degenerate docs") {
    val dir = java.nio.file.Files.createTempDirectory("bfam").toString
    Seq(
      (1L, "a b a b a b"),   // bigrams: "a b"x3, "b a"x2
      (2L, "a b c"),         // "a b", "b c"
      (3L, "zz qq"),         // "zz qq" unique in corpus
      (4L, "solo"))          // < 2 tokens: excluded
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextAnalysis.bigramFamiliarity(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(!byId.contains(4L))
    // corpus counts: "a b"=4, "b a"=2, "b c"=1, "zz qq"=1
    assert(byId(1L) == (1L, 5L, 4L * 3 + 2L * 2, (16L * 1000) / 5,
      16.0 / 5), byId(1L))
    assert(byId(2L) == (2L, 2L, 4L + 1L, (5L * 1000) / 2, 5.0 / 2), byId(2L))
    assert(byId(3L) == (3L, 1L, 1L, 1000L, 1.0), byId(3L))
    // every doc's mean corpus frequency >= 1 (its own occurrences count)
    for ((_, nb, sc, famK, _) <- out) { assert(sc >= nb && famK >= 1000L) }
  }

  test("q168 stream ANN ingest: one decision per arrival, true in-cell top-1") {
    import org.apache.spark.sql.functions.{col, expr}
    val out = graft.queries.Similarity.streamAnnIngest(spark, TestSpark.sf)
      .as[(Long, Long, Option[Long], Option[Double], String)].collect()
    // exactly one output row per arriving vector (vec_id % 10 == 0)
    val nArr = graft.Tables(spark, TestSpark.sf, "embeddings")
      .where(col("vec_id") % 10 === 0).count()
    assert(out.length == nArr && out.map(_._1).distinct.length == out.length)
    // each decision's neighbor is a history vector in the same cell, and
    // its cosine equals the batch-computed in-cell maximum
    val all = graft.Tables(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .as[(Long, Array[Double])].collect().toMap
    def cell(v: Array[Double]): Long = {
      val h = v.take(4); h.indexOf(h.max).toLong + 1
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((vid, bucket, Some(nb), Some(c), decision) <- out) {
      assert(nb % 10 != 0 && cell(all(nb)) == bucket && cell(all(vid)) == bucket)
      val best = all.collect {
        case (hid, hv) if hid % 10 != 0 && cell(hv) == bucket => cos(all(vid), hv)
      }.max
      assert(math.abs(c - best) < 1e-12, s"$vid: $c vs $best")
      assert(decision == (if (c >= 0.9) "near_dup" else "insert"))
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
  }

  test("q172 stride chunking covers every token; overlap and tail are exact") {
    val dir = java.nio.file.Files.createTempDirectory("chunkstride").toString
    // 1-token, exactly-L, L+1 (first multi-chunk), and a long 500-token doc
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, doc(1)), (2L, doc(128)), (3L, doc(129)), (4L, doc(500)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextAnalysis.chunkStride(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    val (bigL, s) = (128L, 96L)
    assert(out(1L).map(r => (r._3, r._6)).toSeq == Seq((1L, 1L)))
    assert(out(2L).map(r => (r._3, r._6)).toSeq == Seq((1L, 128L)))
    // 129 tokens: ceil((129-128)/96)+1 = 2 windows; tail = 129-96 = 33
    assert(out(3L).map(r => (r._5, r._6)).toSeq == Seq((0L, 128L), (96L, 33L)))
    // 500 tokens: ceil(372/96)+1 = 5 windows
    assert(out(4L).length == 5)
    for ((id, rows) <- out; n = rows.head._2) {
      // starts advance by exactly the stride; every chunk inside the doc
      assert(rows.map(_._5).toSeq == rows.indices.map(_ * s).toSeq)
      for ((_, _, nw, ci, st, ln, last) <- rows) {
        assert(ln >= 1 && ln <= bigL && st + ln <= n)
        assert(last == (ci == nw - 1))
        // consecutive windows overlap by L - S (except a short tail)
        if (ci < nw - 1) assert(ln == bigL)
      }
      // the LAST window reaches the final token: full coverage
      val lastRow = rows.last
      assert(lastRow._5 + lastRow._6 == n, s"doc $id tail coverage")
    }
  }

  test("q176 source overlap counts shared fingerprints, zero-fills the rest") {
    val dir = java.nio.file.Files.createTempDirectory("srcovl").toString
    Seq(
      (1L, "dup one", "s1"),
      (2L, "DUP ONE  ", "s2"),   // same fp as doc 1 (lower+trim normalize)
      (3L, "uniq two", "s2"),
      (4L, "other", "s3"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Dedup.sourceOverlap(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    // s1 (1 fp) fully contained in s2 (2 fps): ppm = 1e6
    assert(out(("s1", "s2")) == (("s1", "s2", 1L, 1L, 2L, 1000000L)))
    assert(out(("s1", "s3")) == (("s1", "s3", 0L, 1L, 1L, 0L)))
    assert(out(("s2", "s3")) == (("s2", "s3", 0L, 2L, 1L, 0L)))
  }

  test("q69 stratified sample takes exactly min(k, stratum size) per language") {
    import org.apache.spark.sql.functions.col
    val sample = graft.queries.TextAnalysis.stratifiedSample(spark, TestSpark.sf)
      .as[(Long, String, String, Long)].collect()
    val strata = graft.Tables(spark, TestSpark.sf, "documents")
      .groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val got = sample.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(got == strata.map { case (l, n) => l -> math.min(25L, n) }, got)
    // deterministic: a second evaluation returns the identical id set
    val again = graft.queries.TextAnalysis.stratifiedSample(spark, TestSpark.sf)
      .as[(Long, String, String, Long)].collect()
    assert(sample.map(_._1).toSet == again.map(_._1).toSet)
  }

  test("q65 k-means improves inertia and assigns every point") {
    val rows = graft.queries.Similarity.kmeansFit(spark, TestSpark.sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val n = graft.Tables(spark, TestSpark.sf, "embeddings").count()
    assert(r.getAs[Long]("n_points") == n)
    assert(r.getAs[Boolean]("inertia_improved"))
    assert(r.getAs[Boolean]("clusters_ok"))
  }

  test("TsvEscape round-trips arbitrary strings and never emits structural bytes") {
    import graft.sources.TsvEscape
    // generator biased toward the hostile characters the format reserves
    val hostileChar = Gen.frequency(
      (4, Gen.oneOf('\\', '\t', '\n', '\r')),
      (6, Gen.choose(' ', '~')))
    val str = Gen.listOf(hostileChar).map(_.mkString)
    val strs = Gen.listOfN(200, str)
    val cases = strs.apply(Gen.Parameters.default, Seed(41L)).get
    cases.foreach { s =>
      val e = TsvEscape.escape(s)
      assert(TsvEscape.unescape(e) == s, s"round trip of ${s.toList}")
      // escaped form must be safe to embed in a field: no tabs/newlines
      assert(!e.exists(c => c == '\t' || c == '\n' || c == '\r'), e.toList)
    }
    // a full row of hostile fields survives the write format: join, split,
    // unescape recovers the original fields exactly
    val fields = cases.take(8)
    val line = fields.map(TsvEscape.escape).mkString("\t")
    assert(line.split('\t').map(TsvEscape.unescape).toSeq ==
      fields || fields.exists(_.isEmpty), // split drops trailing empties
      line)
  }

  test("q178 BM25 emits ranked postings for the top-df query terms") {
    val rows = graft.queries.TextAnalysis.bm25TopK(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Double, Long)].collect()
    val byTerm = rows.groupBy(_._1)
    assert(byTerm.nonEmpty && byTerm.size <= 5)
    for ((t, rs) <- byTerm) {
      assert(t.length >= 4, t)
      val sorted = rs.sortBy(_._6)
      // rk dense from 1, scores weakly decreasing in rank order, all > 0
      assert(sorted.map(_._6).toSeq == (1L to rs.length).toSeq, t)
      assert(sorted.map(_._5).toSeq.reverse == sorted.map(_._5).toSeq.sorted, t)
      assert(rs.forall(_._5 > 0), t)
      assert(rs.length <= 10, t)
      // ctf >= df: a term occurs at least once in each doc that has it
      assert(rs.forall(r => r._3 >= r._2), t)
    }
    // the query terms really are the df-top-5 among length>=4 terms,
    // recomputed independently from the raw token stream
    import org.apache.spark.sql.functions.{col, countDistinct, length => slen, lower, split, explode}
    val df = graft.Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .where(col("t") =!= "" && slen(col("t")) >= 4)
      .groupBy("t").agg(countDistinct("doc_id").as("df"))
      .as[(String, Long)].collect()
    val want = df.sortBy { case (t, d) => (-d, t) }.take(5).map(_._1).toSet
    assert(byTerm.keySet == want)
  }

  test("q179 moment matrix is exact on a hand-computed vector table") {
    val dir = java.nio.file.Files.createTempDirectory("embmom").toString
    // components chosen exactly representable at the 2^20 fixed point
    Seq(
      (0L, Array(0.5f, -0.25f), 0),
      (1L, Array(0.25f, 0.25f), 0),
      (2L, Array(0.0f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.Similarity.embedMoments(spark, dir).collect()
    assert(rows.length == 1) // d = 2 -> one (0, 1) pair
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getAs[Long]("n")) == ((0L, 1L, 3L)))
    assert(r.getAs[Double]("mean_i") == 0.25)
    assert(r.getAs[Double]("mean_j") == 1.0 / 6.0)
    // var_x = E[x^2] - mean^2 = (0.25 + 0.0625)/3 - 0.0625
    assert(math.abs(r.getAs[Double]("var_i") - (0.3125 / 3 - 0.0625)) < 1e-12)
    // cov = E[xy] - mx*my = (-0.125 + 0.0625 + 0)/3 - 0.25/6
    assert(math.abs(r.getAs[Double]("cov_pop") - (-0.0625 / 3 - 0.25 / 6)) < 1e-12)
    // and on the real table: one row per dimension pair, full n everywhere
    val real = graft.queries.Similarity.embedMoments(spark, TestSpark.sf).collect()
    val d = 64
    assert(real.length == d * (d - 1) / 2)
    val n = graft.Tables(spark, TestSpark.sf, "embeddings").count()
    assert(real.forall(_.getAs[Long]("n") == n))
    assert(real.forall(r => r.getLong(0) < r.getLong(1)))
    assert(real.forall(_.getAs[Double]("var_i") > 0))
  }

  test("q180 DSIR weights are positive, consistent, and cap selection at 100") {
    val rows = graft.queries.TextAnalysis.dsirWeights(spark, TestSpark.sf)
      .as[(Long, Boolean, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    for ((_, _, nBg, snum, w, _) <- rows) {
      assert(nBg >= 1 && snum > 0)
      assert(w == snum.toDouble / 1000000.0 / nBg.toDouble)
    }
    val sel = rows.filter(_._6)
    assert(sel.length == math.min(100, rows.length))
    // the selected set IS the top-100 by (weight desc, doc_id)
    val expected = rows.sortBy(r => (-r._5, r._1)).take(sel.length).map(_._1).toSet
    assert(sel.map(_._1).toSet == expected)
  }

  test("q182 calibrated rank is a [0,1] per-source percent rank") {
    val rows = graft.queries.TextAnalysis.qualityCalibration(spark, TestSpark.sf)
      .as[(Long, String, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, c, k) =>
      c >= 0.0 && c <= 1.0 && k == (c >= 0.2) })
    for ((_, rs) <- rows.groupBy(_._2) if rs.length >= 2) {
      // the extremes of every stratum hit exactly 0 and 1, and the
      // calibrated value equals (rank-1)/(n-1) under the (score, doc_id)
      // total order — recomputed independently
      val sorted = rs.sortBy(r => (r._3, r._1))
      val n = rs.length
      sorted.zipWithIndex.foreach { case (r, ix) =>
        assert(r._4 == ix.toDouble / (n - 1), s"${r._1}")
      }
    }
  }

  test("q183 accept probabilities match the target/raw bin ratio, capped") {
    val rows = graft.queries.TextAnalysis.distMatchSample(spark, TestSpark.sf)
      .as[(Long, String, Long, Boolean, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._5 >= 0 && r._5 <= 1000000L))
    // recompute the bin model and the acceptance decision independently
    val byBin = rows.groupBy(_._3)
    val nr = rows.length.toLong
    val nt = rows.count(_._4).toLong
    for ((bin, rs) <- byBin) {
      val rCnt = rs.length.toLong
      val tCnt = rs.count(_._4).toLong
      val want = math.min(1000000L, tCnt * nr * 1000000L / (rCnt * nt))
      assert(rs.forall(_._5 == want), s"bin $bin")
    }
    // a bin with no target mass accepts nothing
    for ((_, rs) <- byBin if rs.forall(!_._4))
      assert(rs.forall(!_._6))
  }

  test("q184 standardized dims have mean 0 and unit variance") {
    val rows = graft.queries.Similarity.embedStandardize(spark, TestSpark.sf)
      .as[(Long, Long, Double)].collect()
    val n = graft.Tables(spark, TestSpark.sf, "embeddings").count()
    val byDim = rows.groupBy(_._2)
    assert(byDim.values.forall(_.length == n))
    for ((i, rs) <- byDim) {
      val zs = rs.map(_._3)
      val mean = zs.sum / zs.length
      val varr = zs.map(z => (z - mean) * (z - mean)).sum / zs.length
      assert(math.abs(mean) < 1e-9, s"dim $i mean $mean")
      assert(math.abs(varr - 1.0) < 1e-9, s"dim $i var $varr")
    }
  }

  test("q185 trained profiles classify separable languages perfectly") {
    val dir = java.nio.file.Files.createTempDirectory("langprof").toString
    // two fake languages with DISJOINT character inventories — a trained
    // rank-profile classifier must get every document right. (The sf
    // tables can't carry this theorem: their lang labels are assigned
    // independently of the shared synthetic vocabulary, so accuracy
    // there is chance level by construction for ANY classifier.)
    val aa = Seq("aaa bab abba baab", "abab baba aab bba", "aabb bbaa abab ab")
    val zz = Seq("zzz yzy zyyz yzzy", "zyzy yzyz zzy yyz", "zzyy yyzz zyzy zy")
    val rows = aa.zipWithIndex.map { case (t, i) => (i.toLong, t, "aa", "s") } ++
      zz.zipWithIndex.map { case (t, i) => (100L + i, t, "zz", "s") }
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextAnalysis.langProfileId(spark, dir)
      .as[(Long, String, String, Long, Boolean)].collect()
    assert(out.length == rows.length)
    assert(out.forall(_._5), out.filterNot(_._5).mkString(","))
    // and on the real table: one verdict per doc, predictions drawn from
    // the label set
    val real = graft.queries.TextAnalysis.langProfileId(spark, TestSpark.sf)
      .as[(Long, String, String, Long, Boolean)].collect()
    val nDocs = graft.Tables(spark, TestSpark.sf, "documents")
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) >= 3).count()
    assert(real.length == nDocs)
    val langs = graft.Tables(spark, TestSpark.sf, "documents")
      .select("lang").distinct().as[String].collect().toSet
    assert(real.forall(r => langs.contains(r._3)))
    assert(real.forall(r => r._5 == (r._2 == r._3)))
  }

  test("q186 snake sharding balances docs and tokens within every stratum") {
    val rows = graft.queries.TextAnalysis.tokenShards(spark, TestSpark.sf)
      .as[(Long, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4 >= 0 && r._4 < 8))
    for ((lang, rs) <- rows.groupBy(_._2)) {
      val byShard = rs.groupBy(_._4).values.toSeq
      // doc-count balance: every shard holds floor(n/8) or ceil(n/8)
      val sizes = byShard.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
      // token balance: snake dealing of a descending sequence keeps the
      // per-shard spread within the largest single document
      if (byShard.size == 8) {
        val sums = byShard.map(_.map(_._3).sum)
        val maxDoc = rs.map(_._3).max
        assert(sums.max - sums.min <= maxDoc,
          s"$lang spread ${sums.max - sums.min} > $maxDoc")
      }
    }
  }

  test("q187 epoch shuffle keeps shard membership, re-permutes per epoch") {
    val rows = graft.queries.TextAnalysis.epochShuffle(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    // same (shard -> doc set) in every epoch; pos dense from 0 per group
    val membership = byEpoch.view.mapValues(
      _.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap).toMap
    assert(membership(0L) == membership(1L) && membership(1L) == membership(2L))
    for ((_, rs) <- rows.groupBy(r => (r._1, r._2)))
      assert(rs.map(_._4).sorted.toSeq == (0L until rs.length).toSeq)
    // and the permutations genuinely differ between epochs somewhere
    def order(e: Long) = byEpoch(e).sortBy(r => (r._2, r._4)).map(_._3).toSeq
    assert(order(0L) != order(1L) || order(1L) != order(2L))
    // determinism: a second evaluation reproduces the identical ordering
    val again = graft.queries.TextAnalysis.epochShuffle(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.sortBy(r => (r._1, r._2, r._4)).toSeq ==
      again.sortBy(r => (r._1, r._2, r._4)).toSeq)
  }

  test("q194 split never separates exact duplicates, bands near 80/10/10") {
    val dir = java.nio.file.Files.createTempDirectory("leakfree").toString
    // crafted exact-dup cluster spanning ids that a doc-id hash split
    // would scatter across folds
    val rows = (0L until 200L).map { i =>
      val text = if (i % 10 == 3) "THE duplicated text " else s"unique text $i"
      (i, text, "en", "s")
    }
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Dedup.leakFreeSplit(spark, dir)
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 200)
    // every cluster lands in exactly one fold — by construction
    for ((_, rs) <- out.groupBy(_._2))
      assert(rs.map(_._4).distinct.length == 1, rs.mkString(","))
    // the 20-member dup cluster is intact and counted
    val dup = out.filter(_._3 == 20L)
    assert(dup.length == 20 && dup.map(_._4).distinct.length == 1)
    // all three folds appear over the 181 clusters
    assert(out.map(_._4).distinct.toSet == Set("train", "val", "test"))
    // and on the sf table the same invariant holds
    val real = graft.queries.Dedup.leakFreeSplit(spark, TestSpark.sf)
      .as[(Long, Long, Long, String)].collect()
    for ((_, rs) <- real.groupBy(_._2))
      assert(rs.map(_._4).distinct.length == 1)
  }

  test("q190 decayed counts are exactly the rational power-of-two sum") {
    import org.apache.spark.sql.functions.{col, count, date_trunc, lit, max}
    val got = graft.queries.TimeSeries.decayedCounts(spark, TestSpark.sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    // independent recomputation in exact rational arithmetic: the engine
    // value must equal numerator / 2^20 EXACTLY — that is the point of
    // the power-of-two decay design
    val daily = graft.Tables(spark, TestSpark.sf, "events")
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Timestamp, Long)].collect()
    val dmax = daily.map(_._2.getTime).max
    for ((t, rs) <- daily.groupBy(_._1)) {
      val withAge = rs.map { case (_, d, n) =>
        (((dmax - d.getTime) / 86400000L), n) }.filter(_._1 <= 20)
      val num = withAge.map { case (age, n) => n * (1L << (20 - age.toInt)) }.sum
      val (_, nWin, decayed) = got(t)
      assert(nWin == withAge.map(_._2).sum, t)
      assert(decayed == num.toDouble / (1L << 20).toDouble, t)
    }
  }

  test("q181 k-center picks distinct spread centers with shrinking radius") {
    val rows = graft.queries.Similarity.kcenterCoreset(spark, TestSpark.sf)
      .orderBy(org.apache.spark.sql.functions.col("sel_order"))
      .collect()
    assert(rows.length == 8)
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == 8)
    // seed is the smallest vec_id
    val minId = graft.Tables(spark, TestSpark.sf, "embeddings")
      .agg(org.apache.spark.sql.functions.min("vec_id")).head().getLong(0)
    assert(ids.head == minId)
    assert(rows.head.isNullAt(2))
    // farthest-first: the selection radius is weakly decreasing
    val d2s = rows.tail.map(_.getLong(2))
    assert(d2s.forall(_ > 0))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b }, d2s.toSeq)
  }

  test("partition-spec tuple encoding round-trips hostile values (property)") {
    import graft.catalog.{BucketItem, DaysItem, IdentityItem, PartitionSpec}
    val hostile = Gen.oneOf(
      Gen.alphaNumStr.map(s => s.take(12)),
      Gen.oneOf("a|b", "x=y", "100%", "tab\there", "comma,sep", "",
        "__null__", "日本語", "a(b)c", "sp ace"))
    val items = Seq(IdentityItem("g"), DaysItem("ts"), BucketItem(8, "u"))
    (1L to 200L).foreach { seed =>
      val vals = (0 until 3).map(i =>
        hostile(Gen.Parameters.default, Seed(seed * 31 + i)).get)
      val enc = PartitionSpec.encode(items, vals)
      assert(PartitionSpec.decode(items, enc).contains(vals),
        s"roundtrip failed for $vals via '$enc'")
      // annotation embedding: a manifest line's tab-separated annots
      // must never be split by an encoded tuple
      assert(!enc.contains('\t') && !enc.contains('\n'), enc)
    }
    // spec-string parse/render round-trip, including nested commas
    val specs = Seq(
      Seq(IdentityItem("status")),
      Seq(DaysItem("ts")),
      Seq(BucketItem(16, "user_id")),
      Seq(IdentityItem("a"), DaysItem("b"), BucketItem(4, "c")))
    specs.foreach { s =>
      assert(PartitionSpec.parse(PartitionSpec.renderSpec(s)).contains(s))
    }
    // single-identity keeps the LEGACY raw rendering
    assert(PartitionSpec.encode(Seq(IdentityItem("g")), Seq("F")) == "F")
  }

  test("schema-evolution name resolution: rename chains resolve every epoch (property)") {
    import graft.sources.SchemaEvo
    import org.apache.spark.sql.types.{LongType, StructField}
    // build a rename chain a0 -> a1 -> ... -> a5 at versions 2,4,6,8,10
    var f = StructField("a0", LongType)
    val renames = (1 to 5).map(i => (2 * i, s"a$i"))
    renames.foreach { case (v, n) => f = SchemaEvo.renamed(f, n, v) }
    // at any sv, the resolved name is the one active at that version
    assert(SchemaEvo.nameAt(f, 0).contains("a0"))
    assert(SchemaEvo.nameAt(f, 1).contains("a0"))
    (1 to 5).foreach { i =>
      assert(SchemaEvo.nameAt(f, 2 * i).contains(s"a$i"),
        s"sv=${2 * i}: ${SchemaEvo.nameAt(f, 2 * i)}")
      assert(SchemaEvo.nameAt(f, 2 * i + 1).contains(s"a$i"))
    }
    assert(SchemaEvo.nameAt(f, 99).contains("a5"))
    // a field born at version 7 is ABSENT for files older than that
    val born = SchemaEvo.added(StructField("x", LongType), 7)
    assert(SchemaEvo.nameAt(born, 6).isEmpty)
    assert(SchemaEvo.nameAt(born, 7).contains("x"))
    // filter translation never invents references: untranslatable
    // conjuncts drop whole (conservative pushdown)
    import org.apache.spark.sql.sources.{And, EqualTo, GreaterThan}
    import org.apache.spark.sql.types.StructType
    val schema = StructType(Seq(f, born))
    val filters = Seq[org.apache.spark.sql.sources.Filter](
      EqualTo("a5", 1L), GreaterThan("x", 2L),
      And(EqualTo("a5", 3L), EqualTo("x", 4L)))
    val at6 = SchemaEvo.translateFilters(filters, schema, 6)
    // x doesn't exist at sv=6: its conjuncts drop, a5 resolves to a3
    assert(at6.contains(EqualTo("a3", 1L)), at6)
    assert(at6.contains(EqualTo("a3", 3L)), at6)
    assert(!at6.exists(_.references.contains("x")), at6)
    // NEGATIVE polarity: Not(And(a,b)) with an untranslatable conjunct
    // must drop WHOLE — Not(a) alone is strictly stronger and would drop
    // live rows as a reader-pushed filter
    import org.apache.spark.sql.sources.Not
    val negged = SchemaEvo.translateFilters(
      Seq(Not(And(EqualTo("a5", 3L), EqualTo("x", 4L)))), schema, 6)
    assert(negged.isEmpty, negged)
    // ... while a fully-translatable Not(And) still goes through
    val negOk = SchemaEvo.translateFilters(
      Seq(Not(And(EqualTo("a5", 3L), EqualTo("a5", 4L)))), schema, 6)
    assert(negOk == Seq(Not(And(EqualTo("a3", 3L), EqualTo("a3", 4L)))), negOk)
    // double negation restores positive polarity: partial drop allowed
    val dblNeg = SchemaEvo.translateFilters(
      Seq(Not(Not(And(EqualTo("a5", 3L), EqualTo("x", 4L))))), schema, 6)
    assert(dblNeg == Seq(Not(Not(EqualTo("a3", 3L)))), dblNeg)
  }

  test("PosBitmap: exact membership, round-trip, and compression (property)") {
    import graft.catalog.PosBitmap
    val shapes: Seq[Long => Seq[Long]] = Seq(
      // sparse scatter across many containers
      seed => (0 until 200).map(i => (seed * 31 + i * 7919) % 5000000L),
      // one dense clustered run (the row-level DML shape)
      seed => (0L until 9000L).map(_ + (seed % 100000L)),
      // container boundaries and duplicates
      seed => Seq(0L, 1L, 65535L, 65536L, 65537L, 131071L, 131072L,
        seed % 1000L, seed % 1000L),
      // dense-past-threshold container (bitmap encoding) + a sparse tail
      seed => (0L until 5000L).map(_ * 2 + (seed % 7L)) ++
        Seq(10000000L, 20000000L))
    (1L to 25L).foreach { seed =>
      shapes.foreach { shape =>
        val positions = shape(seed)
        val bm = PosBitmap.fromPositions(positions.toArray)
        val set = positions.toSet
        // membership exact on members, neighbors, and far misses
        set.foreach(p => assert(bm.contains(p), s"lost $p"))
        set.foreach { p =>
          assert(bm.contains(p - 1) == set.contains(p - 1))
          assert(bm.contains(p + 1) == set.contains(p + 1))
        }
        assert(!bm.contains(-1L))
        assert(!bm.contains(999999999999L))
        assert(bm.cardinality == set.size)
        // byte round-trip
        val back = PosBitmap.deserialize(bm.serialize)
        set.foreach(p => assert(back.contains(p)))
        assert(back.cardinality == set.size)
        assert(PosBitmap.positionsOf(back).toSeq == set.toSeq.sorted)
      }
    }
    // the compression claim: a clustered delete's payload is far below
    // the legacy 8 B/position
    val run = (0L until 100000L).toArray
    val bm = PosBitmap.fromPositions(run)
    assert(bm.serializedSize < run.length, // ≤1 byte/position here
      s"clustered run compressed to ${bm.serializedSize} B")
    // a foreign payload fails loudly, never misreads
    intercept[IllegalArgumentException] {
      PosBitmap.deserialize(Array.fill[Byte](64)(7))
    }
  }

  test("typed partition-literal rendering matches the write side (dates, timestamps)") {
    import graft.catalog.PartitionSpec
    // internal rendering: what IdentityItem.valueOf produced at write time
    val d = java.sql.Date.valueOf("2026-03-02")
    assert(PartitionSpec.internalOfLiteral(d)
      .map(String.valueOf(_)).contains(d.toLocalDate.toEpochDay.toString))
    assert(PartitionSpec.internalOfLiteral(java.time.LocalDate.of(2026, 3, 2))
      == PartitionSpec.internalOfLiteral(d))
    val t = java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456")
    val micros = PartitionSpec.internalOfLiteral(t).get
      .asInstanceOf[java.lang.Long].longValue
    assert(micros % 1000000L == 5123456L % 1000000L)
    assert(PartitionSpec.internalOfLiteral(
      t.toInstant).contains(Long.box(micros)))
    // bucketHash agreement: internal date value hashes as the epoch-day int
    val epochDay = d.toLocalDate.toEpochDay.toInt
    assert(PartitionSpec.bucketHash(
      PartitionSpec.internalOfLiteral(d).get) == epochDay)
    // unmodeled classes decline (callers skip the conjunct)
    assert(PartitionSpec.internalOfLiteral(new java.math.BigDecimal("1.5")).isEmpty)
    assert(PartitionSpec.internalOfLiteral(null).isEmpty)
    // structural characters reject at single-identity encode; multi-item
    // tuples URL-encode them away
    import graft.catalog.{BucketItem, IdentityItem}
    intercept[IllegalArgumentException] {
      PartitionSpec.encode(Seq(IdentityItem("g")), Seq("a\tb"))
    }
    val multi = Seq(IdentityItem("g"), BucketItem(4, "u"))
    val enc = PartitionSpec.encode(multi, Seq("a\tb", "2"))
    assert(!enc.contains('\t'))
    assert(PartitionSpec.decode(multi, enc).contains(Seq("a\tb", "2")))
  }
}
