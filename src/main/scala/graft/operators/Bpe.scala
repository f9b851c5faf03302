package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer, trained and applied Spark-first.
  *
  * Training is the classic Sennrich et al. (ACL 2016) loop re-shaped for a
  * cluster: it runs over the WORD-FREQUENCY table, not the corpus — the
  * standard trick that makes BPE tractable at any scale, since a 100 TB
  * corpus still collapses to a words×counts table several orders of
  * magnitude smaller (and that aggregation is one shuffle). Each of the K
  * iterations is one distributed job: explode every word's adjacent symbol
  * pairs weighted by word frequency, aggregate, and take the single most
  * frequent pair (count desc, then lexicographic — deterministic under any
  * partitioning); only that ONE row is collected per iteration. The merge
  * is then applied distributed, with a `localCheckpoint` per iteration so
  * lineage stays O(1) deep instead of O(K).
  *
  * Encoding applies the learned ranked merges with the standard greedy
  * lowest-rank-first loop, driven by a BROADCAST rank table — per-row
  * imperative logic with no built-in equivalent, i.e. the documented
  * legitimate `mapPartitions` tier.
  *
  * Divergence from Sennrich: no end-of-word marker symbol (merges never
  * cross word boundaries here anyway, and its absence keeps
  * `decode == concat(tokens)` exact, which the corpus-level round-trip
  * gate exploits). Pair counting is over ALL adjacent positions (so "aaa"
  * counts (a,a) twice) while merging is left-to-right non-overlapping —
  * both exactly as in the reference implementation of the paper.
  */
object Bpe {

  /** Left-to-right non-overlapping merge of adjacent pair (a,b) — the SAME
    * routine is used by training and encoding, so the two cannot drift. */
  private[operators] def mergePair(
      syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Learn `k` merges from a `(w, freq)` word-frequency DataFrame. Returns
    * the ranked merge list (rank = position). Stops early if no adjacent
    * pair is left (every word fused to a single symbol).
    *
    * The physical strategy is SIZE-GATED at call time, the q127 adjacency
    * pattern: the word-frequency table is already the corpus collapsed by
    * orders of magnitude, and when it additionally fits a driver budget
    * (`graft.bpe.localTrainBytes`, default 64 MB; one exact
    * count+bytes job decides) the K-iteration loop runs DRIVER-LOCAL over
    * the collected vocabulary — the 2 jobs/iteration (top-pair collect +
    * merge checkpoint) of the distributed loop collapse to one collect
    * total. Past the budget the distributed loop runs unchanged. Both
    * paths share [[mergePair]] and the (count desc, lexicographic asc)
    * tie-break, so the learned merges are IDENTICAL — `BpeSpec` executes
    * both against the same vocabulary. `graft.bpe.trainImpl` =
    * auto|local|distributed pins a path (tests; operators who know their
    * vocabulary). */
  def train(spark: SparkSession, words: DataFrame, k: Int): Seq[(String, String)] = {
    val src = words.select(col("w").cast("string"), col("freq").cast("long"))
    val impl = spark.conf.get("graft.bpe.trainImpl", "auto")
    val useLocal = impl match {
      case "local"       => true
      case "distributed" => false
      case "auto" =>
        val budget = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          spark.conf.get("graft.bpe.localTrainBytes", "64m"))
        // exact sizing: one row per word at ~(2 chars-as-strings + row)
        // overhead — 64 B/row + 2 B/char stays above the true collected
        // footprint's growth rate while letting any real vocabulary in
        val r = src.agg(count(lit(1)), sum(length(col("w")))).head()
        val (n, chars) = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
        n * 64L + chars * 2L <= budget
      case other => throw new IllegalArgumentException(
        s"graft.bpe.trainImpl must be auto, local, or distributed; got '$other'")
    }
    if (useLocal) trainLocal(src.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq, k)
    else trainDistributed(spark, src, k)
  }

  /** Driver-local edition of the merge loop — byte-identical merges to
    * [[trainDistributed]] (same pair counting over all adjacent
    * positions, same mergePair, same tie-break). */
  private[operators] def trainLocal(words: Seq[(String, Long)],
      k: Int): Seq[(String, String)] = {
    var syms: Array[(Array[String], Long)] = words
      .map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < k && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      syms.foreach { case (s, f) =>
        var i = 0
        while (i < s.length - 1) {
          counts.merge((s(i), s(i + 1)), f, java.lang.Long.sum)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && (p._1 < best._1._1 ||
                (p._1 == best._1._1 && p._2 < best._1._2))))
            best = (p, c)
        }
        val (a, b) = best._1
        merges += ((a, b))
        syms = syms.map { case (s, f) => (mergePair(s, a, b).toArray, f) }
      }
      iter += 1
    }
    merges.result()
  }

  private def trainDistributed(spark: SparkSession, words: DataFrame,
      k: Int): Seq[(String, String)] = {
    import spark.implicits._
    var ds = words
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < k && !exhausted) {
      val top = ds.flatMap { case (syms, f) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), f))
        }
        .toDF("a", "b", "f")
        .groupBy(col("a"), col("b")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect() // exactly one row per iteration — planning-scale
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val prev = ds
        ds = ds.map { case (syms, f) => (mergePair(syms, a, b), f) }
          .localCheckpoint()
        prev.unpersist()
      }
      iter += 1
    }
    ds.unpersist()
    merges.result()
  }

  /** Persist a trained merge list as a tiny parquet table `(rank, a, b)` —
    * the saved-tokenizer artifact a production pipeline trains once and
    * ships to every consumer (the in-session analogue is the memoized
    * merge table in `TextAnalysis`). */
  def save(spark: SparkSession, merges: Seq[(String, String)],
      path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[save]]d merge list, rank order restored. */
  def load(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .select(col("rank").cast("int"), col("a"), col("b"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Greedy encode: repeatedly merge the present pair with the LOWEST rank
    * until none of the learned merges applies. */
  def encode(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else {
        syms = mergePair(syms, bestPair._1, bestPair._2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }
}
