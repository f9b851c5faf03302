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
    * pair is left (every word fused to a single symbol). */
  def train(spark: SparkSession, words: DataFrame, k: Int): Seq[(String, String)] = {
    import spark.implicits._
    var ds = words.select(col("w").cast("string"), col("freq").cast("long"))
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
