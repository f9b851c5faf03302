package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over `documents`: language-ID heuristic, quality scoring,
  * token statistics, document fingerprinting. All single-pass, codegen'd
  * column expressions — per-document work is embarrassingly parallel and
  * the only shuffles are the final small aggregations, so the shape is
  * scan-bound at any scale.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "to", "is", "in", "it")
  private def inList(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString(", ")

  /** Stopword-ratio language ID: >= 4% English function words -> 'en'.
    * (A real pipeline would score n-gram profiles per language; the engine
    * shape — tokenized ratio scoring in one pass — is the same.) */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"),
        (expr(s"size(filter(w, x -> x IN (${inList(stopwords)})))").cast("double") /
          size(col("w"))).as("en_ratio"))
      .withColumn("pred_lang", when(col("en_ratio") >= 0.04, "en").otherwise("und"))

  private val langIdSql =
    s"""SELECT doc_id, lang,
       |  CAST(len(list_filter(w, x -> x IN (${inList(stopwords)}))) AS DOUBLE)
       |    / len(w) AS en_ratio,
       |  CASE WHEN CAST(len(list_filter(w, x -> x IN (${inList(stopwords)}))) AS DOUBLE)
       |    / len(w) >= 0.04 THEN 'en' ELSE 'und' END AS pred_lang
       |FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)""".stripMargin

  /** Quality scoring: token count, average token length, alpha ratio, and a
    * keep/drop flag — the standard pre-training filter features. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text"))).as("alpha_ratio"))
      .withColumn("avg_token_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("keep",
        col("n_tokens") >= 20 && col("n_tokens") <= 200 && col("alpha_ratio") >= 0.7)

  private val qualitySql =
    """SELECT doc_id, n_tokens, n_chars, alpha_ratio,
      |  CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
      |  n_tokens >= 20 AND n_tokens <= 200 AND alpha_ratio >= 0.7 AS keep
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
      |      / length(text) AS alpha_ratio
      |  FROM documents) t""".stripMargin

  /** Corpus token statistics per (lang, source): total/distinct tokens and
    * tokens-per-document — partial agg over the tokenized scan. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("total_tokens"),
        countDistinct(col("t")).as("distinct_tokens"),
        (count(lit(1)).cast("double") / countDistinct(col("doc_id"))).as("tokens_per_doc"))

  private val tokenStatsSql =
    """SELECT lang, source, count(*) AS total_tokens,
      |  count(DISTINCT t) AS distinct_tokens,
      |  CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id) AS tokens_per_doc
      |FROM (SELECT lang, source, doc_id, unnest(string_split(text, ' ')) AS t
      |      FROM documents) x
      |WHERE t <> ''
      |GROUP BY lang, source""".stripMargin

  /** Content-defined fingerprint: md5 over the sorted distinct token set —
    * robust to token order, the standard bag-of-words dedup key. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        array_sort(array_distinct(split(lower(col("text")), " "))).as("toks"))
      .select(col("doc_id"),
        md5(array_join(col("toks"), " ")).as("fp"),
        size(col("toks")).cast("long").as("vocab"))

  private val fingerprintSql =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp,
      |  CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS vocab
      |FROM documents""".stripMargin

  // ---- q74: rolling-hash fingerprint --------------------------------------

  private val P = 2147483647L // 2^31 - 1
  private val B = 131L
  private val W = 8 // window size in tokens

  /** c(j) = B^(W-1-j) mod P — the Rabin-Karp coefficient of window slot j.
    * With the polynomial expanded per-window, the hash is a plain sum of
    * (coef * tokenHash) % P terms — identical integer math in both engines,
    * every intermediate < 2^62 (no overflow on checked BIGINT). */
  private val coef: Seq[Long] =
    (0 until W).map(j => (0 until (W - 1 - j)).foldLeft(1L)((a, _) => a * B % P))

  /** Winnowing-style fingerprint: min Rabin-Karp hash over all 8-token
    * windows. Token hashes are computed once per token (single md5 pass),
    * then each window is a constant-coefficient dot product — the
    * declarative form of a rolling hash (O(tokens × W) integer ops, no
    * re-hashing per window). */
  def rollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val hashTok = s"cast(conv(substring(md5(x), 1, 15), 16, 10) AS bigint) % ${P}L"
    val terms = coef.zipWithIndex
      .map { case (c, j) => s"${c}L * hw[i + $j] % ${P}L" }.mkString(" + ")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= W)
      .withColumn("hw", expr(s"transform(w, x -> $hashTok)"))
      .withColumn("fps",
        expr(s"transform(sequence(0, size(hw) - $W), i -> ($terms) % ${P}L)"))
      .select(col("doc_id"), array_min(col("fps")).as("fp"),
        size(col("fps")).cast("long").as("n_windows"))
  }

  private val rollingFingerprintSql = {
    val terms = coef.zipWithIndex
      .map { case (c, j) => s"$c * hw[i + $j] % $P" }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    list_transform(w, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $P) AS hw
       |  FROM t WHERE len(w) >= $W)
       |SELECT doc_id,
       |  list_min(list_transform(range(1, len(hw) - ${W - 2}),
       |    i -> ($terms) % $P)) AS fp,
       |  CAST(len(hw) - ${W - 1} AS BIGINT) AS n_windows
       |FROM f""".stripMargin
  }

  // ---- q75: BPE-ish regex tokenization ------------------------------------

  private val tokPat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Regex tokenization (alpha runs / digit runs / single punctuation — the
    * pre-BPE splitting shape) with per-class counts, one codegen'd pass. */
  def regexTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr(s"regexp_extract_all(text, '$tokPat', 0)").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("size(filter(toks, t -> t rlike '^[A-Za-z]'))").cast("long").as("n_alpha"),
        expr("size(filter(toks, t -> t rlike '^[0-9]'))").cast("long").as("n_num"))
      .withColumn("n_punct", col("n_tokens") - col("n_alpha") - col("n_num"))

  private val regexTokensSql =
    s"""SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(toks, t -> regexp_matches(t, '^[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |  CAST(len(list_filter(toks, t -> regexp_matches(t, '^[0-9]'))) AS BIGINT) AS n_num,
       |  CAST(len(toks) - len(list_filter(toks, t -> regexp_matches(t, '^[A-Za-z]')))
       |    - len(list_filter(toks, t -> regexp_matches(t, '^[0-9]'))) AS BIGINT) AS n_punct
       |FROM (SELECT doc_id, regexp_extract_all(text, '$tokPat') AS toks FROM documents) t""".stripMargin

  /** Edit-distance near-dup pairs over part names, blocked by brand:
    * `levenshtein` is O(len²) per pair, so the block key (brand) bounds the
    * pair space — the same blocked-self-join shape as q54; at 100 TB the
    * block key is the shuffle key and each block's pairs stay
    * partition-local. */
  def editDistance(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    // dist <= 3 implies |len(a) - len(b)| <= 3, so the cheap length band
    // runs first and the banded levenshtein (threshold arg -> O(len·k) not
    // O(len²), early-exit -1 above k) only touches surviving pairs.
    // The probe side is repartitioned before the pair explosion: the input
    // is a single small file (one scan partition), but the join output is
    // |block|² rows — without this the whole pair loop runs on one core
    // while the build side is broadcast.
    val fanned = p.repartition(spark.sparkContext.defaultParallelism)
    fanned.as("a").join(broadcast(p).as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey") &&
          abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 3)
      .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
        levenshtein(col("a.p_name"), col("b.p_name"), 3).cast("long").as("dist"))
      .where(col("dist").between(0, 3))
  }

  private val editDistanceSql =
    """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
      |  levenshtein(a.p_name, b.p_name) AS dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin

  /** Source mixing: per-source sampling rates (upsample-free downmix) via
    * the deterministic doc-id hash — the data-mixing step of a training
    * pipeline ("keep 1/2 of even sources, 1/5 of odd"). The rate predicate
    * evaluates in the scan, so remixing the corpus costs one pass and no
    * shuffle, and the same seedless recipe reproduces the exact corpus on
    * any cluster shape. */
  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % 1000
    Tables(spark, dir, "documents")
      .withColumn("rate",
        when(regexp_extract(col("source"), "([0-9]+)", 1).cast("long") % 2 === 0,
          lit(500L)).otherwise(lit(200L)))
      .where(h < col("rate"))
      .select(col("doc_id"), col("source"), col("rate"))
  }

  private val sourceMixSql =
    """SELECT doc_id, source, rate FROM (
      |  SELECT doc_id, source,
      |    CASE WHEN CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 2 = 0
      |      THEN 500 ELSE 200 END AS rate
      |  FROM documents) t
      |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000 < rate""".stripMargin

  /** Token-budget corpus selection: per language, take documents in
    * quality order (longest first, id tiebreak) until a 5000-token budget
    * is filled — the greedy knapsack every data-curation pipeline runs.
    * One window pass: running token sum per language, keep while the
    * PREVIOUS cumulative total is under budget (so the first overflowing
    * doc is included, matching the greedy rule). */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .where(col("cum") - col("n_tokens") < 5000)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum"))
  }

  private val tokenBudgetSql =
    """SELECT doc_id, lang, n_tokens, cum FROM (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY n_tokens DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM (SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |    FROM documents) x) t
      |WHERE cum - n_tokens < 5000""".stripMargin

  /** q128: data-mixing resample — rebalance the corpus toward a uniform
    * per-source token budget (the "temperature sampling" step every
    * LLM-pretraining mix runs, here at temperature → uniform). Each
    * source's keep-rate is `min(1, target/actual)` in exact ppm integers;
    * membership is the deterministic md5 threshold (no RNG, reproducible
    * across engines/runs/partitionings). Plan shape: one partial+final agg
    * for per-source totals (∣sources∣ rows), the rate table broadcast back
    * onto the scan, one final per-source agg — the corpus shuffles only
    * into |sources| groups, never by doc. */
  def mixResample(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("t"))
    val src = tok.groupBy(col("source")).agg(sum(col("t")).as("actual"))
    val tot = src.agg(sum(col("actual")).as("total"),
      count(lit(1)).as("ns"))
    val rates = src.crossJoin(broadcast(tot))
      .select(col("source"), col("actual"),
        expr("total div ns").as("target"),
        least(lit(1000000L), expr("(total div ns) * 1000000 div actual"))
          .as("rate_ppm"))
    val kept = tok
      .join(broadcast(rates.select(col("source"), col("rate_ppm"))), Seq("source"))
      .where(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000000L < col("rate_ppm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kd"), sum(col("t")).as("kt"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("rate_ppm").cast("long").as("rate_ppm"),
        col("target").cast("long").as("target_tokens"),
        col("actual").as("actual_tokens"),
        coalesce(col("kd"), lit(0L)).as("kept_docs"),
        coalesce(col("kt"), lit(0L)).as("kept_tokens"))
  }

  private val mixResampleSql =
    """WITH tok AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t
      |  FROM documents),
      |src AS (SELECT source, sum(t) AS actual FROM tok GROUP BY 1),
      |tot AS (SELECT sum(actual) AS total, count(*) AS ns FROM src),
      |rates AS (
      |  SELECT source, actual, total // ns AS target,
      |    least(1000000, (total // ns) * 1000000 // actual) AS rate_ppm
      |  FROM src CROSS JOIN tot),
      |kept AS (
      |  SELECT d.source, count(*) AS kd, sum(d.t) AS kt
      |  FROM tok d JOIN rates r ON d.source = r.source
      |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
      |    % 1000000 < r.rate_ppm
      |  GROUP BY 1)
      |SELECT r.source, CAST(r.rate_ppm AS BIGINT) AS rate_ppm,
      |  CAST(r.target AS BIGINT) AS target_tokens,
      |  CAST(r.actual AS BIGINT) AS actual_tokens,
      |  CAST(coalesce(k.kd, 0) AS BIGINT) AS kept_docs,
      |  CAST(coalesce(k.kt, 0) AS BIGINT) AS kept_tokens
      |FROM rates r LEFT JOIN kept k ON r.source = k.source""".stripMargin

  /** q134: equi-depth histogram construction — per-source deciles of
    * document length (the statistics a cost-based optimizer's ANALYZE
    * collects, and the length-distribution audit every corpus report
    * shows). `ntile` over a deterministic total order (n_chars, doc_id —
    * the tiebreak makes bucket assignment partition-invariant), then one
    * small aggregate per (source, decile): bucket count and value bounds.
    * One shuffle on the partition key; the aggregate rides the window's
    * sort. */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
  }

  private val lengthHistogramSql =
    """SELECT source, decile, count(*) AS n,
      |  min(n_chars) AS lo, max(n_chars) AS hi
      |FROM (
      |  SELECT source, n_chars,
      |    CAST(ntile(10) OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS decile
      |  FROM documents) t
      |GROUP BY source, decile""".stripMargin

  /** Canonical text normalization — the step that runs before any hash:
    * lowercase, strip non-alphanumerics to spaces, collapse whitespace,
    * trim; emits the canonical md5 so downstream exact-dedup keys are
    * punctuation/case/spacing-insensitive. Single-pass codegen'd regexes. */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("canon"))
      .select(col("doc_id"), md5(col("canon")).as("canon_fp"),
        length(col("canon")).cast("long").as("canon_len"))

  private val normalizeSql =
    """SELECT doc_id, md5(canon) AS canon_fp,
      |  CAST(length(canon) AS BIGINT) AS canon_len
      |FROM (SELECT doc_id,
      |  trim(regexp_replace(
      |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |    ' +', ' ', 'g')) AS canon
      |  FROM documents) t""".stripMargin

  /** q126: collocation mining — bigrams whose corpus frequency exceeds what
    * their parts predict (integer-scaled lift, the PMI workhorse for phrase
    * detection in tokenizer training). Adjacency is built scan-locally with
    * higher-order functions (`transform` over index `sequence`) — no
    * per-token shuffle, no window over a doc_id partition; the only
    * shuffles are the two map-side-combined vocabulary-sized counts and the
    * token-keyed joins of the thresholded (tiny) bigram side against them.
    * Lift stays in exact integers (`cnt12·N·1000 div cnt1·cnt2`; ≤1e16 at
    * sf1, no overflow, identical floor division in both engines) so the
    * query is hash-gated — no IEEE log/division ever computed. */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val tot = uni.agg(sum(col("cnt")).as("n"))
    val bg = toks.where(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"""
          .stripMargin)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt12"))
      .where(col("cnt12") >= 5)
    bg.join(uni.select(col("w").as("w1"), col("cnt").as("cnt1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cnt").as("cnt2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("cnt12"), col("cnt1"), col("cnt2"),
        expr("(cnt12 * n * 1000) div (cnt1 * cnt2)").cast("long").as("lift_k"))
  }

  private val collocationsSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t,
      |    unnest(range(1, len(list_filter(string_split(text, ' '), t -> t <> '')) + 1)) AS ord
      |  FROM documents),
      |bg AS (
      |  SELECT t AS w1, lead(t) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
      |  FROM toks),
      |b12 AS (
      |  SELECT w1, w2, count(*) AS cnt12 FROM bg WHERE w2 IS NOT NULL
      |  GROUP BY 1, 2),
      |uni AS (SELECT t AS w, count(*) AS cnt FROM toks GROUP BY 1),
      |tot AS (SELECT count(*) AS n FROM toks)
      |SELECT b.w1, b.w2, b.cnt12, u1.cnt AS cnt1, u2.cnt AS cnt2,
      |  CAST((b.cnt12 * t.n * 1000) // (u1.cnt * u2.cnt) AS BIGINT) AS lift_k
      |FROM b12 b JOIN uni u1 ON b.w1 = u1.w JOIN uni u2 ON b.w2 = u2.w
      |CROSS JOIN tot t
      |WHERE b.cnt12 >= 5""".stripMargin

  /** Per-language top-5 vocabulary: exact heavy hitters via partial-agg
    * count + per-group top-k (row_number + filter — only k rows per group
    * survive the rank shuffle; the token count agg is map-side combined). */
  def topTokens(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("lang"), col("t")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("t").asc)
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 5)
  }

  private val topTokensSql =
    """SELECT lang, t, cnt, rk FROM (
      |  SELECT lang, t, cnt, row_number() OVER (
      |    PARTITION BY lang ORDER BY cnt DESC, t) AS rk
      |  FROM (
      |    SELECT lang, t, count(*) AS cnt FROM (
      |      SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents) x
      |    WHERE t <> '' GROUP BY lang, t) c) r
      |WHERE rk <= 5""".stripMargin

  // ---- q85/q86: content filtering / PII redaction -------------------------

  /** Redaction patterns — deliberately restricted to syntax with identical
    * semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
    * bounded/unbounded repetition, no backreferences or lookaround. The
    * phone pattern requires a leading '+' so the three categories are
    * disjoint (a 9+ digit account number is a digit-run, not a phone). */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+[0-9][0-9 ()-]{6,}[0-9]"
  private val digitRe = "[0-9]{9,}"

  /** Generic content-filter operator: counts each PII category in `textCol`
    * and appends the redacted text. Pure codegen'd regexp column ops — the
    * scrub pass is scan-bound, no shuffle, which is the only acceptable
    * cost for a pass every training-data pipeline runs over the full
    * corpus. Patterns are passed as Column literals (not SQL string
    * literals) so no escape-processing layer rewrites them. */
  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(emailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(phoneRe)).cast("long"))
      .withColumn("n_digit_runs", regexp_count(col(textCol), lit(digitRe)).cast("long"))
      .withColumn("clean",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), lit(emailRe), lit("<EMAIL>")),
            lit(phoneRe), lit("<PHONE>")),
          lit(digitRe), lit("<NUM>")))

  /** The corpus text carries no digits at all (synthetic word salad), so a
    * scrub over raw `documents` would be vacuously green. The registered
    * query instead derives a PII-bearing column deterministically from
    * doc_id — an email for ids % 3, a phone for % 5, a 9-digit account
    * number for % 7 (first match wins) — mirrored exactly in the oracle, so
    * hit counts are non-trivial and value-pinned. */
  /** All three consumers chain regex-heavy scrubbing onto this scan, so
    * rebalance the unsplittable single-file input across cores first
    * (guide §2.5 via [[Tables.spread]]; no-op on multi-split inputs). */
  private def withPii(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, dir, "documents", Tables(spark, dir, "documents"))
      .withColumn("raw",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com")))
        .when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" call +1 555 "),
            (col("doc_id") % 9000 + 1000).cast("string")))
        .when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" acct "),
            (col("doc_id") + 100000000L).cast("string")))
        .otherwise(col("text")))

  private val withPiiSql =
    """SELECT *,
      |  CASE WHEN doc_id % 3 = 0
      |    THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |  WHEN doc_id % 5 = 0
      |    THEN text || ' call +1 555 ' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
      |  WHEN doc_id % 7 = 0
      |    THEN text || ' acct ' || CAST(doc_id + 100000000 AS VARCHAR)
      |  ELSE text END AS raw
      |FROM documents""".stripMargin

  /** Per-document scrub: category counts (value-pinned by the oracle's own
    * regexp counts), the redacted text itself, and `residual` — the number
    * of PII matches REMAINING in the redacted text, which Spark computes
    * for real and the oracle pins to literal 0: if the scrub ever leaks a
    * pattern, the gate hash-fails. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val scrubbed = scrubPii(withPii(spark, dir), "raw")
    scrubbed.select(col("doc_id"), col("source"),
      col("n_emails"), col("n_phones"), col("n_digit_runs"), col("clean"),
      (regexp_count(col("clean"), lit(emailRe)) +
        regexp_count(col("clean"), lit(phoneRe)) +
        regexp_count(col("clean"), lit(digitRe))).cast("long").as("residual"))
  }

  private val piiScrubSql =
    s"""WITH r AS ($withPiiSql)
       |SELECT doc_id, source,
       |  CAST(len(regexp_extract_all(raw, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(raw, '$phoneRe')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(raw, '$digitRe')) AS BIGINT) AS n_digit_runs,
       |  regexp_replace(regexp_replace(regexp_replace(raw,
       |    '$emailRe', '<EMAIL>', 'g'),
       |    '$phoneRe', '<PHONE>', 'g'),
       |    '$digitRe', '<NUM>', 'g') AS clean,
       |  CAST(0 AS BIGINT) AS residual
       |FROM r""".stripMargin

  /** Per-source PII hit-rate stats — the monitoring output a scrub pass
    * ships to its pipeline dashboard: document counts, per-category totals,
    * and the fraction of documents carrying any PII. One partial-agg
    * shuffle over ~|sources| groups. */
  def piiStats(spark: SparkSession, dir: String): DataFrame =
    scrubPii(withPii(spark, dir), "raw")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_emails") + col("n_phones") + col("n_digit_runs") > 0)
          .cast("long")).as("pii_docs"),
        sum(col("n_emails")).as("total_emails"),
        sum(col("n_phones")).as("total_phones"),
        sum(col("n_digit_runs")).as("total_digit_runs"))
      .withColumn("hit_rate",
        col("pii_docs").cast("double") / col("n_docs"))

  private val piiStatsSql =
    s"""WITH r AS ($withPiiSql),
       |c AS (
       |  SELECT source,
       |    len(regexp_extract_all(raw, '$emailRe')) AS n_emails,
       |    len(regexp_extract_all(raw, '$phoneRe')) AS n_phones,
       |    len(regexp_extract_all(raw, '$digitRe')) AS n_digit_runs
       |  FROM r)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN n_emails + n_phones + n_digit_runs > 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
       |  CAST(sum(n_emails) AS BIGINT) AS total_emails,
       |  CAST(sum(n_phones) AS BIGINT) AS total_phones,
       |  CAST(sum(n_digit_runs) AS BIGINT) AS total_digit_runs,
       |  CAST(sum(CASE WHEN n_emails + n_phones + n_digit_runs > 0
       |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS hit_rate
       |FROM c GROUP BY source""".stripMargin

  // ---- q87: sequence packing ----------------------------------------------

  private val packBudget = 512L

  /** Sequence packing — the concat-and-chunk dataloader step: documents are
    * laid end-to-end in deterministic (lang, doc_id) order and cut into
    * fixed `packBudget`-token training sequences. One window cumsum gives
    * every document its global start offset; pack id / offset-in-pack /
    * straddle flag are integer arithmetic on that offset. At 100 TB the
    * only shuffle is the window's partition-by-lang sort — the same cost
    * profile as q59's budget selection — and a real pipeline would swap the
    * lang partition key for a (lang, shard) composite to bound per-window
    * data; the per-document math is unchanged. */
  def seqPacking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("start_off"),
        expr(s"start_off div $packBudget").as("pack_id"),
        (col("start_off") % packBudget).as("off_in_pack"),
        (col("start_off") % packBudget + col("n_tokens") > packBudget)
          .as("straddles"))
  }

  private val seqPackingSql =
    s"""SELECT doc_id, lang, n_tokens, start_off,
       |  start_off // $packBudget AS pack_id,
       |  start_off % $packBudget AS off_in_pack,
       |  start_off % $packBudget + n_tokens > $packBudget AS straddles
       |FROM (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - n_tokens AS BIGINT) AS start_off
       |  FROM (SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |    FROM documents) x) t""".stripMargin

  // ---- q88: repetition-based quality (Gopher-style) -----------------------

  /** Max multiplicity of an array's elements as a SORT + RUN-LENGTH fold:
    * O(n log n) per document where the naive
    * `array_max(transform(array_distinct(a), d -> size(filter(a, d))))`
    * is O(n·distinct) ≈ O(n²) — on long documents that quadratic WAS the
    * corpus-scan bottleneck (2.5× DuckDB, measured; the fold closed it).
    * Produces the identical integer, so the hash-gated fractions are
    * unchanged. */
  private def maxRunLen(arr: String): String =
    s"""aggregate(array_sort($arr),
       |  named_struct('prev', CAST(NULL AS STRING),
       |    'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
       |  (s, x) -> named_struct('prev', x,
       |    'run', IF(x <=> s.prev, s.run + 1, CAST(1 AS BIGINT)),
       |    'best', GREATEST(s.best,
       |      IF(x <=> s.prev, s.run + 1, CAST(1 AS BIGINT)))),
       |  s -> s.best)""".stripMargin

  /** Repetition filters from the Gopher/C4 rule family: duplicate-token
    * fraction, most-frequent-token fraction, most-frequent-bigram fraction,
    * and the keep flag combining them. All computed as higher-order array
    * functions on the tokenized document — per-doc cost is O(len·log len)
    * via [[maxRunLen]], and the whole pass runs with zero shuffle, which
    * is what lets it run over the full corpus. */
  def repetitionQuality(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      // >= 2 tokens: below that the bigram sequence is empty (and Spark's
      // sequence(0, -1) would run DESCENDING, not empty) — single-token
      // docs carry no repetition signal anyway.
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
          size(col("toks"))).as("dup_token_frac"),
        (expr(maxRunLen("toks"))
          .cast("double") / size(col("toks"))).as("top_token_frac"),
        expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))")
          .as("bigrams"))
      .withColumn("top_bigram_frac",
        expr(maxRunLen("bigrams"))
          .cast("double") / size(col("bigrams")))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        col("top_token_frac"), col("top_bigram_frac"),
        (col("dup_token_frac") <= 0.6 && col("top_token_frac") <= 0.2 &&
          col("top_bigram_frac") <= 0.1).as("keep"))

  private val repetitionQualitySql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents
      |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 2),
      |m AS (
      |  SELECT doc_id, toks,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_token_frac,
      |    CAST(list_max(list_transform(list_distinct(toks),
      |      d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
      |      / len(toks) AS top_token_frac,
      |    list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      |  FROM t)
      |SELECT doc_id, n_tokens, dup_token_frac, top_token_frac,
      |  CAST(list_max(list_transform(list_distinct(bigrams),
      |    d -> len(list_filter(bigrams, x -> x = d)))) AS DOUBLE)
      |    / len(bigrams) AS top_bigram_frac,
      |  dup_token_frac <= 0.6 AND top_token_frac <= 0.2
      |    AND CAST(list_max(list_transform(list_distinct(bigrams),
      |      d -> len(list_filter(bigrams, x -> x = d)))) AS DOUBLE)
      |      / len(bigrams) <= 0.1 AS keep
      |FROM m""".stripMargin

  // ---- q68: heavy-hitter tokens via the Misra-Gries sketch ----------------

  private val hhSupport = 0.005

  /** Corpus heavy hitters through Spark's `stat.freqItems` (Misra-Gries /
    * Karp): a fixed-size sketch — at most 1/support counters per partition,
    * merged on the driver — instead of the full token-count shuffle, the
    * scale path for "which tokens dominate a 100 TB corpus". The sketch's
    * guarantee is one-sided (every item above the support threshold IS in
    * the candidate set; false positives possible), so the gate emits the
    * EXACT heavy hitters (integer comparison cnt*200 > n — no float
    * threshold the two engines could round differently) with `in_sketch`
    * asserting containment and `sketch_bounded` the 1/support size bound;
    * the oracle recomputes the exact set and pins both booleans TRUE. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
    val sketch = toks.stat.freqItems(Seq("t"), hhSupport)
      .head().getSeq[String](0)
    val totals = toks.agg(count(lit(1)).as("n"))
    toks.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals))
      .where(col("cnt") * 200 > col("n")) // 0.005 = 1/200, exact in integers
      .select(col("t"), col("cnt"),
        col("t").isin(sketch: _*).as("in_sketch"),
        lit(sketch.size <= math.round(1.0 / hhSupport)).as("sketch_bounded"))
  }

  private val heavyHittersSql =
    """WITH tt AS (
      |  SELECT t FROM (
      |    SELECT unnest(string_split(text, ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |n AS (SELECT count(*) AS n FROM tt)
      |SELECT t, CAST(count(*) AS BIGINT) AS cnt,
      |  TRUE AS in_sketch, TRUE AS sketch_bounded
      |FROM tt, n GROUP BY t, n.n HAVING count(*) * 200 > n.n""".stripMargin

  // ---- q195: count-min sketch frequencies ---------------------------------

  private val cmsDepth = 4
  private val cmsWidth = 512

  /** q195: count-min sketch word frequencies — the FREQUENCY sketch
    * completing the sketch family (HLL cardinality, quantile rank, bloom
    * membership, freqItems support). The corpus tokenizes ONCE into the
    * word-count table; the native mergeable [[graft.functions.CmsAgg]]
    * folds it into a fixed 4×512 counter matrix (map-side partials, one
    * matrix per partition over the wire — corpus- and vocabulary-size
    * independent), and the top-20 exact words probe the matrix with the
    * engine's shared md5 hash family evaluated in pure codegen'd SQL.
    * Both consumers (sketch, top-k) read the SAME word-count exchange
    * (`ReusedExchange` — the single-pass discipline of SCALE.md), and the
    * 1-row matrix attaches by the broadcast scalar-attach idiom.
    *
    * Grading: because h_i(w) is the cross-engine md5 family, the oracle
    * REBUILDS the exact counter matrix by grouping on (row, cell) and
    * hash-grades the estimates themselves — CMS's `min_i counter[h_i(w)]`
    * is deterministic integer arithmetic, not a bounded approximation, so
    * no tolerance gate is needed; `no_undercount` pins the sketch's
    * one-sided-error contract on every graded row. */
  def cmsFrequencies(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.registerCms(spark)
    val wc = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    val matrix = wc.agg(expr(s"cms_agg(t, cnt, $cmsDepth, $cmsWidth)").as("m"))
    val est = (0 until cmsDepth).map { i =>
      s"element_at(m, CAST(CAST(conv(substring(md5(concat('$i:', t)), 1, 15), 16, 10) AS BIGINT) % $cmsWidth AS INT) + ${i * cmsWidth + 1})"
    }.mkString("least(", ", ", ")")
    wc.orderBy(col("cnt").desc, col("t")).limit(20)
      .crossJoin(broadcast(matrix))
      .select(col("t"), col("cnt"), expr(est).as("est"),
        (expr(est) >= col("cnt")).as("no_undercount"))
  }

  private[graft] val cmsFrequenciesSql =
    """WITH wc AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS t FROM documents) x
      |  WHERE t <> '' GROUP BY t),
      |r AS (SELECT unnest(range(0, 4)) AS i),
      |cells AS (
      |  SELECT i,
      |    (('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || t), 1, 15))::BIGINT % 512) AS cell,
      |    CAST(sum(cnt) AS BIGINT) AS s
      |  FROM wc, r GROUP BY 1, 2),
      |top AS (SELECT t, cnt FROM wc ORDER BY cnt DESC, t LIMIT 20),
      |probes AS (
      |  SELECT t, cnt, i,
      |    (('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || t), 1, 15))::BIGINT % 512) AS cell
      |  FROM top, r)
      |SELECT p.t, p.cnt, CAST(min(c.s) AS BIGINT) AS est,
      |  CAST(min(c.s) AS BIGINT) >= p.cnt AS no_undercount
      |FROM probes p JOIN cells c ON c.i = p.i AND c.cell = p.cell
      |GROUP BY p.t, p.cnt""".stripMargin

  // ---- q282: join-cardinality estimation via CMS inner product ------------

  /** q282: pre-join SIZE ESTIMATION — the optimizer-statistics primitive:
    * predict |events ⋈ orders ON user_id = o_custkey| WITHOUT running
    * the join, from one CMS per side over per-key multiplicities. The
    * inner product of two count sketches row-wise —
    * min_i Σ_j A[i][j]·B[i][j] — estimates Σ_k cnt_A(k)·cnt_B(k) (the
    * true equi-join cardinality) with ONE-SIDED error: hash collisions
    * only ADD non-negative cross terms, so the estimate never
    * undercounts (Cormode & Muthukrishnan 2005 §4.2, the F2/join-size
    * application). That is what an optimizer needs to pick broadcast vs
    * shuffle or detect a skew blow-up BEFORE paying for the join: two
    * d×w matrices meet, never the tables.
    *
    * Error regime, stated honestly: the bound is ADDITIVE —
    * est ≤ true + ε·N_A·N_B with ε ≈ e/w — so relative error is small
    * when the join is non-selective or skew-heavy (the cases an
    * optimizer must not get wrong: true ~ N_A·N_B/|keys| or worse) and
    * degrades for highly selective joins (true << N_A·N_B/w), where the
    * estimate's value is the cheap UPPER bound itself. w is the
    * resolution knob: measured here, w=512 gave 3.9× over at sf0.01;
    * w=16384 gives +6.9% (sf0.01) and +89% (sf0.1, where
    * N_A·N_B/w ≈ true) — each at 4·w counters of wire cost per side
    * regardless of table size.
    *
    * 100 TB posture: each side folds map-side into one 4×512 matrix
    * (corpus-size-independent wire cost, the q195 argument); the exact
    * companion (needed only for grading) is a key-count join of two
    * already-aggregated key tables. All products and sums accumulate in
    * DECIMAL(38,0): counters up to 10^14 square to 10^28, ×512 cells
    * ≈ 10^31 — 7 orders of headroom, where int64 products overflow at
    * 2^63 (the q211 lesson). Estimates are graded EXACTLY, not with a
    * tolerance: the md5 cell family is deterministic in both engines,
    * so est_pairs itself hash-matches, and `no_undercount` pins the
    * one-sided contract on every run. */
  private val jcWidth = 16384 // >> |keys|: collision noise ~ N_A*N_B/w

  def cmsJoinCard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.functions.GraftExtensions.registerCms(spark)
    val eCnt = Tables(spark, dir, "events")
      .groupBy(col("user_id").cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val oCnt = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val mE = eCnt.agg(expr(s"cms_agg(k, cnt, $cmsDepth, $jcWidth)").as("me"))
    val mO = oCnt.agg(expr(s"cms_agg(k, cnt, $cmsDepth, $jcWidth)").as("mo"))
    val exact = eCnt.join(oCnt.withColumnRenamed("cnt", "cnt_o"), Seq("k"))
      .agg(sum(col("cnt").cast(DecimalType(38, 0))
        * col("cnt_o").cast(DecimalType(38, 0))).as("exact"))
    val rowIp = (0 until cmsDepth).map { i =>
      s"""aggregate(zip_with(
         |  slice(me, ${i * jcWidth + 1}, $jcWidth),
         |  slice(mo, ${i * jcWidth + 1}, $jcWidth),
         |  (a, b) -> CAST(a AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))),
         |  CAST(0 AS DECIMAL(38,0)), (acc, x) -> acc + x)""".stripMargin
    }.mkString("least(", ", ", ")")
    mE.crossJoin(broadcast(mO)).crossJoin(broadcast(exact))
      .select(
        col("exact").cast("long").as("exact_pairs"),
        expr(rowIp).cast("long").as("est_pairs"),
        when(expr(rowIp) >= col("exact"), lit(1L)).otherwise(lit(0L))
          .as("no_undercount"),
        expr(s"CAST((($rowIp - exact) * 1000000) div exact AS BIGINT)")
          .as("err_ppm"))
  }

  private val cmsJoinCardSql =
    """WITH ec AS (
      |  SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT)
      |    AS cnt FROM events GROUP BY 1),
      |oc AS (
      |  SELECT CAST(o_custkey AS VARCHAR) AS k, CAST(count(*) AS BIGINT)
      |    AS cnt FROM orders GROUP BY 1),
      |r AS (SELECT unnest(range(0, 4)) AS i),
      |ce AS (SELECT i,
      |    (('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || k), 1, 15))::BIGINT % 16384) AS cell,
      |    sum(cnt::HUGEINT) AS s
      |  FROM ec, r GROUP BY 1, 2),
      |co AS (SELECT i,
      |    (('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || k), 1, 15))::BIGINT % 16384) AS cell,
      |    sum(cnt::HUGEINT) AS s
      |  FROM oc, r GROUP BY 1, 2),
      |ip AS (SELECT ce.i, sum(ce.s * co.s) AS p
      |  FROM ce JOIN co ON ce.i = co.i AND ce.cell = co.cell GROUP BY 1),
      |est AS (SELECT min(p) AS est FROM ip),
      |ex AS (SELECT sum(ec.cnt::HUGEINT * oc.cnt) AS exact
      |  FROM ec JOIN oc USING (k))
      |SELECT CAST(exact AS BIGINT) AS exact_pairs,
      |  CAST(est AS BIGINT) AS est_pairs,
      |  CAST(CASE WHEN est >= exact THEN 1 ELSE 0 END AS BIGINT)
      |    AS no_undercount,
      |  CAST(((est - exact) * 1000000) // exact AS BIGINT) AS err_ppm
      |FROM est, ex""".stripMargin

  // ---- q284: skew-key detection for join planning -------------------------

  /** q284: SKEW-KEY DETECTION — the third member of the join-planning
    * statistics family (q282 size, q283 selectivity): list the keys
    * whose per-side multiplicity product exceeds 1% of the total join
    * output, i.e. the keys an AQE-style planner must salt or split
    * before |events ⋈ orders| materializes. Everything computes on the
    * two ALREADY-AGGREGATED key tables (map-side partials; the fact
    * tables never meet), the total attaches by the broadcast
    * scalar-attach idiom, and the share floor bounds the OUTPUT by
    * construction: at ≥1% there can never be more than 100 rows,
    * however large the corpus — a planner input, not a report.
    * Products and the total accumulate in DECIMAL(38,0) (two int64
    * multiplicities overflow int64 exactly when skew is worst — the
    * case the query exists to catch); share_ppm is the exact integral
    * quotient. */
  def skewKeys(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val eCnt = Tables(spark, dir, "events")
      .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("cnt_e"))
    val oCnt = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("cnt_o"))
    val pairs = eCnt.join(oCnt, Seq("k"))
      .select(col("k"), col("cnt_e"), col("cnt_o"),
        (col("cnt_e").cast(DecimalType(38, 0))
          * col("cnt_o").cast(DecimalType(38, 0))).as("pairs"))
    val total = pairs.agg(sum(col("pairs")).as("total"))
    pairs.crossJoin(broadcast(total))
      .selectExpr("k", "cnt_e", "cnt_o",
        "CAST(pairs AS BIGINT) AS pairs",
        "CAST((pairs * 1000000) div total AS BIGINT) AS share_ppm")
      .where(col("share_ppm") >= 10000L)
  }

  private val skewKeysSql =
    """WITH ec AS (
      |  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS cnt_e
      |  FROM events GROUP BY 1),
      |oc AS (
      |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS cnt_o
      |  FROM orders GROUP BY 1),
      |p AS (
      |  SELECT ec.k, cnt_e, cnt_o, cnt_e::HUGEINT * cnt_o AS pairs
      |  FROM ec JOIN oc ON ec.k = oc.k),
      |t AS (SELECT sum(pairs) AS total FROM p)
      |SELECT k, cnt_e, cnt_o, CAST(pairs AS BIGINT) AS pairs,
      |  CAST((pairs * 1000000) // total AS BIGINT) AS share_ppm
      |FROM p, t WHERE (pairs * 1000000) // total >= 10000""".stripMargin

  // ---- q200: CMS sketch-store COMMIT --------------------------------------

  /** q200: incremental maintenance of the q195 sketch — the sketch-store
    * member of the commit family (q120 fingerprints, q169 vectors, q192
    * postings). A counter sketch is a commutative monoid, so the
    * committed store updates by PURE ADDITION: gen0's counter table
    * (history) and the arriving batch's counters merge elementwise and
    * re-commit as gen1 — the historical corpus is never re-read at
    * commit time, and the merge moves only ≤ depth·width counter rows
    * however much corpus either side summarizes. The counter builder is
    * ONE definition shared with the q196 stream
    * ([[graft.streaming.EventStreams.cmsCellCounts]]), the q115/q117
    * can't-drift discipline.
    *
    * Trust invariant of the family: gen1 must equal the sketch REBUILT
    * over the full corpus; because the md5 hash family is exact in both
    * engines, the oracle IS that full rebuild — every committed counter
    * hash-graded, read back from the gen1 table. */
  def cmsCommit(spark: SparkSession, dir: String): DataFrame = {
    // per-token md5 hashing on an unsplittable single-file scan is ONE
    // task (1.7 s measured) — rebalance first (guide §2.5, gate off on
    // multi-split inputs)
    def countersOf(pred: String): DataFrame =
      graft.streaming.EventStreams.cmsCellCounts(
        Tables.spread(spark, dir, "documents",
          Tables(spark, dir, "documents").where(expr(pred))))
    val gen0 = Warehouse.materializeBucketed(spark,
      countersOf(s"NOT (${Dedup.batchPred})"), "graft_cms_gen0", 4, Seq("cell"))
    val merged = gen0.unionByName(countersOf(Dedup.batchPred))
      .groupBy(col("i"), col("cell"))
      .agg(sum(col("s")).as("s"))
    Warehouse.materializeBucketed(spark, merged, "graft_cms_gen1", 4, Seq("cell"))
  }

  private val cmsCommitSql =
    """WITH tt AS (
      |  SELECT t FROM (
      |    SELECT unnest(string_split(text, ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |e AS (
      |  SELECT i,
      |    (('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || t), 1, 15))::BIGINT % 512) AS cell
      |  FROM tt, (SELECT unnest(range(0, 4)) AS i) r)
      |SELECT i, cell, CAST(count(*) AS BIGINT) AS s
      |FROM e GROUP BY i, cell""".stripMargin

  // ---- q204: transparent materialized-view rewrite ------------------------

  /** q204: MATERIALIZED-VIEW REWRITE, demonstrated end-to-end — the
    * warehouse feature that makes a shared derived table free for every
    * consumer. The view (long-word counts — its defining plan is
    * deliberately unique in the registry so no other query's subtree
    * matches it) is registered once through
    * [[graft.plans.MatViewRule.register]], which materializes the result
    * as a warehouse table and records the defining plan's canonical form.
    * The consumer below is then authored FROM SCRATCH against the raw
    * corpus — explode, filter, groupBy, top-k — and the optimizer
    * substitutes the table scan: the corpus scan, the explode, and the
    * aggregation exchange all vanish from the physical plan (`RulesSpec`
    * pins both the rewrite and the no-registration control).
    *
    * At 100 TB this is the difference between every dashboard query
    * re-tokenizing the corpus and all of them sharing one nightly
    * aggregate — transparently, with no consumer code change. Graded
    * against the from-scratch DuckDB oracle, so a wrong substitution is
    * a correctness failure, not a plan regression. */
  def matviewTopWords(spark: SparkSession, dir: String): DataFrame = {
    def wc = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "" && length(col("t")) >= 5)
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    graft.plans.MatViewRule.register(spark, wc, "graft_mv_longwords")
    // consumer: written against the raw corpus, planned against the view
    wc.orderBy(col("cnt").desc, col("t")).limit(20)
  }

  private val matviewTopWordsSql =
    """SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM documents) x
      |WHERE t <> '' AND length(t) >= 5
      |GROUP BY t ORDER BY cnt DESC, t LIMIT 20""".stripMargin

  // ---- q211: pairwise source divergence (total variation) -----------------

  /** q211: PAIRWISE LEXICAL DIVERGENCE between source unigram
    * distributions — the data-mixing diagnostic ("which sources are
    * near-duplicates of each other distributionally, which add genuinely
    * new text?"). The standard KL/JS divergences need logs, which are not
    * correctly-rounded and can never hash-match across engines (the q166
    * lesson); TOTAL VARIATION distance — ½·Σ|p−q| — is the divergence
    * that stays in EXACT RATIONALS: with integer counts,
    * Σ|c₁/N₁ − c₂/N₂| = Σ|c₁N₂ − c₂N₁| / (N₁N₂), so the whole metric is
    * integer arithmetic (DECIMAL(38) sums — products reach 1e14 and
    * corpus sums beyond long).
    *
    * One tokenize pass builds the (source, word) count table; the
    * pairwise step joins it with ITSELF ON THE WORD KEY — never a
    * corpus-scale cross product; each word expands to at most
    * |sources-with-it|² pairs, document-frequency-bounded. Words absent
    * from one side contribute their full mass, recovered in CLOSED FORM
    * from the shared-word sums (N₂(N₁−S₁) + N₁(N₂−S₂)) rather than a
    * full-outer join — and pairs sharing NO word still report (tv =
    * 1e6 ppm exactly), the zero-fill discipline. */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds the totals, and both sides of the word join
    val totals = wc.groupBy(col("source")).agg(sum(col("c")).as("n"))
      .localCheckpoint()
    val d38 = "decimal(38,0)"
    val shared = wc.select(col("source").as("s1"), col("t"), col("c").as("c1"))
      .join(wc.select(col("source").as("s2"), col("t"), col("c").as("c2")), Seq("t"))
      .where(col("s1") < col("s2"))
      .join(broadcast(totals.select(col("source").as("s1"), col("n").as("n1"))), Seq("s1"))
      .join(broadcast(totals.select(col("source").as("s2"), col("n").as("n2"))), Seq("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(
        // factors cast to DECIMAL(38,0) BEFORE the multiply: per-source
        // token totals at the 100 TB design point exceed 2^63 products —
        // an int64 product here would overflow before the cast (ANSI
        // failure or silent corruption), the same discipline as the
        // closed-form terms below and q180/q183's ppm products
        sum(abs(col("c1").cast(d38) * col("n2").cast(d38) -
          col("c2").cast(d38) * col("n1").cast(d38))).as("num_shared"),
        sum(col("c1")).as("sh1"), sum(col("c2")).as("sh2"),
        count(lit(1)).as("n_shared_words"))
    totals.select(col("source").as("s1"), col("n").as("n1"))
      .join(broadcast(totals.select(col("source").as("s2"), col("n").as("n2"))),
        col("s1") < col("s2"))
      .join(shared, Seq("s1", "s2"), "left")
      // `div` (integral divide), NOT decimal `/`: Spark rounds a decimal
      // quotient at the result scale where DuckDB's `//` floors — `div`
      // truncates, matching the oracle exactly at quotient boundaries
      .select(col("s1"), col("s2"),
        coalesce(col("n_shared_words"), lit(0L)).as("n_shared_words"),
        (coalesce(col("num_shared"), lit(0)).cast(d38) +
          col("n2").cast(d38) * (col("n1") - coalesce(col("sh1"), lit(0L))).cast(d38) +
          col("n1").cast(d38) * (col("n2") - coalesce(col("sh2"), lit(0L))).cast(d38))
          .as("num_all"), col("n1"), col("n2"))
      .selectExpr("s1", "s2", "n_shared_words",
        s"CAST((num_all * 1000000) div (CAST(n1 AS $d38) * CAST(n2 AS $d38) * 2) AS BIGINT) AS tv_ppm")
  }

  private val sourceDivergenceSql =
    """WITH wc AS (
      |  SELECT source, t, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS t
      |    FROM documents) x
      |  WHERE t <> '' GROUP BY source, t),
      |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
      |  FROM wc GROUP BY source),
      |sh AS (
      |  SELECT a.source AS s1, b.source AS s2,
      |    sum(abs(a.c::HUGEINT * tb.n::HUGEINT
      |      - b.c::HUGEINT * ta.n::HUGEINT)) AS num_shared,
      |    CAST(sum(a.c) AS BIGINT) AS sh1, CAST(sum(b.c) AS BIGINT) AS sh2,
      |    CAST(count(*) AS BIGINT) AS n_shared_words
      |  FROM wc a JOIN wc b ON a.t = b.t AND a.source < b.source
      |  JOIN tot ta ON ta.source = a.source
      |  JOIN tot tb ON tb.source = b.source
      |  GROUP BY 1, 2)
      |SELECT x.source AS s1, y.source AS s2,
      |  CAST(coalesce(sh.n_shared_words, 0) AS BIGINT) AS n_shared_words,
      |  CAST((coalesce(sh.num_shared, 0)::HUGEINT
      |    + y.n::HUGEINT * (x.n - coalesce(sh.sh1, 0))::HUGEINT
      |    + x.n::HUGEINT * (y.n - coalesce(sh.sh2, 0))::HUGEINT) * 1000000
      |    // (2 * x.n::HUGEINT * y.n::HUGEINT) AS BIGINT) AS tv_ppm
      |FROM tot x JOIN tot y ON x.source < y.source
      |LEFT JOIN sh ON sh.s1 = x.source AND sh.s2 = y.source""".stripMargin

  // ---- q210: the data card ------------------------------------------------

  /** q210: the DATA CARD — the one-table corpus summary every released
    * dataset ships (composition, language mix, length distribution,
    * duplication), produced as a single query so the card can never drift
    * from the corpus it describes. Sections are (section, k, v) rows:
    * per-source and per-language doc counts, exact length quantiles
    * (binary-exact fractions of integer data — the q89 argument), token
    * totals, and the exact-duplication summary (the q50 fingerprint
    * grain). Scalar sections compute in ONE aggregate pass stack-unpivoted
    * (the q201 shape); groupwise sections are map-side-combined counts.
    * Everything is exact, so the whole card hash-grades. */
  def dataCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val bySource = docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("v"))
      .select(lit("docs_per_source").as("section"), col("source").as("k"), col("v"))
    val byLang = docs.groupBy(col("lang"))
      .agg(count(lit(1)).cast("double").as("v"))
      .select(lit("docs_per_lang").as("section"), col("lang").as("k"), col("v"))
    val scalars = docs.agg(
        count(lit(1)).cast("double").as("n_docs"),
        sum(size(split(col("text"), " "))).cast("double").as("n_tokens"),
        sum(col("n_chars")).cast("double").as("n_chars"),
        expr("percentile(n_chars, 0.25D)").as("len_p25"),
        expr("percentile(n_chars, 0.5D)").as("len_p50"),
        expr("percentile(n_chars, 0.75D)").as("len_p75"),
        countDistinct(md5(lower(trim(col("text"))))).cast("double")
          .as("n_distinct_fp"))
      .selectExpr("stack(7, 'n_docs', n_docs, 'n_tokens', n_tokens, " +
        "'n_chars', n_chars, 'len_p25', len_p25, 'len_p50', len_p50, " +
        "'len_p75', len_p75, 'n_distinct_fp', n_distinct_fp) AS (k, v)")
      .select(lit("corpus").as("section"), col("k"), col("v"))
    bySource.unionByName(byLang).unionByName(scalars)
  }

  private val dataCardSql =
    """SELECT 'docs_per_source' AS section, source AS k,
      |  CAST(count(*) AS DOUBLE) AS v FROM documents GROUP BY source
      |UNION ALL
      |SELECT 'docs_per_lang', lang, CAST(count(*) AS DOUBLE)
      |FROM documents GROUP BY lang
      |UNION ALL
      |SELECT 'corpus', k, v FROM (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS n_tokens,
      |    CAST(sum(n_chars) AS DOUBLE) AS n_chars,
      |    quantile_cont(n_chars, 0.25) AS len_p25,
      |    quantile_cont(n_chars, 0.5) AS len_p50,
      |    quantile_cont(n_chars, 0.75) AS len_p75,
      |    CAST(count(DISTINCT md5(lower(trim(text)))) AS DOUBLE)
      |      AS n_distinct_fp
      |  FROM documents) s
      |  CROSS JOIN (VALUES ('n_docs'), ('n_tokens'), ('n_chars'),
      |    ('len_p25'), ('len_p50'), ('len_p75'), ('n_distinct_fp')) t(k)
      |  , LATERAL (SELECT CASE k WHEN 'n_docs' THEN n_docs
      |    WHEN 'n_tokens' THEN n_tokens WHEN 'n_chars' THEN n_chars
      |    WHEN 'len_p25' THEN len_p25 WHEN 'len_p50' THEN len_p50
      |    WHEN 'len_p75' THEN len_p75 ELSE n_distinct_fp END AS v) u""".stripMargin

  // ---- q89: IQR length-outlier filter -------------------------------------

  /** Per-language Tukey outlier filter on document length: keep documents
    * inside [p25 - 1.5·IQR, p75 + 1.5·IQR] — the standard "drop truncated
    * and runaway documents" curation pass. The quartiles are computed once
    * per language (tiny aggregate, broadcast back onto the scan), so the
    * whole filter is one corpus pass plus a broadcast join. Quartiles of
    * integer-valued data at binary-exact fractions (.25/.75) interpolate to
    * exactly representable values, and both engines evaluate the identical
    * expression tree, so the bounds (and the keep flag) hash-match. */
  def lengthFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val bounds = docs.groupBy(col("lang")).agg(
      expr("percentile(n_chars, 0.25D)").as("p25"),
      expr("percentile(n_chars, 0.75D)").as("p75"))
    docs.join(broadcast(bounds), "lang")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (col("p25") - (col("p75") - col("p25")) * 1.5).as("lo"),
        (col("p75") + (col("p75") - col("p25")) * 1.5).as("hi"))
      .withColumn("keep", col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
  }

  private val lengthFilterSql =
    """WITH b AS (
      |  SELECT lang, quantile_cont(n_chars, 0.25) AS p25,
      |    quantile_cont(n_chars, 0.75) AS p75
      |  FROM documents GROUP BY lang)
      |SELECT doc_id, d.lang, n_chars,
      |  p25 - (p75 - p25) * 1.5 AS lo,
      |  p75 + (p75 - p25) * 1.5 AS hi,
      |  n_chars >= p25 - (p75 - p25) * 1.5
      |    AND n_chars <= p75 + (p75 - p25) * 1.5 AS keep
      |FROM documents d JOIN b ON d.lang = b.lang""".stripMargin

  // ---- q66: salient terms (TF-IDF, log-free) ------------------------------

  /** Top-3 salient terms per document by a log-free TF-IDF score:
    * score = tf × N / df (document frequency from a corpus-wide partial
    * agg, broadcast back onto the per-doc term counts). The usual log()
    * is deliberately absent — libm log is not correctly-rounded and may
    * differ between engines at the ULP, while a single IEEE division of
    * exact integers is bit-identical everywhere; the score is monotone in
    * the same ordering for fixed tf. Two shuffles total: the (doc,
    * token) tf agg and, derived FROM it, the (token) df agg (df = the
    * posting row count, so the corpus is tokenized once and the df
    * branch reads the tf exchange back) — both partial-aggregated, both
    * ∝ distinct keys, never ∝ corpus bytes. */
  def salientTerms(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
    val nDocs = Tables(spark, dir, "documents")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    // ONE tokenization: df is the per-term ROW count of the (doc, term)
    // tf table (one row per posting), so both join inputs share the tf
    // exchange instead of exploding the corpus twice. The tf > 0 guard is
    // a no-op semantically (counts are >= 1) but keeps tf CONSUMED in
    // this branch — without it Catalyst prunes the count into a keys-only
    // distinct and the subtrees stop canonicalizing (the q178 lesson).
    val tf = toks.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val df = tf.where(col("tf") > 0)
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("t").asc)
    // df joins by SHUFFLE on the token key, deliberately un-hinted: the
    // document-frequency table is the full vocabulary — unbounded at corpus
    // scale, so forcing a broadcast would be the 100 TB mistake. AQE still
    // broadcasts it when it measures small.
    tf.join(df, "t")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("t"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
  }

  private val salientTermsSql =
    """WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      |dfreq AS (
      |  SELECT t, count(*) AS df FROM (SELECT DISTINCT doc_id, t FROM toks) y
      |  GROUP BY t),
      |tfreq AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY doc_id, t)
      |SELECT doc_id, t, tf, df, score, rk FROM (
      |  SELECT f.doc_id, f.t, f.tf, d.df,
      |    CAST(f.tf * nd.n_docs AS DOUBLE) / d.df AS score,
      |    row_number() OVER (PARTITION BY f.doc_id
      |      ORDER BY CAST(f.tf * nd.n_docs AS DOUBLE) / d.df DESC, f.t) AS rk
      |  FROM tfreq f JOIN dfreq d ON f.t = d.t, nd) r
      |WHERE rk <= 3""".stripMargin

  // ---- q199: Poisson bootstrap (hash-seeded, exact) -----------------------

  /** Poisson(1) CDF thresholds scaled by 2^60, floor-rounded — the
    * inverse-CDF table shared as integer literals with the oracle, so the
    * resample multiplicity is exact integer arithmetic in both engines. */
  private val poissonThresh = Seq(424136118829305329L, 848272237658610659L,
    1060340297073263324L, 1131029650211480879L, 1148701988496035267L)

  /** q199: POISSON BOOTSTRAP of the mean document length — error bars on
    * a corpus statistic without materializing B resamples. The classical
    * bootstrap draws n docs with replacement per replica — unrunnable at
    * corpus scale; the Poisson bootstrap (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", 2012) replaces the draw with
    * an independent Poisson(1) multiplicity per (doc, replica), which
    * needs NO global coordination: every multiplicity is computed
    * scan-locally, the per-replica sums partial-aggregate map-side, and
    * the exchange carries 32 rows total regardless of corpus size.
    *
    * Determinism: the multiplicity is the inverse-CDF of the shared md5
    * hash family — u = h(b:doc_id) ∈ [0, 2^60) compared against the five
    * floor(CDF·2^60) integer literals above (mass beyond k=5 truncated,
    * ~6e-4 of draws, identically in both engines) — so each replica's
    * (n_eff, len_sum) is hash-graded exactly, not statistically. */
  def bootstrapMean(spark: SparkSession, dir: String): DataFrame = {
    val hExpr = "CAST(conv(substring(md5(concat(CAST(b AS STRING), ':', " +
      "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    val kExpr = poissonThresh
      .map(t => s"(CASE WHEN h >= ${t}L THEN 1 ELSE 0 END)").mkString(" + ")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        explode(expr("sequence(0L, 31L)")).as("b"))
      .withColumn("h", expr(hExpr))
      .withColumn("k", expr(kExpr).cast("long"))
      .groupBy(col("b"))
      .agg(sum(col("k")).as("n_eff"),
        sum(col("k") * col("n_chars")).as("len_sum"))
      .select(col("b"), col("n_eff"), col("len_sum"),
        expr("(len_sum * 1000) div n_eff").as("mean_len_x1000"))
  }

  private val bootstrapMeanSql =
    """WITH e AS (
      |  SELECT b, n_chars,
      |    (('0x' || substr(md5(CAST(b AS VARCHAR) || ':' ||
      |        CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS h
      |  FROM documents, (SELECT unnest(range(0, 32)) AS b) r),
      |k AS (
      |  SELECT b, n_chars,
      |    ((h >= 424136118829305329)::INT + (h >= 848272237658610659)::INT +
      |     (h >= 1060340297073263324)::INT + (h >= 1131029650211480879)::INT +
      |     (h >= 1148701988496035267)::INT) AS k
      |  FROM e)
      |SELECT b, CAST(sum(k) AS BIGINT) AS n_eff,
      |  CAST(sum(k * n_chars) AS BIGINT) AS len_sum,
      |  CAST((sum(k * n_chars) * 1000) // sum(k) AS BIGINT) AS mean_len_x1000
      |FROM k GROUP BY b""".stripMargin

  // ---- q205: bootstrap CI of the MEDIAN -----------------------------------

  /** q205: bootstrap the MEDIAN — the statistic whose sampling
    * distribution has no closed form, i.e. the case the bootstrap exists
    * for (the mean's CI is textbook; the median's is not). Same q199
    * Poisson-multiplicity machinery, but the naive per-replica median
    * (sort the resampled corpus 32 times) would be 32 corpus sorts; the
    * scale shape is the HISTOGRAM path: aggregate multiplicities per
    * (replica, value) — the exchange is |replicas|·|distinct lengths|
    * rows, bounded by the value domain, not the corpus — then walk each
    * replica's tiny cumulative histogram with a window to the first value
    * whose doubled cumulative weight reaches the total (the lower
    * weighted median, a pure integer definition both engines evaluate
    * identically). Replica medians hash-grade exactly; their spread IS
    * the CI. */
  def bootstrapMedian(spark: SparkSession, dir: String): DataFrame = {
    val hExpr = "CAST(conv(substring(md5(concat(CAST(b AS STRING), ':', " +
      "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    val kExpr = poissonThresh
      .map(t => s"(CASE WHEN h >= ${t}L THEN 1 ELSE 0 END)").mkString(" + ")
    val hist = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        explode(expr("sequence(0L, 31L)")).as("b"))
      .withColumn("h", expr(hExpr))
      .withColumn("k", expr(kExpr).cast("long"))
      .groupBy(col("b"), col("n_chars"))
      .agg(sum(col("k")).as("w"))
    import org.apache.spark.sql.expressions.Window
    val cum = hist.withColumn("cw",
        sum(col("w")).over(Window.partitionBy(col("b")).orderBy(col("n_chars"))))
      .withColumn("tot",
        sum(col("w")).over(Window.partitionBy(col("b"))))
    cum.where(col("cw") * 2 >= col("tot"))
      .groupBy(col("b"))
      .agg(min(col("n_chars")).cast("long").as("median_len"),
        max(col("tot")).as("n_eff"))
  }

  private val bootstrapMedianSql =
    """WITH e AS (
      |  SELECT b, n_chars,
      |    (('0x' || substr(md5(CAST(b AS VARCHAR) || ':' ||
      |        CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS h
      |  FROM documents, (SELECT unnest(range(0, 32)) AS b) r),
      |k AS (
      |  SELECT b, n_chars,
      |    ((h >= 424136118829305329)::INT + (h >= 848272237658610659)::INT +
      |     (h >= 1060340297073263324)::INT + (h >= 1131029650211480879)::INT +
      |     (h >= 1148701988496035267)::INT) AS k
      |  FROM e),
      |hist AS (
      |  SELECT b, n_chars, CAST(sum(k) AS BIGINT) AS w
      |  FROM k GROUP BY b, n_chars),
      |cum AS (
      |  SELECT b, n_chars, w,
      |    sum(w) OVER (PARTITION BY b ORDER BY n_chars) AS cw,
      |    sum(w) OVER (PARTITION BY b) AS tot
      |  FROM hist)
      |SELECT b, CAST(min(n_chars) AS BIGINT) AS median_len,
      |  CAST(max(tot) AS BIGINT) AS n_eff
      |FROM cum WHERE cw * 2 >= tot GROUP BY b""".stripMargin

  // ---- q69: deterministic stratified sample -------------------------------

  /** Exactly-k-per-stratum sampling: rank documents inside each language by
    * the deterministic doc-id hash (the same seedless recipe as q37/q58)
    * and keep the first 25. Unlike rate sampling, the output size per
    * stratum is fixed — the "balanced eval slice" op. One window shuffle on
    * the stratum key; only k rows per stratum survive the rank filter. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), h.as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 25)
      .select(col("doc_id"), col("lang"), col("source"), col("rk"))
  }

  private val stratifiedSampleSql =
    """SELECT doc_id, lang, source, rk FROM (
      |  SELECT doc_id, lang, source, row_number() OVER (
      |    PARTITION BY lang
      |    ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id
      |  ) AS rk
      |  FROM documents) t
      |WHERE rk <= 25""".stripMargin

  // ---- q100: curation pipeline v2 (scrub -> filter -> dedup -> pack) ------

  /** End-to-end curation of the round-3 operator family in ONE DAG — the
    * composition proof that the pieces chain: PII scrub (q85) → quality
    * filter (q71's rules on the scrubbed text) → per-language IQR length
    * fences (q89) → exact dedup keep-first (q50 shape) → sequence packing
    * (q87) → per-language corpus stats. Every step is the same
    * deterministic arithmetic its standalone query uses, so the whole
    * pipeline is hash-checked. Plan shape: two scans (documents + the
    * docs_in count), one tiny fence aggregate broadcast back, one window
    * per dedup/packing — nothing quadratic, nothing driver-side. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    // One scrub pass, narrow thereafter (guide §2.3): the fence aggregate
    // and the main stream BOTH consume `qual`, and as lazy subtrees each
    // re-ran the 3-regex scrub over the corpus. Everything downstream
    // needs only (doc_id, lang, n_tokens, n_chars) + the dedup
    // fingerprint, so the fingerprint is computed IN the scrub pass, the
    // text is dropped, and the narrow frame is checkpointed once — the
    // shape a production curation run persists anyway. The dedup window
    // then shuffles 8-byte-ids + a 32-char hash instead of document text.
    val qual = scrubPii(withPii(spark, dir), "raw")
      .select(col("doc_id"), col("lang"),
        size(split(col("clean"), " ")).cast("long").as("n_tokens"),
        length(col("clean")).cast("long").as("n_chars"),
        (length(regexp_replace(col("clean"), "[^a-z]", "")).cast("double") /
          length(col("clean"))).as("alpha_ratio"),
        md5(lower(trim(col("clean")))).as("fp"))
      .where(col("n_tokens").between(20, 200) && col("alpha_ratio") >= 0.7)
      .localCheckpoint()
    val fences = qual.groupBy(col("lang")).agg(
      expr("percentile(n_chars, 0.25D)").as("p25"),
      expr("percentile(n_chars, 0.75D)").as("p75"))
    val fenced = qual.join(broadcast(fences), "lang")
      .where(col("n_chars") >= col("p25") - (col("p75") - col("p25")) * 1.5 &&
        col("n_chars") <= col("p75") + (col("p75") - col("p25")) * 1.5)
    val kept = fenced
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .where(col("rn") === 1)
    val packed = kept
      .withColumn("start_off",
        sum(col("n_tokens")).over(
          Window.partitionBy(col("lang")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_off div $packBudget"))
      .withColumn("straddles",
        col("start_off") % packBudget + col("n_tokens") > packBudget)
    val docsIn = Tables(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("docs_in"))
    packed.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs_kept"),
        sum(col("n_tokens")).as("total_tokens"),
        (max(col("pack_id")) + 1).as("n_packs"),
        sum(col("straddles").cast("long")).as("n_straddled"))
      .join(broadcast(docsIn), "lang")
      .select(col("lang"), col("docs_in"), col("docs_kept"),
        col("total_tokens"), col("n_packs"), col("n_straddled"))
  }

  private val curationPipelineSql =
    s"""WITH r AS ($withPiiSql),
       |c AS (
       |  SELECT doc_id, lang, source,
       |    regexp_replace(regexp_replace(regexp_replace(raw,
       |      '$emailRe', '<EMAIL>', 'g'),
       |      '$phoneRe', '<PHONE>', 'g'),
       |      '$digitRe', '<NUM>', 'g') AS clean
       |  FROM r),
       |m AS (
       |  SELECT doc_id, lang, source, clean,
       |    CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(length(clean) AS BIGINT) AS n_chars,
       |    CAST(length(regexp_replace(clean, '[^a-z]', '', 'g')) AS DOUBLE)
       |      / length(clean) AS alpha_ratio
       |  FROM c),
       |q AS (SELECT * FROM m
       |  WHERE n_tokens BETWEEN 20 AND 200 AND alpha_ratio >= 0.7),
       |f AS (SELECT lang, quantile_cont(n_chars, 0.25) AS p25,
       |    quantile_cont(n_chars, 0.75) AS p75
       |  FROM q GROUP BY lang),
       |fe AS (
       |  SELECT q.* FROM q JOIN f ON q.lang = f.lang
       |  WHERE n_chars >= p25 - (p75 - p25) * 1.5
       |    AND n_chars <= p75 + (p75 - p25) * 1.5),
       |k AS (SELECT * FROM (
       |    SELECT fe.*, row_number() OVER (
       |      PARTITION BY md5(lower(trim(clean))) ORDER BY doc_id) AS rn
       |    FROM fe) z
       |  WHERE rn = 1),
       |p AS (
       |  SELECT lang, doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - n_tokens AS BIGINT) AS start_off
       |  FROM k),
       |p2 AS (
       |  SELECT lang, n_tokens, start_off // $packBudget AS pack_id,
       |    start_off % $packBudget + n_tokens > $packBudget AS straddles
       |  FROM p),
       |agg AS (
       |  SELECT lang, count(*) AS docs_kept,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
       |    CAST(sum(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_straddled
       |  FROM p2 GROUP BY lang),
       |i AS (SELECT lang, count(*) AS docs_in FROM documents GROUP BY lang)
       |SELECT a.lang, i.docs_in, a.docs_kept, a.total_tokens, a.n_packs,
       |  a.n_straddled
       |FROM agg a JOIN i ON a.lang = i.lang""".stripMargin

  /** q141: per-source distribution shift vs the corpus — total-variation
    * distance over the top-200 corpus tokens, in EXACT integer arithmetic.
    * The mixture-health dashboard every large-scale curation run needs:
    * a source whose token distribution drifts from the corpus (spam,
    * boilerplate, wrong language) shows a high tv_ppm.
    *
    * Exactness: TV = ½·Σ|c_s/n_s − c/n| is computed as the integer
    * Σ|c_s·n − c·n_s| over a common denominator, summed in DECIMAL(38,0)
    * (HUGEINT on the DuckDB side — per-term products reach c·n ≈ 10²⁶ at
    * 100 TB, past int64), with ONE final integral division to ppm. No
    * doubles anywhere, so accumulation order cannot matter.
    *
    * Scale shape: token counts are partial-aggregated map-side; the
    * top-200 head is a distributed TakeOrdered (deterministic
    * (count desc, token) tie-break), then BROADCAST — the grid is
    * |sources|·200 rows no matter how large the corpus, and the only
    * full shuffles are the two bounded count aggregations. Restricting
    * to the head is what keeps the grid scale-free; the head carries
    * the bulk of the probability mass, which is the signal that matters
    * for mixture drift. */
  def sourceShift(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
    val top = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t").asc).limit(200)
    val nTot = tok.agg(count(lit(1)).as("n"))
    val ns = tok.groupBy(col("source")).agg(count(lit(1)).as("n_tok"))
    val sc = tok.groupBy(col("source"), col("t")).agg(count(lit(1)).as("cs"))
    ns.crossJoin(broadcast(top))
      .crossJoin(broadcast(nTot))
      .join(sc, Seq("source", "t"), "left")
      .select(col("source"), col("n_tok"), col("n"), col("c"),
        coalesce(col("cs"), lit(0L)).as("cs"))
      .groupBy(col("source"), col("n_tok"), col("n"))
      .agg(sum(expr(
        "abs(CAST(cs AS DECIMAL(38,0)) * n - CAST(c AS DECIMAL(38,0)) * n_tok)"))
        .as("s"))
      .select(col("source"), col("n_tok"),
        expr("CAST((1000000 * s) div (2 * CAST(n_tok AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("tv_ppm"))
  }

  private val sourceShiftSql =
    """WITH tok0 AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
      |tok AS (SELECT source, t FROM tok0 WHERE t <> ''),
      |top AS (
      |  SELECT t, count(*) AS c FROM tok GROUP BY 1
      |  ORDER BY c DESC, t LIMIT 200),
      |n AS (SELECT count(*) AS n FROM tok),
      |ns AS (SELECT source, count(*) AS n_tok FROM tok GROUP BY 1),
      |sc AS (SELECT source, t, count(*) AS cs FROM tok GROUP BY 1, 2),
      |grid AS (
      |  SELECT ns.source, ns.n_tok, n.n, top.t, top.c,
      |    coalesce(sc.cs, 0) AS cs
      |  FROM ns CROSS JOIN top CROSS JOIN n
      |  LEFT JOIN sc ON sc.source = ns.source AND sc.t = top.t)
      |SELECT source, n_tok,
      |  CAST((1000000 * sum(abs(CAST(cs AS HUGEINT) * n
      |      - CAST(c AS HUGEINT) * n_tok)))
      |    // (2 * CAST(n_tok AS HUGEINT) * n) AS BIGINT) AS tv_ppm
      |FROM grid GROUP BY source, n_tok, n""".stripMargin

  /** q142: probability-proportional-to-size SYSTEMATIC sampling, stratified
    * by language — the deterministic eval-set draw: walk each stratum's
    * cumulative token weight and keep every document whose weight interval
    * crosses a multiple of (stratum total div 50), so long documents are
    * proportionally more likely to be picked and each stratum yields ~50
    * docs regardless of its size. All integer (cumulative window sum +
    * floor division): no RNG, reproducible bit-for-bit across engines and
    * re-runs — the property an audit trail needs from a sampling step.
    *
    * Scale shape: one shuffle partitioned BY STRATUM for the running sum
    * (strata process in parallel — there is deliberately no global
    * cumsum), one map-side-combined per-stratum total joined back
    * broadcast. Selected rows are ~50·|strata| however large the input. */
  def ppsSample(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("w"))
    val win = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = t.groupBy(col("lang")).agg(sum(col("w")).as("wl"))
    t.withColumn("cw", sum(col("w")).over(win))
      .join(broadcast(tot), Seq("lang"))
      .withColumn("step", greatest(expr("wl div 50"), lit(1L)))
      .where(expr("cw div step > (cw - w) div step"))
      .select(col("doc_id"), col("lang"), col("w"), col("cw"))
  }

  private val ppsSampleSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, w,
      |    sum(w) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      |  FROM t),
      |s AS (SELECT lang, greatest(sum(w) // 50, 1) AS step FROM t GROUP BY 1)
      |SELECT c.doc_id, c.lang, c.w, CAST(c.cw AS BIGINT) AS cw
      |FROM c JOIN s ON c.lang = s.lang
      |WHERE c.cw // s.step > (c.cw - c.w) // s.step""".stripMargin

  /** q146: WEIGHTED median — per source, the token-weighted median
    * character length: the smallest n_chars value L where the documents
    * with n_chars ≤ L carry at least half the source's token mass. The
    * robust "typical document" statistic mixture dashboards want (a
    * plain median over-weights short docs; token-weighting answers
    * "what does the median TOKEN live in"). Exact integers throughout:
    * the crossing rule is 2·cumweight ≥ total on a deterministic
    * (n_chars, doc_id) order, so no interpolation and no floats.
    *
    * Scale shape: one window partitioned BY SOURCE (strata in
    * parallel, the q142 shape), per-source totals map-side-combined and
    * broadcast back, and the qualifying-rows min collapses in partial
    * aggregation — the crossing row's value IS min(n_chars) over rows
    * past the crossing, so no argmin composite is needed. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("w"))
    val win = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = t.groupBy(col("source")).agg(sum(col("w")).as("tw"))
    t.withColumn("cw", sum(col("w")).over(win))
      .join(broadcast(tot), Seq("source"))
      .where(col("cw") * 2 >= col("tw"))
      .groupBy(col("source"))
      .agg(min(col("n_chars")).as("wmedian_chars"),
        max(col("tw")).as("total_tokens"))
  }

  private val weightedMedianSql =
    """WITH t AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |  FROM documents),
      |c AS (
      |  SELECT source, n_chars,
      |    sum(w) OVER (PARTITION BY source ORDER BY n_chars, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      |  FROM t),
      |s AS (SELECT source, sum(w) AS tw FROM t GROUP BY 1)
      |SELECT c.source, min(c.n_chars) AS wmedian_chars,
      |  CAST(max(s.tw) AS BIGINT) AS total_tokens
      |FROM c JOIN s ON c.source = s.source
      |WHERE c.cw * 2 >= s.tw
      |GROUP BY c.source""".stripMargin

  /** q149: VOCABULARY ENCODING — the tokenizer-adjacent preprocessing
    * step of a training pipeline: build a frequency-ranked id table
    * (top-1000 tokens, deterministic (count desc, token) rank), encode
    * every document as its id sequence (OOV → 0), and emit per-doc
    * audit columns: token/OOV counts and an md5 fingerprint of the
    * exact encoded sequence — the thing a byte-stable data pipeline
    * checkpoints so a vocab or tokenizer change is a visible diff, not
    * a silent drift.
    *
    * Scale shape: the vocab head is a distributed TakeOrdered then a
    * 1000-row broadcast (the q141 grid pattern); encoding is a
    * scan-local broadcast-hash left join per token; sequence reassembly
    * is ONE doc-keyed shuffle (`collect_list` of (pos, id) structs,
    * `array_sort`ed — bounded by document length). */
  def vocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "t")
      .where(col("t") =!= "")
    val counts = toks.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    val vocab = counts.orderBy(col("cnt").desc, col("t").asc).limit(1000)
      .withColumn("tid", row_number().over(
        Window.orderBy(col("cnt").desc, col("t").asc)).cast("long"))
      .select(col("t"), col("tid"))
    toks.join(broadcast(vocab), Seq("t"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("tid"), lit(0L)).as("tid"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count_if(col("tid") === 0L).as("n_oov"),
        md5(expr("""array_join(
          |  transform(array_sort(collect_list(struct(pos, tid))),
          |    x -> cast(x.tid AS string)), ',')""".stripMargin)).as("enc_fp"))
  }

  /** Merges learned per (session, sf) — the trained artifact, like a saved
    * tokenizer. 16 merges keeps the K driver-coordinated iterations cheap
    * while still exercising multi-level merges (merged symbols re-merging). */
  private val BpeMerges = 16

  /** The trained merge table as a broadcastable rank map, memoized per
    * (session, sf) — q159 grades the training, q162 applies it to the
    * corpus; both read this one artifact. */
  private def bpeRankTable(spark: SparkSession, dir: String)
      : Map[(String, String), Int] = {
    import spark.implicits._
    val mergesDf = Memo("bpe_merges", spark, dir) {
      val ws = Tables(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("t"))
        .where(col("t") =!= "")
        .groupBy(col("t")).agg(count(lit(1)).as("freq"))
        .select(col("t").as("w"), col("freq"))
      val m = graft.operators.Bpe.train(spark, ws, BpeMerges)
      m.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
        .toDF("rank", "a", "b").coalesce(1).localCheckpoint()
    }
    mergesDf.collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .zipWithIndex.toMap
  }

  /** q159: REAL BPE TOKENIZER — `Bpe.train` learns [[BpeMerges]] merges
    * from the word-frequency table (one distributed pair-count job per
    * rank, one row collected each), then the broadcast rank table encodes
    * every word with the standard greedy lowest-rank loop. Graded the
    * q47b way: the exact corpus measures (word/char instance totals,
    * distinct character count) recompute in DuckDB, and the learned
    * tokenizer's defining invariants are emitted as booleans the oracle
    * pins TRUE —
    *   - `all_roundtrip`: concat(encode(w)) == w for EVERY vocabulary word
    *     (BPE merges only ever concatenate adjacent spans, so a broken
    *     merge table or encoder loop flips this);
    *   - `tokens_lt_chars`: the encoded corpus is strictly shorter than
    *     its characters (the top-ranked merge occurs by construction);
    *   - `tokens_ge_words`: no word encodes to zero tokens;
    *   - `vocab_bounded`: distinct output symbols ≤ distinct chars + K
    *     (each merge introduces exactly one new symbol type);
    * plus `n_merges`, pinned to K — if the corpus ever fails to support K
    * merges the early-stop surfaces here as a hash mismatch instead of
    * silently shipping a smaller tokenizer. The closed-form merge
    * sequence itself is pinned in `AnalyticsExtrasSpec`. */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
    val words = toks.groupBy(col("t")).agg(count(lit(1)).as("freq"))
      .select(col("t").as("w"), col("freq"))
    val rank = bpeRankTable(spark, dir)
    val bc = spark.sparkContext.broadcast(rank)
    val enc = words.as[(String, Long)].map { case (w, f) =>
      val ts = graft.operators.Bpe.encode(w, bc.value)
      (w, f, ts.length.toLong, ts.mkString == w, ts)
    }.toDF("w", "freq", "n_toks", "rt", "toks")
      .localCheckpoint() // three consumers below; vocab-sized
    val types = enc.select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("n_token_types"))
    val charTypes = toks
      .select(explode(split(col("t"), "")).as("c"))
      .where(col("c") =!= "")
      .agg(countDistinct(col("c")).as("n_char_types"))
    enc.agg(
        sum(col("freq")).as("n_words"),
        sum(col("freq") * length(col("w"))).as("n_chars"),
        sum(col("freq") * col("n_toks")).as("n_toks_total"),
        min(col("rt").cast("int")).as("rt_min"))
      .crossJoin(broadcast(types))
      .crossJoin(broadcast(charTypes))
      .select(
        col("n_words").cast("long").as("n_words"),
        col("n_chars").cast("long").as("n_chars"),
        col("n_char_types").cast("long").as("n_char_types"),
        lit(rank.size.toLong).as("n_merges"),
        (col("rt_min") === 1).as("all_roundtrip"),
        (col("n_toks_total") < col("n_chars")).as("tokens_lt_chars"),
        (col("n_toks_total") >= col("n_words")).as("tokens_ge_words"),
        (col("n_token_types") <= col("n_char_types") + lit(BpeMerges))
          .as("vocab_bounded"))
  }

  /** q162: TOKENIZER APPLICATION AT CORPUS SCALE — the step between
    * training a tokenizer (q159) and consuming token budgets (q59/q87):
    * per-document BPE token counts for every document. The scale shape is
    * the point: each DISTINCT word is encoded exactly once (the q159
    * vocabulary pass, already memoized with the merge table), and
    * documents get their counts by exploding to words and joining the
    * BROADCAST word→token-count map — the corpus is never re-encoded per
    * occurrence, and the only shuffle is the per-doc sum. At 100 TB the
    * word-count map stays dimension-sized while the doc side streams
    * through scan+join+partial-agg.
    *
    * Graded per document: `n_words`/`n_chars` recompute exactly in the
    * oracle, and the learned-artifact columns collapse to per-doc
    * THEOREM booleans pinned TRUE (every word is 1..len(word) tokens, so
    * n_words ≤ n_tokens ≤ n_chars; a corrupt merge table or encode loop
    * breaks one inequality for some doc and flips that row's hash). */
  def bpeDocTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bpeRankTable(spark, dir))
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
    val wordTokens = toks.select(col("t")).distinct().as[String]
      .map(w => (w, graft.operators.Bpe.encode(w, bc.value).length.toLong))
      .toDF("t", "w_tokens")
    toks.join(broadcast(wordTokens), Seq("t"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("t"))).cast("long").as("n_chars"),
        sum(col("w_tokens")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        (col("n_tokens") >= col("n_words")).as("tokens_ge_words"),
        (col("n_tokens") <= col("n_chars")).as("tokens_le_chars"))
  }

  private val bpeDocTokensSql =
    """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(len(t)) AS BIGINT) AS n_chars,
      |  TRUE AS tokens_ge_words, TRUE AS tokens_le_chars
      |FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) x
      |WHERE t <> ''
      |GROUP BY doc_id""".stripMargin

  /** q160: LINEAR QUALITY CLASSIFIER INFERENCE — the fasttext-shaped
    * model-scoring pass every production curation pipeline runs over its
    * full corpus (quality/toxicity/domain classifiers): bag of hashed
    * unigram+bigram features, a weight per hash bucket, document score =
    * Σ w(bucket(feature)).
    *
    * The Spark-first point is the PLAN: the whole inference is one
    * codegen'd scan pass — features, hashing, bucket lookup, and the
    * weighted sum all run INSIDE higher-order array functions on the
    * projected `text` column. Zero shuffles, zero UDFs, no explode (the
    * per-feature row blowup never materializes); at 100 TB this is the
    * optimal shape — embarrassingly parallel, bandwidth-bound, and a real
    * trained model drops in as a broadcast weight array without touching
    * the plan. Here the weight table is the deterministic function
    * `w(b) = (b·31 + 7) mod 1999 − 999` of the bucket id (integer in
    * [−999, 999]) so the oracle reproduces the scores EXACTLY — integer
    * feature hashing (the md5 trick shared with the dedup family) and
    * integer weights make the whole inference hash-comparable, which a
    * float model would never be cross-engine. */
  def linearQuality(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x <> '')").as("ws"))
      .select(col("doc_id"),
        expr("""concat(ws, CASE WHEN size(ws) >= 2
                THEN transform(sequence(0, size(ws) - 2),
                  i -> concat(ws[i], '_', ws[i+1]))
                ELSE array() END)""").as("feats"))
      .select(col("doc_id"),
        size(col("feats")).cast("long").as("n_feats"),
        expr("""aggregate(
                transform(feats,
                  t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint) % 1024L),
                0L,
                (acc, b) -> acc + ((b * 31L + 7L) % 1999L - 999L))""")
          .as("score"))
      .select(col("doc_id"), col("n_feats"), col("score"),
        (col("score") > 0L).as("keep"))

  private val linearQualitySql =
    """WITH f AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    list_concat(ws, list_transform(range(1, len(ws)),
      |      i -> ws[i] || '_' || ws[i+1])) AS feats
      |  FROM f)
      |SELECT doc_id, CAST(len(feats) AS BIGINT) AS n_feats,
      |  CAST(coalesce(list_sum(list_transform(feats,
      |    t -> ((('0x' || substr(md5(t), 1, 15))::BIGINT % 1024) * 31 + 7)
      |      % 1999 - 999)), 0) AS BIGINT) AS score,
      |  CAST(coalesce(list_sum(list_transform(feats,
      |    t -> ((('0x' || substr(md5(t), 1, 15))::BIGINT % 1024) * 31 + 7)
      |      % 1999 - 999)), 0) AS BIGINT) > 0 AS keep
      |FROM g""".stripMargin

  private val bpeTokenizeSql =
    """WITH tok AS (
      |  SELECT t FROM (
      |    SELECT unnest(string_split(text, ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |chars AS (SELECT unnest(string_split(t, '')) AS c FROM tok)
      |SELECT CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(len(t)) AS BIGINT) AS n_chars,
      |  (SELECT CAST(count(DISTINCT c) AS BIGINT) FROM chars) AS n_char_types,
      |  CAST(16 AS BIGINT) AS n_merges,
      |  TRUE AS all_roundtrip, TRUE AS tokens_lt_chars,
      |  TRUE AS tokens_ge_words, TRUE AS vocab_bounded
      |FROM tok""".stripMargin

  private val vocabEncodeSql =
    """WITH tok AS (
      |  SELECT doc_id, t, pos FROM (
      |    SELECT doc_id,
      |      unnest(string_split(text, ' ')) AS t,
      |      unnest(range(0, len(string_split(text, ' ')))) AS pos
      |    FROM documents) x
      |  WHERE t <> ''),
      |counts AS (SELECT t, count(*) AS cnt FROM tok GROUP BY 1),
      |vocab AS (
      |  SELECT t, rn AS tid FROM (
      |    SELECT t, row_number() OVER (ORDER BY cnt DESC, t) AS rn
      |    FROM counts) r
      |  WHERE rn <= 1000),
      |enc AS (
      |  SELECT doc_id, pos, coalesce(v.tid, 0) AS tid
      |  FROM tok LEFT JOIN vocab v USING (t))
      |SELECT doc_id, count(*) AS n_tokens,
      |  count(*) FILTER (WHERE tid = 0) AS n_oov,
      |  md5(array_to_string(
      |    list_transform(list(tid ORDER BY pos), x -> CAST(x AS VARCHAR)),
      |    ',')) AS enc_fp
      |FROM enc GROUP BY doc_id""".stripMargin

  /** q150: LENGTH-BUCKETED BATCH SHAPING — quantify the padding saved by
    * length-sorted batching (batch = 32 docs, padded to its max length):
    * the exact-integer padding-waste ppm under (a) length-sorted order
    * and (b) naive arrival order, per language. The sorted number is why
    * every serious training loader length-buckets; emitting both makes
    * the saving an auditable, hash-gated quantity instead of folklore.
    *
    * Scale shape: both orders are windows partitioned BY LANGUAGE (the
    * q142 stratum-parallel shape, one exchange feeding two sorts); batch
    * stats partial-aggregate; the final per-language join is
    * |langs|-sized. The ppm arithmetic runs the (padded − total) product
    * through DECIMAL(38,0) — 10⁶·tokens passes int64 at ~10 TB. */
  def batchShaping(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("w"))
    def wastePpm(orderCols: Seq[org.apache.spark.sql.Column],
                 alias: String): DataFrame = {
      val win = Window.partitionBy(col("lang")).orderBy(orderCols: _*)
      t.withColumn("rn", row_number().over(win))
        .withColumn("bid", expr("CAST((rn - 1) div 32 AS BIGINT)"))
        .groupBy(col("lang"), col("bid"))
        .agg(count(lit(1)).as("bsz"), sum(col("w")).as("toks"),
          max(col("w")).as("mx"))
        .groupBy(col("lang"))
        .agg(sum(col("toks")).as("total_tokens"),
          sum(col("mx") * col("bsz")).as("padded"),
          count(lit(1)).as("n_batches"))
        .select(col("lang"), col("n_batches"), col("total_tokens"),
          expr("""CAST(1000000 * CAST(padded - total_tokens AS DECIMAL(38,0))
            |  div padded AS BIGINT)""".stripMargin).as(alias))
    }
    val sorted = wastePpm(Seq(col("w").asc, col("doc_id").asc), "sorted_ppm")
    val naive = wastePpm(Seq(col("doc_id").asc), "naive_ppm")
      .select(col("lang"), col("naive_ppm"))
    sorted.join(naive, Seq("lang"))
  }

  private val batchShapingSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |  FROM documents),
      |rs AS (
      |  SELECT lang, w, (row_number() OVER (
      |    PARTITION BY lang ORDER BY w, doc_id) - 1) // 32 AS bid FROM t),
      |bs AS (
      |  SELECT lang, bid, count(*) AS bsz, sum(w) AS toks, max(w) AS mx
      |  FROM rs GROUP BY 1, 2),
      |s AS (
      |  SELECT lang, count(*) AS n_batches,
      |    CAST(sum(toks) AS BIGINT) AS total_tokens,
      |    CAST((1000000 * (sum(mx * bsz) - sum(toks))) // sum(mx * bsz)
      |      AS BIGINT) AS sorted_ppm
      |  FROM bs GROUP BY 1),
      |rn AS (
      |  SELECT lang, w, (row_number() OVER (
      |    PARTITION BY lang ORDER BY doc_id) - 1) // 32 AS bid FROM t),
      |bn AS (
      |  SELECT lang, bid, count(*) AS bsz, sum(w) AS toks, max(w) AS mx
      |  FROM rn GROUP BY 1, 2),
      |n AS (
      |  SELECT lang,
      |    CAST((1000000 * (sum(mx * bsz) - sum(toks))) // sum(mx * bsz)
      |      AS BIGINT) AS naive_ppm
      |  FROM bn GROUP BY 1)
      |SELECT s.lang, s.n_batches, s.total_tokens, s.sorted_ppm, n.naive_ppm
      |FROM s JOIN n ON s.lang = n.lang""".stripMargin

  // ---- q165: temperature-scaled source mixing -----------------------------

  /** q165: temperature-scaled multinomial source mixing — the data-mixing
    * rule from the GPT-3 / XLM-R recipes: sample source s with probability
    * proportional to (tokens_s)^alpha, alpha = 0.5, which up-weights small
    * sources relative to their natural share. One map-side-combined
    * groupBy over the corpus produces the per-source token totals (a
    * #sources-row table); everything after is arithmetic on that tiny
    * table, so the op is scan-bound at any corpus size.
    *
    * Exactness: alpha = 0.5 is computed as IEEE `sqrt`, which (unlike
    * log/exp) is CORRECTLY ROUNDED and therefore bit-identical in Spark and
    * DuckDB; the sqrt is taken of a micro-scaled integer and floored back
    * to BIGINT, and all normalization (`p_ppm`, `upsample_k`) stays in
    * exact integer division — the whole result hash-gates with zero
    * float-accumulation risk. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables(spark, dir, "documents")
      .select(col("source"),
        expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long")
          .as("ntok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tok"))
      // milli-scaled integer sqrt: floor(sqrt(tok) * 1000). Both engines
      // compute the identical correctly-rounded sqrt double, so the scaled
      // floor is identical too; scaling OUTSIDE the sqrt keeps the chain
      // overflow-free for any BIGINT token total (tok is cast to double,
      // exact below 2^53 — i.e. for any corpus under ~9e15 tokens).
      .withColumn("w_sqrt",
        floor(sqrt(col("tok").cast("double")) * lit(1000)).cast("long"))
      // materialize the #sources-row table: without this, the totals
      // branch below re-derives it from the corpus and the plan scans +
      // shuffles the full corpus TWICE (caught by the PlanSpec gate)
      .localCheckpoint()
    val totals = perSource.agg(
      sum(col("w_sqrt")).as("w_total"), sum(col("tok")).as("tok_total"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tok"), col("w_sqrt"),
        expr("(w_sqrt * 1000000) div w_total").cast("long").as("p_ppm"),
        // upsample factor vs natural share, milli-scaled:
        // (p_s / (tok_s / T)) * 1000 = (w_s/W) * (T/tok_s) * 1000.
        // Computed as a LEFT-ASSOCIATIVE double chain (each step is a
        // single IEEE op on bit-identical inputs, so the floor is
        // cross-engine deterministic) rather than integer products, which
        // would overflow BIGINT once W * T * 1000 passes 2^63 — doubles
        // never overflow, and every operand here is an exact integer
        // below 2^53.
        floor(col("w_sqrt").cast("double") / col("w_total") *
          col("tok_total") / col("tok") * lit(1000)).cast("long")
          .as("upsample_k"))
  }

  private val temperatureMixSql =
    """WITH per_source AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> '')))
      |      AS BIGINT) AS tok
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_docs, tok,
      |    CAST(floor(sqrt(CAST(tok AS DOUBLE)) * 1000) AS BIGINT) AS w_sqrt
      |  FROM per_source),
      |tot AS (
      |  SELECT CAST(sum(w_sqrt) AS BIGINT) AS w_total,
      |    CAST(sum(tok) AS BIGINT) AS tok_total FROM w)
      |SELECT w.source, w.n_docs, w.tok, w.w_sqrt,
      |  CAST((w.w_sqrt * 1000000) // t.w_total AS BIGINT) AS p_ppm,
      |  CAST(floor(CAST(w.w_sqrt AS DOUBLE) / t.w_total * t.tok_total
      |    / w.tok * 1000) AS BIGINT) AS upsample_k
      |FROM w CROSS JOIN tot t""".stripMargin

  // ---- q166: lexical diversity (Simpson index) ----------------------------

  /** q166: per-document lexical diversity via the Simpson index
    * 1 - sum(c_i^2)/N^2 over the token histogram — the exact-arithmetic
    * member of the diversity-filter family (Shannon entropy needs log,
    * which is not cross-engine deterministic; Simpson is a pure integer
    * ratio and gives the same ordering signal). Computed entirely with
    * higher-order array functions on the tokenized document — zero
    * shuffles, scan-bound at any corpus size, same discipline as the q88
    * repetition filters. The keep flag (diversity >= 0.5 with >= 5 tokens)
    * is the "not dominated by few types" gate. */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"),
        expr(
          """aggregate(
            |  transform(array_distinct(toks),
            |    d -> cast(size(filter(toks, x -> x = d)) AS bigint)),
            |  cast(0 AS bigint), (acc, c) -> acc + c * c)""".stripMargin)
          .as("sum_sq"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("sum_sq"),
        (lit(1.0) - col("sum_sq").cast("double") /
          (col("n_tokens") * col("n_tokens"))).as("simpson"),
        (col("n_tokens") >= 5 &&
          (lit(1.0) - col("sum_sq").cast("double") /
            (col("n_tokens") * col("n_tokens"))) >= 0.5).as("keep"))

  private val lexicalDiversitySql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents
      |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 1),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
      |    CAST(list_sum(list_transform(list_distinct(toks),
      |      d -> len(list_filter(toks, x -> x = d))
      |           * len(list_filter(toks, x -> x = d)))) AS BIGINT) AS sum_sq
      |  FROM t)
      |SELECT doc_id, n_tokens, n_types, sum_sq,
      |  1.0 - CAST(sum_sq AS DOUBLE) / (n_tokens * n_tokens) AS simpson,
      |  n_tokens >= 5 AND
      |    1.0 - CAST(sum_sq AS DOUBLE) / (n_tokens * n_tokens) >= 0.5 AS keep
      |FROM m""".stripMargin

  // ---- q167: bigram familiarity (linear-space LM scoring) -----------------

  /** q167: corpus-bigram-model document scoring — the linear-space
    * perplexity proxy: train bigram counts over the whole corpus (one
    * map-side-combined groupBy), then score each document by the MEAN
    * corpus frequency of its bigram occurrences. Low scores mark documents
    * whose word transitions are rare in the corpus (boilerplate, noise,
    * wrong-language) — the same signal the CCNet/KenLM perplexity filter
    * uses, kept in exact integer space (a true log-prob needs log, which
    * is not cross-engine deterministic).
    *
    * Plan shape: doc-side bigram occurrences are PRE-AGGREGATED per
    * (doc_id, bigram) before the model join, so the join input is the
    * distinct-bigrams-per-doc table, not the raw token stream; the join is
    * key-partitioned on the bigram (both sides shuffle once on the same
    * key — no broadcast, the model is corpus-vocabulary-sized), and the
    * final per-doc reduce is map-side combined. At 100 TB this is two
    * keyed shuffles of token-derived tables and nothing quadratic. */
  def bigramFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val bg = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
          |  i -> concat(toks[i], ' ', toks[i + 1]))""".stripMargin)).as("b"))
    // ONE tokenization: the model is the per-doc count table re-aggregated
    // (Σ over docs of per-doc bigram counts IS the corpus count), so both
    // join inputs share the per-doc exchange instead of exploding the
    // corpus twice (b.isNotNull pinned so the join's pushed filter cannot
    // de-canonicalize the shared subtree)
    val perDoc = bg.where(col("b").isNotNull)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("k"))
    val model = perDoc.groupBy(col("b")).agg(sum(col("k")).as("cnt"))
    perDoc.join(model, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("k")).as("sum_cnt"),
        sum(col("k")).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_cnt"),
        expr("(sum_cnt * 1000) div n_bigrams").cast("long").as("fam_k"),
        (col("sum_cnt").cast("double") / col("n_bigrams")).as("fam_mean"))
  }

  private val bigramFamiliaritySql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS t,
      |    unnest(range(1, len(list_filter(string_split(lower(text), ' '), t -> t <> '')) + 1)) AS ord
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, t || ' ' || lead(t) OVER (
      |    PARTITION BY doc_id ORDER BY ord) AS b
      |  FROM toks),
      |occ AS (SELECT doc_id, b FROM bg WHERE b IS NOT NULL),
      |model AS (SELECT b, count(*) AS cnt FROM occ GROUP BY b),
      |per_doc AS (SELECT doc_id, b, count(*) AS k FROM occ GROUP BY doc_id, b),
      |agg AS (
      |  SELECT p.doc_id, CAST(sum(m.cnt * p.k) AS BIGINT) AS sum_cnt,
      |    CAST(sum(p.k) AS BIGINT) AS n_bigrams
      |  FROM per_doc p JOIN model m ON p.b = m.b
      |  GROUP BY p.doc_id)
      |SELECT doc_id, n_bigrams, sum_cnt,
      |  CAST((sum_cnt * 1000) // n_bigrams AS BIGINT) AS fam_k,
      |  CAST(sum_cnt AS DOUBLE) / n_bigrams AS fam_mean
      |FROM agg""".stripMargin

  // ---- q170: global exact-k uniform sample ---------------------------------

  /** q170: exactly-k uniform corpus sample — the global companion of q69's
    * per-stratum exact-k: order by the seedless md5 hash (doc_id tiebreak,
    * though the hash is already injective-in-practice) and keep the first
    * k. The plan MUST be TakeOrderedAndProject — per-partition top-k
    * heaps, k rows to the driver-side merge — never a full global sort,
    * which is the difference between O(k) memory and a corpus shuffle at
    * 100 TB (`PlanSpec` pins the operator). Same deterministic recipe as
    * q37/q58/q69, so any cluster shape reproduces the same sample. */
  def exactKSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(100)

  private val exactKSampleSql =
    """SELECT doc_id, source,
      |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
      |FROM documents
      |ORDER BY h, doc_id
      |LIMIT 100""".stripMargin

  // ---- q171: streaming mix monitor -----------------------------------------

  /** q171: q165's STREAMING twin — the mixing weights recomputed as data
    * lands: per-source document/token totals accumulate in the streaming
    * aggregation state store across micro-batches (complete mode — the
    * running-dashboard shape), and the temperature arithmetic is applied
    * to the FINAL state, so a bounded run must equal the q165 batch
    * computation exactly (the oracle IS q165's SQL). At scale the state
    * is one row per source — the smallest state any monitor can carry —
    * and each micro-batch shuffles only its own per-source partials. */
  def streamMixMonitor(spark: SparkSession, dir: String): DataFrame = {
    val totals = graft.streaming.EventStreams.boundedDocStreamRun(spark, dir,
      (s, _) => s
        .select(col("source"),
          expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long")
            .as("ntok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tok")),
      "complete")
      .withColumn("w_sqrt",
        floor(sqrt(col("tok").cast("double")) * lit(1000)).cast("long"))
      .localCheckpoint()
    val tot = totals.agg(
      sum(col("w_sqrt")).as("w_total"), sum(col("tok")).as("tok_total"))
    totals.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tok"), col("w_sqrt"),
        expr("(w_sqrt * 1000000) div w_total").cast("long").as("p_ppm"),
        floor(col("w_sqrt").cast("double") / col("w_total") *
          col("tok_total") / col("tok") * lit(1000)).cast("long")
          .as("upsample_k"))
  }

  // ---- q172: stride chunking -----------------------------------------------

  /** q172: fixed-length sequence chunking with overlap — the pretraining
    * staple q87's packing does NOT cover: a document longer than the
    * context window is split into L-token windows advancing by stride S
    * (overlap L−S), so no token is lost at window boundaries. Chunk count
    * and offsets are closed-form exact integers
    * (n_win = 1 if n ≤ L else ⌈(n−L)/S⌉+1, start = i·S,
    * len = min(L, n−start)), generated scan-locally by exploding an index
    * `sequence` — zero shuffles, row growth ≈ n/S per doc, the only
    * acceptable cost for a pass over the full corpus. The last window
    * always reaches the final token ((n_win−1)·S + L ≥ n by
    * construction — pinned in `PropertySpec`). */
  def chunkStride(spark: SparkSession, dir: String): DataFrame = {
    val L = 128L
    val S = 96L
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long")
          .as("n_tok"))
      .where(col("n_tok") >= 1)
      .withColumn("n_win",
        when(col("n_tok") <= L, lit(1L))
          .otherwise(expr(s"((n_tok - $L + $S - 1) div $S) + 1")))
      .select(col("doc_id"), col("n_tok"), col("n_win"),
        explode(expr("sequence(0, n_win - 1)")).as("chunk_id"))
      .select(col("doc_id"), col("n_tok"), col("n_win"), col("chunk_id"),
        (col("chunk_id") * S).as("tok_start"),
        least(lit(L), col("n_tok") - col("chunk_id") * S).as("tok_len"),
        (col("chunk_id") === col("n_win") - 1).as("is_last"))
  }

  private val chunkStrideSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS n_tok
      |  FROM documents
      |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 1),
      |w AS (
      |  SELECT doc_id, n_tok,
      |    CASE WHEN n_tok <= 128 THEN 1
      |         ELSE (n_tok - 128 + 95) // 96 + 1 END AS n_win
      |  FROM t)
      |SELECT doc_id, n_tok, n_win, g.chunk_id,
      |  g.chunk_id * 96 AS tok_start,
      |  least(128, n_tok - g.chunk_id * 96) AS tok_len,
      |  g.chunk_id = n_win - 1 AS is_last
      |FROM w, LATERAL unnest(generate_series(0, n_win - 1)) AS g(chunk_id)""".stripMargin

  // ---- q177: curation filter funnel ----------------------------------------

  /** q177: the FILTER FUNNEL — the survival report every curation pipeline
    * publishes: how many documents pass each successive quality gate
    * (length → repetition → lexical diversity → language), with the drop
    * at each stage. The gates are the exact-integer rules of the
    * component queries (q89/q88/q166/q70 family), all evaluated in ONE
    * scan pass (every flag is a higher-order array expression over the
    * same tokenization); the funnel itself is one global aggregate of
    * flag conjunctions, so the whole report costs a single corpus scan +
    * a 1-row reduce at any scale. Stages are cumulative (a doc counts at
    * stage k only if it passed 1..k) — that is what makes it a funnel. */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val toks = expr("filter(split(lower(text), ' '), x -> x <> '')")
    val flagged = Tables(spark, dir, "documents")
      .select(toks.as("toks"))
      .select(size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"),
        expr(
          """aggregate(
            |  transform(array_distinct(toks),
            |    d -> cast(size(filter(toks, x -> x = d)) AS bigint)),
            |  cast(0 AS bigint), (acc, c) -> acc + c * c)""".stripMargin)
          .as("sum_sq"),
        expr(s"size(filter(toks, x -> x IN (${inList(stopwords)})))")
          .cast("long").as("n_stop"))
      .select(
        (col("n_tok") >= 5 && col("n_tok") <= 10000).as("f_len"),
        // dup-token fraction <= 0.6  <=>  5 * n_types >= 2 * n_tok
        (col("n_types") * 5L >= col("n_tok") * 2L).as("f_rep"),
        // simpson >= 0.5  <=>  2 * sum_sq <= n_tok^2 (exact integer form)
        (col("sum_sq") * 2L <= col("n_tok") * col("n_tok")).as("f_div"),
        // stopword ratio >= 0.04  <=>  25 * n_stop >= n_tok
        (col("n_stop") * 25L >= col("n_tok")).as("f_lang"))
    val agg = flagged.agg(
      count(lit(1)).as("n0"),
      sum(when(col("f_len"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("f_len") && col("f_rep"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("f_len") && col("f_rep") && col("f_div"), 1L)
        .otherwise(0L)).as("n3"),
      sum(when(col("f_len") && col("f_rep") && col("f_div") && col("f_lang"),
        1L).otherwise(0L)).as("n4"))
    agg.select(expr(
      """stack(5,
        |  0L, 'total',      n0, cast(0 AS bigint),
        |  1L, 'length',     n1, n0 - n1,
        |  2L, 'repetition', n2, n1 - n2,
        |  3L, 'diversity',  n3, n2 - n3,
        |  4L, 'language',   n4, n3 - n4)
        |AS (stage_id, stage, n_surviving, n_dropped)""".stripMargin))
  }

  private val filterFunnelSql =
    s"""WITH f AS (
       |  SELECT
       |    CAST(len(toks) AS BIGINT) AS n_tok,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
       |    CAST(list_sum(list_transform(list_distinct(toks),
       |      d -> len(list_filter(toks, x -> x = d))
       |           * len(list_filter(toks, x -> x = d)))) AS BIGINT) AS sum_sq,
       |    CAST(len(list_filter(toks, x -> x IN (${inList(stopwords)})))
       |      AS BIGINT) AS n_stop
       |  FROM (SELECT list_filter(string_split(lower(text), ' '),
       |    x -> x <> '') AS toks FROM documents)),
       |g AS (
       |  SELECT n_tok >= 5 AND n_tok <= 10000 AS f_len,
       |    n_types * 5 >= n_tok * 2 AS f_rep,
       |    sum_sq * 2 <= n_tok * n_tok AS f_div,
       |    n_stop * 25 >= n_tok AS f_lang
       |  FROM f),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN f_len AND f_rep THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n2,
       |    CAST(sum(CASE WHEN f_len AND f_rep AND f_div THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN f_len AND f_rep AND f_div AND f_lang
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM g)
       |SELECT s.stage_id, s.stage, s.n_surviving, s.n_dropped FROM a,
       |LATERAL (VALUES
       |  (CAST(0 AS BIGINT), 'total',      a.n0, CAST(0 AS BIGINT)),
       |  (CAST(1 AS BIGINT), 'length',     a.n1, a.n0 - a.n1),
       |  (CAST(2 AS BIGINT), 'repetition', a.n2, a.n1 - a.n2),
       |  (CAST(3 AS BIGINT), 'diversity',  a.n3, a.n2 - a.n3),
       |  (CAST(4 AS BIGINT), 'language',   a.n4, a.n3 - a.n4))
       |  AS s(stage_id, stage, n_surviving, n_dropped)""".stripMargin

  // ---- q178: BM25 ranked retrieval (linear-space idf) ----------------------

  /** The BM25 per-term document score with every float literal pinned to
    * DOUBLE (Spark and DuckDB both parse a bare `2.2` as DECIMAL, which
    * would silently switch the arithmetic to decimal rules on one side)
    * and every integer→double conversion written as an explicit CAST, so
    * both engines evaluate the IDENTICAL IEEE expression tree: all inputs
    * are exact integers ≤ 2^53 and each double op is correctly rounded,
    * so the score is bit-deterministic. The idf factor is the Robertson
    * ratio (2N − 2df + 1)/(2df + 1) WITHOUT the log — libm log is not
    * cross-engine reproducible (the q66/q167 discipline); per-term
    * rankings are unchanged since log is monotone, and the engine never
    * sums scores ACROSS terms (each output row is one (term, doc) pair),
    * so the missing log cannot reorder anything it emits. */
  private val bm25ScoreExpr =
    """(CAST(2 * nd - 2 * df + 1 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE))
      | * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
      |    / (CAST(tf AS DOUBLE)
      |       + CAST(1.2 AS DOUBLE)
      |         * (CAST(0.25 AS DOUBLE)
      |            + CAST(0.75 AS DOUBLE)
      |              * (CAST(dl * nd AS DOUBLE) / CAST(ltot AS DOUBLE)))))"""
      .stripMargin

  /** q178: BM25 ranked retrieval — the search-index op of the curation
    * stack (k1 = 1.2, b = 0.75). The query set is derived from the corpus
    * itself (top-5 document-frequency terms of length ≥ 4, (df desc, term)
    * tie-break), so the query works at any scale factor with no hardcoded
    * corpus literals; a real deployment passes its own term list through
    * the same pipeline.
    *
    * Plan shape, 100 TB first: document length comes from the SAME scan
    * that tokenizes (size of the token array — no separate dl shuffle);
    * corpus totals (N docs, L tokens) are one crossJoin(broadcast(1-row
    * agg)); the df table partial-aggregates map-side; the 5-term query
    * set is a TakeOrdered (5 rows to the driver — planning-scale) whose
    * terms then broadcast-semi-join the token stream, so only matching
    * postings survive into the tf aggregation. The per-term top-10 uses
    * the engine's NATIVE top-k aggregate (`top_k_pairs`, q153's operator)
    * instead of a 5-partition window: map-side partials reduce every
    * partition to ≤ k pairs per term BEFORE the exchange, so the shuffle
    * carries |terms|·k rows at any corpus size — the window form would
    * funnel every posting of every query term through 5 reducers. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
    val stats = docs.agg(count(lit(1)).as("nd"),
      sum(size(col("toks")).cast("long")).as("ltot"))
    // ONE posting aggregation: tf-per-(term, doc) is computed corpus-wide
    // first; df is then its per-term ROW count (one row per posting), so
    // the query-term selection and the scoring side share the posting
    // exchange instead of exploding the corpus twice (t.isNotNull pinned
    // so the broadcast join's pushed filter cannot de-canonicalize it)
    // the length-≥4 query-term universe is pinned on the SHARED posting
    // stream — output-invariant (the scoring side only ever sees query
    // terms, which are length-≥4 by construction; df per term does not
    // depend on other terms) and it keeps the two branches canonically
    // identical, so the posting shuffle runs ONCE and the df side reads
    // a ReusedExchange instead of re-shuffling the corpus
    val tfAll = docs.select(col("doc_id"),
        size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("t"))
      .where(col("t").isNotNull && length(col("t")) >= 4)
      .groupBy(col("t"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    // the query-term stats carry ctf (collection frequency, Σ tf — the
    // standard df companion in an IR index); consuming tf here also keeps
    // this branch's posting aggregate canonically identical to the
    // scoring branch's — a keys-only df (count(1), which prunes tf into
    // a distinct) would silently forfeit the exchange reuse
    val dfreq = tfAll.groupBy(col("t"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ctf"))
    val qt = dfreq.orderBy(col("df").desc, col("t").asc).limit(5)
    val tf = tfAll.join(broadcast(qt), Seq("t"))
    graft.functions.GraftExtensions.registerTopK(spark)
    tf.crossJoin(broadcast(stats))
      .select(col("t"), col("df"), col("ctf"), col("doc_id"),
        expr(bm25ScoreExpr).as("score"))
      .groupBy(col("t"), col("df"), col("ctf"))
      .agg(expr("top_k_pairs(score, doc_id, 10)").as("tk"))
      .select(col("t"), col("df"), col("ctf"), posexplode(col("tk")))
      .select(col("t"), col("df"), col("ctf"), col("col.id").as("doc_id"),
        col("col.score").as("score"), (col("pos") + 1).cast("long").as("rk"))
  }

  private val bm25TopKSql =
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
       |  FROM documents
       |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 1),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(len(toks)) AS BIGINT) AS ltot FROM docs),
       |toks AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS t
       |  FROM docs),
       |tfall AS (
       |  SELECT t, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
       |  FROM toks WHERE length(t) >= 4
       |  GROUP BY t, doc_id, dl),
       |dfreq AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS df,
       |    CAST(sum(tf) AS BIGINT) AS ctf
       |  FROM tfall GROUP BY t),
       |qt AS (SELECT t, df, ctf FROM dfreq ORDER BY df DESC, t LIMIT 5),
       |tf AS (
       |  SELECT a.t, q.df, q.ctf, a.doc_id, a.dl, a.tf
       |  FROM tfall a JOIN qt q ON a.t = q.t),
       |sc AS (
       |  SELECT t, df, ctf, doc_id,
       |    ${bm25ScoreExpr.replace("\n", "\n|    ")} AS score
       |  FROM tf, stats)
       |SELECT t, df, ctf, doc_id, score, rk FROM (
       |  SELECT t, df, ctf, doc_id, score, row_number() OVER (
       |    PARTITION BY t ORDER BY score DESC, doc_id) AS rk
       |  FROM sc) r
       |WHERE rk <= 10""".stripMargin

  // ---- q180: DSIR importance weights (hashed-bigram, linear space) ---------

  /** q180: data-selection importance weights, the DSIR recipe (Xie et al.
    * 2023) kept in the engine's exact-arithmetic house style: hash each
    * word bigram into B = 4096 buckets (the seedless md5 recipe every
    * other hash site uses), fit Laplace-smoothed unigram-over-bucket
    * models for the TARGET slice (sources src0/src1 — the "wiki-like"
    * domain proxy) and the RAW corpus from ONE conditional aggregation
    * pass, and score every document by its mean target/raw likelihood
    * ratio. True DSIR sums log-ratios; libm log is not cross-engine
    * deterministic, so the ratio is kept LINEAR and pre-scaled to parts
    * per million as an exact integer — (cnt_t+1)(Nr+B)·10⁶ div
    * (cnt_r+1)(Nt+B), products carried in DECIMAL(38,0)/HUGEINT where
    * int64 would overflow at corpus scale — and per-doc totals are
    * integer sums, so accumulation order cannot matter. The top-100
    * documents by weight (the resampling pick) are selected via
    * TakeOrdered — per-partition heaps, 100 rows to the driver merge,
    * never a global sort — and flagged with a broadcast semi-join.
    *
    * Plan shape: one bigram tokenization pass feeds BOTH models (the
    * target count is a `sum(CASE WHEN target)` beside the raw count, not
    * a second scan); the fitted model is B = 4096 rows no matter the
    * corpus — broadcast back onto the per-doc bucket counts; the only
    * full shuffles are the two bounded keyed aggregations (bucket model,
    * per-doc sum). */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // bigram tokenize+hash fuses onto the scan — ONE task on the
    // unsplittable single-file input (0.72 s measured); rebalance first
    // (guide §2.5, no-op on multi-split inputs)
    val bg = Tables.spread(spark, dir, "documents",
        Tables(spark, dir, "documents")
          .select(col("doc_id"), col("source"), col("text")))
      .select(col("doc_id"), col("source").isin("src0", "src1").as("tgt"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), col("tgt"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
          |  i -> concat(toks[i], ' ', toks[i + 1]))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("tgt"),
        (conv(substring(md5(col("b")), 1, 15), 16, 10).cast("long") % 4096L)
          .as("f"))
    // ONE tokenization for the whole query: the per-(doc, bucket) count
    // table is the query's working set — model, totals, ratio, and the
    // per-doc score all derive from it, and it is CHECKPOINTED because
    // FIVE downstream consumers would otherwise each re-explode the
    // corpus (measured: 9 scans → 1). Its size is docs × distinct
    // buckets (≤ B = 4096) — the pre-aggregated feature table, orders
    // of magnitude under the raw token stream at any corpus size.
    val perDocF = bg.groupBy(col("doc_id"), col("tgt"), col("f"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    val model = perDocF.groupBy(col("f")).agg(
      sum(col("k")).as("cnt_r"),
      sum(when(col("tgt"), col("k")).otherwise(0L)).as("cnt_t"))
    val totals = model.agg(sum(col("cnt_r")).cast("long").as("nr"),
      sum(col("cnt_t")).cast("long").as("nt"))
    val ratio = model.crossJoin(broadcast(totals))
      .select(col("f"), expr(
        """CAST((CAST(cnt_t + 1 AS DECIMAL(38,0)) * CAST(nr + 4096 AS DECIMAL(38,0))
          |  * CAST(1000000 AS DECIMAL(38,0)))
          | div (CAST(cnt_r + 1 AS DECIMAL(38,0)) * CAST(nt + 4096 AS DECIMAL(38,0)))
          | AS BIGINT)""".stripMargin).as("ratio_ppm"))
    val perDoc = perDocF
      .join(broadcast(ratio), Seq("f"))
      .groupBy(col("doc_id"), col("tgt"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum((col("k").cast(d38) * col("ratio_ppm").cast(d38)).cast(d38))
          .cast(d38).as("snum"))
      .select(col("doc_id"), col("tgt"), col("n_bigrams"),
        col("snum").cast("long").as("score_ppm_sum"),
        (col("snum").cast("double") / 1000000.0d / col("n_bigrams")
          .cast("double")).as("weight"))
    val top = perDoc
      .orderBy(col("weight").desc, col("doc_id").asc).limit(100)
      .select(col("doc_id"))
    perDoc.join(broadcast(top.withColumn("selected", lit(true))),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("tgt"), col("n_bigrams"),
        col("score_ppm_sum"), col("weight"),
        coalesce(col("selected"), lit(false)).as("selected"))
  }

  private val dsirWeightsSql =
    """WITH bg0 AS (
      |  SELECT doc_id, source IN ('src0', 'src1') AS tgt,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents
      |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 2),
      |bg AS (
      |  SELECT doc_id, tgt,
      |    ('0x' || substr(md5(b), 1, 15))::BIGINT % 4096 AS f
      |  FROM (
      |    SELECT doc_id, tgt,
      |      unnest(list_transform(range(1, len(toks)),
      |        i -> toks[i] || ' ' || toks[i + 1])) AS b
      |    FROM bg0) x),
      |model AS (
      |  SELECT f, CAST(count(*) AS BIGINT) AS cnt_r,
      |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
      |  FROM bg GROUP BY f),
      |totals AS (
      |  SELECT CAST(sum(cnt_r) AS BIGINT) AS nr,
      |    CAST(sum(cnt_t) AS BIGINT) AS nt FROM model),
      |ratio AS (
      |  SELECT f, CAST(
      |      ((cnt_t + 1)::HUGEINT * (nr + 4096)::HUGEINT * 1000000::HUGEINT)
      |      // ((cnt_r + 1)::HUGEINT * (nt + 4096)::HUGEINT)
      |    AS BIGINT) AS ratio_ppm
      |  FROM model, totals),
      |per_doc AS (
      |  SELECT g.doc_id, g.tgt,
      |    CAST(sum(g.k) AS BIGINT) AS n_bigrams,
      |    CAST(sum(g.k::HUGEINT * r.ratio_ppm::HUGEINT) AS BIGINT)
      |      AS score_ppm_sum
      |  FROM (
      |    SELECT doc_id, tgt, f, CAST(count(*) AS BIGINT) AS k
      |    FROM bg GROUP BY doc_id, tgt, f) g
      |  JOIN ratio r ON g.f = r.f
      |  GROUP BY g.doc_id, g.tgt),
      |w AS (
      |  SELECT doc_id, tgt, n_bigrams, score_ppm_sum,
      |    CAST(score_ppm_sum AS DOUBLE) / 1000000.0 / CAST(n_bigrams AS DOUBLE)
      |      AS weight
      |  FROM per_doc),
      |top AS (
      |  SELECT doc_id FROM w ORDER BY weight DESC, doc_id LIMIT 100)
      |SELECT w.doc_id, w.tgt, w.n_bigrams, w.score_ppm_sum, w.weight,
      |  w.doc_id IN (SELECT doc_id FROM top) AS selected
      |FROM w""".stripMargin

  // ---- q182: cross-source quality calibration (percent_rank) ---------------

  /** q182: quality-score calibration across heterogeneous sources — the
    * fix for "one source's raw score 0.6 means something different than
    * another's": replace the raw score with its PER-SOURCE percent rank,
    * then apply one global survival threshold to the calibrated rank.
    * The raw score here is the exact-integer type-token ratio in ppm
    * (distinct tokens ·10⁶ div tokens); any per-doc integer score plugs
    * into the same calibration.
    *
    * Determinism: the rank order is totalized by the (score, doc_id)
    * tie-break, so `percent_rank` = (rank−1)/(n−1) is a single IEEE
    * division of exact integers — bit-identical in both engines — and
    * the keep flag is a threshold on that exact value. Scale shape: one
    * window partitioned by source (the q79/q134 stratum-parallel window
    * tier — strata are bounded and balanced by construction; a 100 TB
    * deployment with a skewed stratum would swap in the q89-style
    * broadcast quantile table instead of a full in-stratum sort). */
  def qualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score_ppm").asc, col("doc_id").asc)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"), col("source"),
        expr("(size(array_distinct(toks)) * CAST(1000000 AS BIGINT)) div size(toks)")
          .as("score_ppm"))
      .withColumn("calibrated", percent_rank().over(w))
      .withColumn("keep", col("calibrated") >= 0.2d)
  }

  private val qualityCalibrationSql =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents
      |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 1),
      |s AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_distinct(toks)) * 1000000 // len(toks) AS BIGINT)
      |      AS score_ppm
      |  FROM t)
      |SELECT doc_id, source, score_ppm,
      |  percent_rank() OVER (PARTITION BY source
      |    ORDER BY score_ppm, doc_id) AS calibrated,
      |  percent_rank() OVER (PARTITION BY source
      |    ORDER BY score_ppm, doc_id) >= 0.2 AS keep
      |FROM s""".stripMargin

  // ---- q183: distribution-matching rejection sampler -----------------------

  /** q183: rejection sampling the raw pool so its length distribution
    * matches a TARGET slice's (sources src0/src1 — the domain proxy the
    * q180 weights use): per length-bin accept probability
    * p = min(1, target_frac / raw_frac), docs accepted when their
    * seedless hash falls under p — the distribution-alignment op (the
    * sampling counterpart of DSIR's reweighting) a pipeline runs to
    * de-bias a crawl against a curated reference.
    *
    * Exactness: p is pre-scaled to integer ppm with DECIMAL(38,0)/
    * HUGEINT products (t_cnt·n_raw·10⁶ div (r_cnt·n_tgt) — int64
    * overflows exactly at the corpus sizes that matter), and acceptance
    * compares the md5-derived hash mod 10⁶ against p_ppm in integers —
    * no doubles anywhere. Bins with no target mass get p = 0 (nothing
    * to match against). Scale shape: the bin histogram is a map-side-
    * combined agg into a bounded key space, broadcast back onto ONE
    * corpus scan; acceptance is a scan-local comparison. */
  def distMatchSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("source").isin("src0", "src1").as("tgt"),
        expr("CAST(n_chars div 200 AS BIGINT)").as("bin"))
    val bins = docs.groupBy(col("bin")).agg(
      count(lit(1)).as("r_cnt"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("t_cnt"))
    val totals = bins.agg(sum(col("r_cnt")).cast("long").as("nr"),
      sum(col("t_cnt")).cast("long").as("nt"))
    val p = bins.crossJoin(broadcast(totals))
      .select(col("bin"), col("r_cnt"), col("t_cnt"), expr(
        """least(CAST(1000000 AS BIGINT),
          |  CAST((CAST(t_cnt AS DECIMAL(38,0)) * CAST(nr AS DECIMAL(38,0))
          |        * CAST(1000000 AS DECIMAL(38,0)))
          |    div (CAST(r_cnt AS DECIMAL(38,0)) * CAST(nt AS DECIMAL(38,0)))
          |  AS BIGINT))""".stripMargin).as("p_ppm"))
    docs.join(broadcast(p), Seq("bin"))
      .select(col("doc_id"), col("source"), col("bin"), col("tgt"),
        col("p_ppm"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 1000000L < col("p_ppm")).as("accepted"))
  }

  private val distMatchSampleSql =
    """WITH docs AS (
      |  SELECT doc_id, source, n_chars,
      |    source IN ('src0', 'src1') AS tgt,
      |    CAST(n_chars // 200 AS BIGINT) AS bin
      |  FROM documents),
      |bins AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS r_cnt,
      |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt
      |  FROM docs GROUP BY bin),
      |totals AS (
      |  SELECT CAST(sum(r_cnt) AS BIGINT) AS nr,
      |    CAST(sum(t_cnt) AS BIGINT) AS nt FROM bins),
      |p AS (
      |  SELECT bin, r_cnt, t_cnt,
      |    least(CAST(1000000 AS BIGINT), CAST(
      |      (t_cnt::HUGEINT * nr::HUGEINT * 1000000::HUGEINT)
      |      // (r_cnt::HUGEINT * nt::HUGEINT) AS BIGINT)) AS p_ppm
      |  FROM bins, totals)
      |SELECT d.doc_id, d.source, d.bin, d.tgt, p.p_ppm,
      |  ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
      |    < p.p_ppm AS accepted
      |FROM docs d JOIN p ON d.bin = p.bin""".stripMargin

  // ---- q185: trained char-trigram language ID (Cavnar-Trenkle) -------------

  private val ctK = 50L

  /** q185: LEARNED language identification — the Cavnar-Trenkle (1994)
    * rank-order profile classifier, trained on the corpus's own labels
    * (q70's heuristic upgraded to a trained artifact, the q159/q160
    * learned-artifact tier): per language, the top-50 char trigrams
    * ranked by frequency form the profile; a document is scored against
    * each language by the out-of-place distance Σ|rank_doc − rank_lang|
    * (missing trigram ⇒ max penalty K) and classified to the argmin.
    * All ranks and distances are exact integers under (count desc,
    * trigram) total order — no floats anywhere.
    *
    * Honest caveat: the synthetic sf tables draw every language's text
    * from ONE shared vocabulary, so their lang labels are independent of
    * content and accuracy there is chance level for ANY classifier; the
    * hash gate grades the computation, and the separability theorem
    * (disjoint character inventories ⇒ 100% accuracy) is pinned on a
    * crafted fixture in `PropertySpec`.
    *
    * Plan shape: ONE trigram extraction pass feeds both the model and
    * the scoring side. The language model aggregates map-side into
    * |langs|·|trigram vocab| keys, then ranks inside |langs| strata and
    * keeps 50·|langs| rows — a broadcast-sized artifact no matter the
    * corpus. Doc profiles rank inside per-doc windows (doc-bounded
    * partitions). The doc×lang score grid is profile_rows × |langs| via
    * crossJoin(broadcast(langs)) — languages are bounded — and the model
    * lookup is a broadcast left join; the argmin is a per-doc window over
    * |langs| rows. */
  def langProfileId(spark: SparkSession, dir: String): DataFrame = {
    // lang.isNotNull is pinned on the SHARED stream: the model join pushes
    // that filter into its own branch, and a one-sided filter would make
    // the two dp0 subtrees canonically different — defeating the
    // exchange reuse the single-tokenize plan shape depends on
    // the trigram explode fuses onto this scan — rebalance the
    // unsplittable single-file input across cores first (guide §2.5 via
    // [[Tables.spread]]; projection/filter applied before the exchange,
    // no-op on multi-split inputs)
    val tri = Tables.spread(spark, dir, "documents",
        Tables(spark, dir, "documents")
          .where(length(col("text")) >= 3 && col("lang").isNotNull)
          .select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"), lower(col("text")).as("s"))
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))"))
        .as("g"))
    // ONE aggregation of the trigram stream — the language model is the
    // per-doc count table re-aggregated (Σ over docs of per-doc counts IS
    // the per-lang count), so the corpus-scale shuffle happens once and
    // both branches share its exchange instead of re-tokenizing the scan
    // the per-doc trigram count table IS the model's sufficient
    // statistic: memoized + checkpointed per (session, sf), so the
    // corpus tokenize+aggregate pass is paid once and BOTH branches
    // (model re-aggregation, doc profiles) read the cached blocks —
    // and a session re-run retrains for free ([[Memo]] lifecycle)
    val dp0 = Memo("ct_dp0", spark, dir) {
      tri.groupBy(col("doc_id"), col("lang"), col("g"))
        .agg(count(lit(1)).as("c")).localCheckpoint()
    }
    val wl = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("g").asc)
    val langProfile = dp0.groupBy(col("lang"), col("g"))
      .agg(sum(col("c")).as("c"))
      .withColumn("rl", row_number().over(wl).cast("long"))
      .where(col("rl") <= ctK)
      .select(col("lang").as("cand"), col("g"), col("rl"))
    val wd = Window.partitionBy(col("doc_id"))
      .orderBy(col("c").desc, col("g").asc)
    val docProfile = dp0
      .withColumn("rd", row_number().over(wd).cast("long"))
      .where(col("rd") <= ctK)
    val langs = Tables(spark, dir, "documents")
      .select(col("lang").as("cand")).distinct()
    val wbest = Window.partitionBy(col("doc_id"))
      .orderBy(col("dist").asc, col("cand").asc)
    docProfile.crossJoin(broadcast(langs))
      .join(broadcast(langProfile), Seq("cand", "g"), "left")
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(sum(coalesce(abs(col("rd") - col("rl")), lit(ctK))).as("dist"))
      .withColumn("rk", row_number().over(wbest))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("lang"), col("cand").as("pred_lang"),
        col("dist"), (col("lang") === col("cand")).as("correct"))
  }

  private val langProfileIdSql =
    s"""WITH t AS (
       |  SELECT doc_id, lang, lower(text) AS s FROM documents
       |  WHERE length(text) >= 3 AND lang IS NOT NULL),
       |tri AS (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(1, length(s) - 1),
       |      i -> substr(s, CAST(i AS INTEGER), 3))) AS g
       |  FROM t),
       |lp AS (
       |  SELECT lang AS cand, g, rl FROM (
       |    SELECT lang, g, CAST(row_number() OVER (
       |      PARTITION BY lang ORDER BY count(*) DESC, g) AS BIGINT) AS rl
       |    FROM tri GROUP BY lang, g) x
       |  WHERE rl <= $ctK),
       |dp AS (
       |  SELECT doc_id, lang, g, rd FROM (
       |    SELECT doc_id, lang, g, CAST(row_number() OVER (
       |      PARTITION BY doc_id ORDER BY count(*) DESC, g) AS BIGINT) AS rd
       |    FROM tri GROUP BY doc_id, lang, g) x
       |  WHERE rd <= $ctK),
       |langs AS (SELECT DISTINCT lang AS cand FROM documents),
       |dist AS (
       |  SELECT d.doc_id, d.lang, l.cand,
       |    CAST(sum(coalesce(abs(d.rd - p.rl), $ctK)) AS BIGINT) AS dist
       |  FROM dp d CROSS JOIN langs l
       |  LEFT JOIN lp p ON l.cand = p.cand AND d.g = p.g
       |  GROUP BY d.doc_id, d.lang, l.cand)
       |SELECT doc_id, lang, cand AS pred_lang, dist, lang = cand AS correct
       |FROM (
       |  SELECT doc_id, lang, cand, dist, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY dist, cand) AS rk
       |  FROM dist) b
       |WHERE rk = 1""".stripMargin

  // ---- q186: token-balanced shard assignment (snake order) -----------------

  private val nShards = 8L

  /** q186: data-parallel shard assignment — lay each language's documents
    * in (tokens desc, doc_id) order and deal them to 8 shards in SNAKE
    * (boustrophedon) order: round r takes shards left-to-right when r is
    * even, right-to-left when odd, so the longest documents spread
    * evenly and per-shard token totals stay within one document of each
    * other — the classic LPT-flavored static balancing a training job
    * does before launching 8 data-parallel readers.
    *
    * Everything is integer arithmetic on the per-stratum row_number
    * (shard = within if round even, else S−1−within), so the assignment
    * is exact and reproducible on any cluster shape. Scale shape: one
    * window per language stratum (the q87/q150 tier — a 100 TB
    * deployment swaps in a (lang, shard-group) composite partition key
    * to bound per-window data; the snake math is unchanged). */
  def tokenShards(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        expr("CAST(size(filter(split(lower(text), ' '), x -> x <> '')) AS BIGINT)")
          .as("n_tokens"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"""CASE WHEN (pos div $nShards) % 2 = 0
                |  THEN pos % $nShards
                |  ELSE ${nShards - 1} - pos % $nShards END""".stripMargin)
          .as("shard"))
  }

  private val tokenShardsSql =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
       |      AS BIGINT) AS n_tokens
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY n_tokens DESC, doc_id) - 1 AS BIGINT) AS pos
       |  FROM d)
       |SELECT doc_id, lang, n_tokens,
       |  CASE WHEN (pos // $nShards) % 2 = 0 THEN pos % $nShards
       |    ELSE ${nShards - 1} - pos % $nShards END AS shard
       |FROM p""".stripMargin

  // ---- q187: deterministic per-epoch shuffle order -------------------------

  /** q187: reproducible multi-epoch data ordering — for each training
    * epoch, every shard's documents are re-permuted by the seedless hash
    * of (epoch, doc_id), so (a) any cluster shape reproduces the same
    * epoch order bit-for-bit (the property that makes training runs
    * resumable and ablations comparable), (b) epochs are decorrelated
    * (the hash re-keys on the epoch), and (c) a document never leaves
    * its q186 shard — shard assignment is the expensive balanced step,
    * the per-epoch re-shuffle is free ordering on top.
    *
    * Plan shape: the 3-epoch grid is a scan-local array explode (no join
    * against an epochs table), and the rank windows are per (epoch,
    * shard) — bounded strata, q186's tier. Everything is integer/hash
    * arithmetic: exact in both engines. */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc)
    tokenShards(spark, dir)
      .select(col("doc_id"), col("lang"), col("shard"),
        explode(expr("sequence(0L, 2L)")).as("epoch"))
      .withColumn("h",
        conv(substring(md5(concat_ws(":", col("epoch"), col("doc_id"))), 1, 15),
          16, 10).cast("long"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("epoch"), col("shard"), col("doc_id"), col("pos"))
  }

  private val epochShuffleSql =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
       |      AS BIGINT) AS n_tokens
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY n_tokens DESC, doc_id) - 1 AS BIGINT) AS pos
       |  FROM d),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN (pos // $nShards) % 2 = 0 THEN pos % $nShards
       |      ELSE ${nShards - 1} - pos % $nShards END AS shard
       |  FROM p),
       |g AS (
       |  SELECT s.doc_id, s.shard, e.epoch,
       |    ('0x' || substr(md5(e.epoch::VARCHAR || ':' || s.doc_id::VARCHAR),
       |      1, 15))::BIGINT AS h
       |  FROM sh s CROSS JOIN (
       |    SELECT unnest(range(0, 3)) AS epoch) e)
       |SELECT epoch, shard, doc_id,
       |  CAST(row_number() OVER (PARTITION BY epoch, shard
       |    ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
       |FROM g""".stripMargin

  // ---- q189: selection pipeline (calibrate -> match -> dedup -> shard) -----

  /** q189: the round-9 SELECTION tier composed into ONE DAG — the q100
    * composition proof applied to the new operators: per-source
    * percent-rank quality calibration (q182, keep the top 80% of each
    * source) → distribution-matching rejection sampling of the
    * calibrated pool against the src0/src1 length profile (q183's
    * integer-ppm accept model, refit on the POOL it samples — matching
    * is always relative to the population that survived upstream) →
    * exact dedup keep-first (q50 shape) → token-balanced snake sharding
    * (q186) → per-(lang, shard) docs/tokens report. Every stage is the
    * same deterministic arithmetic its standalone query uses, so the
    * whole pipeline is hash-checked end to end.
    *
    * Plan shape: one scan feeds the calibration window (per-source
    * strata); the bin model is a bounded agg broadcast back; dedup and
    * sharding are one window each; the report is a |langs|·|shards|
    * aggregate. Nothing quadratic, nothing driver-side. */
  def selectionPipeline(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(lower(trim(col("text")))).as("fp"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"), col("lang"), col("source"), col("fp"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("(size(array_distinct(toks)) * CAST(1000000 AS BIGINT)) div size(toks)")
          .as("score_ppm"),
        col("source").isin("src0", "src1").as("tgt"),
        expr("CAST(n_chars div 200 AS BIGINT)").as("bin"))
    val wcal = Window.partitionBy(col("source"))
      .orderBy(col("score_ppm").asc, col("doc_id").asc)
    val cal = base.withColumn("pr", percent_rank().over(wcal))
      .where(col("pr") >= 0.2d)
    val bins = cal.groupBy(col("bin")).agg(
      count(lit(1)).as("r_cnt"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("t_cnt"))
    val totals = bins.agg(sum(col("r_cnt")).cast("long").as("nr"),
      sum(col("t_cnt")).cast("long").as("nt"))
    val p = bins.crossJoin(broadcast(totals))
      .select(col("bin"), expr(
        """least(CAST(1000000 AS BIGINT),
          |  CAST((CAST(t_cnt AS DECIMAL(38,0)) * CAST(nr AS DECIMAL(38,0))
          |        * CAST(1000000 AS DECIMAL(38,0)))
          |    div (CAST(r_cnt AS DECIMAL(38,0)) * CAST(nt AS DECIMAL(38,0)))
          |  AS BIGINT))""".stripMargin).as("p_ppm"))
    val acc = cal.join(broadcast(p), Seq("bin"))
      .where(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000000L < col("p_ppm"))
    val ded = acc.withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)))
      .where(col("rn") === 1)
    val wsh = Window.partitionBy(col("lang"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    ded.withColumn("pos", (row_number().over(wsh) - 1).cast("long"))
      .withColumn("shard",
        expr(s"""CASE WHEN (pos div $nShards) % 2 = 0
                |  THEN pos % $nShards
                |  ELSE ${nShards - 1} - pos % $nShards END""".stripMargin))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
  }

  private val selectionPipelineSql =
    s"""WITH base AS (
       |  SELECT doc_id, lang, source, md5(lower(trim(text))) AS fp,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) * 1000000 // len(toks) AS BIGINT)
       |      AS score_ppm,
       |    source IN ('src0', 'src1') AS tgt,
       |    CAST(n_chars // 200 AS BIGINT) AS bin
       |  FROM (
       |    SELECT *, list_filter(string_split(lower(text), ' '), x -> x <> '')
       |      AS toks
       |    FROM documents) x
       |  WHERE len(toks) >= 1),
       |cal AS (
       |  SELECT * FROM (
       |    SELECT *, percent_rank() OVER (PARTITION BY source
       |      ORDER BY score_ppm, doc_id) AS pr
       |    FROM base) y
       |  WHERE pr >= 0.2),
       |bins AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS r_cnt,
       |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt
       |  FROM cal GROUP BY bin),
       |totals AS (
       |  SELECT CAST(sum(r_cnt) AS BIGINT) AS nr,
       |    CAST(sum(t_cnt) AS BIGINT) AS nt FROM bins),
       |p AS (
       |  SELECT bin, least(CAST(1000000 AS BIGINT), CAST(
       |      (t_cnt::HUGEINT * nr::HUGEINT * 1000000::HUGEINT)
       |      // (r_cnt::HUGEINT * nt::HUGEINT) AS BIGINT)) AS p_ppm
       |  FROM bins, totals),
       |acc AS (
       |  SELECT c.* FROM cal c JOIN p ON c.bin = p.bin
       |  WHERE ('0x' || substr(md5(c.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
       |    < p.p_ppm),
       |ded AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
       |    FROM acc) z
       |  WHERE rn = 1),
       |sh AS (
       |  SELECT lang, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY n_tokens DESC, doc_id) - 1 AS BIGINT) AS pos
       |  FROM ded)
       |SELECT lang,
       |  CASE WHEN (pos // $nShards) % 2 = 0 THEN pos % $nShards
       |    ELSE ${nShards - 1} - pos % $nShards END AS shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |FROM sh GROUP BY 1, 2""".stripMargin

  // ---- q193: weak-supervision signal diagnostics ---------------------------

  /** q193: labeling-function diagnostics — the weak-supervision health
    * table: three independent quality signals vote on every document
    * (the q71 heuristic rule, the q166 Simpson-diversity gate, the q88
    * duplicate-token gate), the majority (≥2 of 3) is the consensus
    * label, and each signal is scored by its AGREEMENT with that
    * consensus — the table a Snorkel-style pipeline inspects to find
    * the labeling function that has drifted from the committee. All
    * three flags are exact-integer/scan-local expressions, the vote is
    * integer addition, and agreement is an exact ppm floor-division, so
    * the whole diagnostic is hash-deterministic.
    *
    * Plan shape: ONE corpus scan computes all flags and the vote; the
    * per-signal breakdown explodes a 3-element literal-keyed array
    * (3 rows per doc — bounded by the signal count, not content) into a
    * 3-key aggregation. Nothing else moves. */
  def signalAgreement(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"),
        // s1: the q71 heuristic (token count band + alpha ratio)
        (size(col("toks")).between(20, 200) &&
          length(regexp_replace(lower(col("text")), "[^a-z]", "")) * 10 >=
            length(col("text")) * 7).as("s1"),
        // s2: the q166 Simpson-diversity gate in exact integer form
        expr("""size(toks) >= 5 AND
                |  size(toks) * size(toks) - aggregate(
                |    transform(array_distinct(toks),
                |      d -> size(filter(toks, x -> x = d))),
                |    CAST(0 AS BIGINT), (s, c) -> s + CAST(c AS BIGINT) * c)
                |  >= CAST(ceil(0.5D * size(toks) * size(toks)) AS BIGINT)"""
          .stripMargin).as("s2"),
        // s3: the q88 duplicate-token gate (distinct fraction >= 40%)
        expr("size(array_distinct(toks)) * 10 >= size(toks) * 4").as("s3"))
      .withColumn("votes",
        col("s1").cast("long") + col("s2").cast("long") + col("s3").cast("long"))
      .withColumn("majority", col("votes") >= 2)
      .select(col("majority"), explode(expr(
        """array(named_struct('signal', 's1', 'flag', s1),
          |      named_struct('signal', 's2', 'flag', s2),
          |      named_struct('signal', 's3', 'flag', s3))""".stripMargin))
        .as("e"))
      .groupBy(col("e.signal").as("signal"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("e.flag") === col("majority"), 1L).otherwise(0L))
          .as("n_agree"),
        sum(when(col("e.flag"), 1L).otherwise(0L)).as("n_keep"))
      .select(col("signal"), col("n_docs"), col("n_agree"), col("n_keep"),
        expr("(n_agree * CAST(1000000 AS BIGINT)) div n_docs").as("agree_ppm"))

  private val signalAgreementSql =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents
      |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 1),
      |f AS (
      |  SELECT doc_id,
      |    len(toks) BETWEEN 20 AND 200 AND
      |      length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 10 >=
      |        length(text) * 7 AS s1,
      |    len(toks) >= 5 AND
      |      len(toks) * len(toks) - CAST(list_sum(list_transform(
      |        list_distinct(toks),
      |        d -> len(list_filter(toks, x -> x = d))
      |             * len(list_filter(toks, x -> x = d)))) AS BIGINT)
      |      >= CAST(ceil(0.5 * len(toks) * len(toks)) AS BIGINT) AS s2,
      |    len(list_distinct(toks)) * 10 >= len(toks) * 4 AS s3
      |  FROM t),
      |v AS (
      |  SELECT doc_id, s1, s2, s3,
      |    (CASE WHEN s1 THEN 1 ELSE 0 END + CASE WHEN s2 THEN 1 ELSE 0 END
      |     + CASE WHEN s3 THEN 1 ELSE 0 END) >= 2 AS majority
      |  FROM f),
      |e AS (
      |  SELECT majority, 's1' AS signal, s1 AS flag FROM v
      |  UNION ALL SELECT majority, 's2', s2 FROM v
      |  UNION ALL SELECT majority, 's3', s3 FROM v)
      |SELECT signal, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN flag = majority THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_agree,
      |  CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  CAST(sum(CASE WHEN flag = majority THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS agree_ppm
      |FROM e GROUP BY signal""".stripMargin

  // ---- q234: PMI word association -----------------------------------------

  /** q234: PMI CO-OCCURRENCE — pointwise mutual information over word
    * pairs at document grain, the classic association-mining statistic
    * (collocations, taxonomy induction, embedding evaluation). Presence
    * sets per doc (distinct words — counts don't matter for PMI), pair
    * generation by doc-keyed self-join with `w1 < w2` canonicalization,
    * then PMI in EXACT integer arithmetic: pmi_ppm = n_ab·N·10⁶ div
    * (n_a·n_b) — the ratio p(a,b)/(p(a)p(b)) in parts-per-million, with
    * every product in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), the q211
    * discipline, so nothing overflows at any corpus size and no
    * transcendental log ever enters (the consumer can take the log; the
    * ENGINES must only agree on the exact rational). A support floor
    * (n_ab >= 5) bounds the output to genuinely co-occurring pairs.
    *
    * At 100 TB: the self-join is doc-keyed — pair volume is
    * Σ_doc (distinct words per doc)², bounded by doc length, never by
    * corpus size; word counts and pair counts are both map-side-partial
    * aggregates; the 1-row N frame attaches by broadcast. */
  def pmiPairs(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .distinct()
    val nDocs = toks.select(countDistinct(col("doc_id")).as("nd"))
    val wc = toks.groupBy(col("w")).agg(count(lit(1)).as("nw"))
    val pairs = toks.as("a").join(toks.as("b"), Seq("doc_id"))
      .where(col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("nab"))
      .where(col("nab") >= 5)
    pairs
      .join(wc.select(col("w").as("w1"), col("nw").as("n1")), Seq("w1"))
      .join(wc.select(col("w").as("w2"), col("nw").as("n2")), Seq("w2"))
      .crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("nab"), col("n1"), col("n2"),
        expr("""CAST((CAST(nab AS DECIMAL(38,0)) * nd * 1000000)
                div (CAST(n1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0)))
                AS BIGINT)""").as("pmi_ppm"))
  }

  private val pmiPairsSql =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, t AS w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |    FROM documents) x
      |  WHERE t <> ''),
      |nd AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
      |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS nw FROM toks GROUP BY w),
      |p AS (
      |  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS nab
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w < b.w
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 5)
      |SELECT w1, w2, nab, wa.nw AS n1, wb.nw AS n2,
      |  CAST(nab::HUGEINT * nd.n::HUGEINT * 1000000
      |    // (wa.nw::HUGEINT * wb.nw::HUGEINT) AS BIGINT) AS pmi_ppm
      |FROM p JOIN wc wa ON p.w1 = wa.w JOIN wc wb ON p.w2 = wb.w, nd""".stripMargin

  // ---- q237: weighted systematic sampling ---------------------------------

  /** q237: WEIGHTED SYSTEMATIC SAMPLING — k=10 documents per language
    * with inclusion probability ∝ n_chars, the curation shape "sample big
    * docs more, but keep the stratum quota". Systematic
    * (cumulative-weight) selection instead of the
    * Efraimidis-Spirakis exponential keys every streaming sampler uses:
    * E-S needs ln(u)/w — a transcendental that never crosses engines
    * bit-stably — where the systematic rule selects doc i iff
    * floor(cum_i·k/W) > floor((cum_i − w_i)·k/W), pure integer
    * arithmetic (q211 DECIMAL38/HUGEINT products), hash-gated. One doc is
    * selected per k-quantile boundary CROSSED: a stratum whose weights
    * are all ≤ W/k yields exactly k; a heavier doc is a CERTAINTY
    * selection that absorbs every boundary inside its span (selected
    * once, never duplicated — sample size ≤ k, the standard systematic-
    * sampling contract; `StatsOpsSpec` pins both regimes). Determinism
    * comes from the fixed doc_id traversal order — a seedless,
    * reproducible sample, the q37/q186 discipline.
    *
    * At 100 TB: one lang-keyed shuffle; the prefix sum is the stratum-
    * local window — for strata wider than a partition the standard
    * two-level segmented scan (per-partition partial sums + offset join)
    * replaces it with identical output, same as the q186 note. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    val cum = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("w_tot", sum(col("n_chars")).over(Window.partitionBy(col("lang"))))
    cum.where(expr(s"(CAST(cum AS DECIMAL(38,0)) * $k) div w_tot > " +
        s"(CAST(cum - n_chars AS DECIMAL(38,0)) * $k) div w_tot"))
      .select(col("lang"), col("doc_id"), col("n_chars"))
  }

  private val weightedSampleSql =
    """WITH d AS (
      |  SELECT doc_id, lang, n_chars,
      |    sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(n_chars) OVER (PARTITION BY lang) AS w_tot
      |  FROM documents)
      |SELECT lang, doc_id, n_chars FROM d
      |WHERE (cum::HUGEINT * 10) // w_tot::HUGEINT
      |    > ((cum - n_chars)::HUGEINT * 10) // w_tot::HUGEINT""".stripMargin

  // ---- q246: per-document TF-IDF keywords ---------------------------------

  /** q246: TF-IDF KEYWORD EXTRACTION — the top-3 most characteristic
    * terms per document, the summarization/labeling primitive BM25 (q178)
    * generalizes for retrieval. IDF is the exact rational N·10⁶ div df
    * (ppm — the engines must only agree on the integer, no log crosses
    * the boundary; a consumer monotone-transforms at will since ranking
    * is preserved under any monotone idf map for fixed tf... the RANK is
    * what's extracted), score = tf · idf_ppm in DECIMAL38 products, and
    * the per-doc top-3 is a row_number window with the (score DESC, word)
    * total order — deterministic ties, the q239 discipline.
    *
    * At 100 TB: tf is one (doc, word) aggregate, df one word aggregate;
    * the score join is word-keyed (df frame ~vocabulary-sized, broadcast
    * when bounded); the window partitions by doc_id — millions of tiny
    * partitions, the shape windows parallelize best. */
  def tfidfTopk(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfw = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nd = tf.select(countDistinct(col("doc_id")).as("nd"))
    tf.join(dfw, Seq("w")).crossJoin(broadcast(nd))
      .withColumn("score", expr(
        "CAST(CAST(tf AS DECIMAL(38,0)) * " +
          "((CAST(nd AS DECIMAL(38,0)) * 1000000) div df) AS BIGINT)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("w"))).cast("long"))
      .where(col("rnk") <= 3)
      .select(col("doc_id"), col("w"), col("score"), col("rnk"))
  }

  private val tfidfTopkSql =
    """WITH toks AS (
      |  SELECT doc_id, t AS w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |    FROM documents) x
      |  WHERE t <> ''),
      |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      |  FROM toks GROUP BY 1, 2),
      |dfw AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM tf),
      |s AS (
      |  SELECT tf.doc_id, tf.w,
      |    CAST(tf.tf::HUGEINT * (nd.nd::HUGEINT * 1000000 // dfw.df)
      |      AS BIGINT) AS score
      |  FROM tf JOIN dfw ON tf.w = dfw.w, nd),
      |r AS (
      |  SELECT doc_id, w, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w)
      |      AS rnk
      |  FROM s)
      |SELECT doc_id, w, score, CAST(rnk AS BIGINT) AS rnk
      |FROM r WHERE rnk <= 3""".stripMargin

  // ---- q256: readability scoring ------------------------------------------

  /** q256: READABILITY (Flesch reading ease) — the text-quality scorer a
    * curation pipeline runs beside length/stopword gates: words by
    * non-empty token count, syllables by the standard vowel-group
    * heuristic (one `regexp_count` — the approximation every scalable
    * implementation uses), sentences by terminal punctuation (+1 so
    * fragments score). The score is three IEEE ops over exact integers
    * through the IDENTICAL expression tree in both engines — the q118
    * discipline applied to a formula with published constants. Pure
    * scan-local codegen: zero shuffles before output. */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)")
          .as("n_words"),
        expr("CAST(regexp_count(text, '[aeiou]+') AS BIGINT)").as("n_syll"),
        expr("CAST(1 + regexp_count(text, '[.!?]') AS BIGINT)").as("n_sent"))
      .where(col("n_words") > 0)
      .withColumn("flesch",
        lit(206.835d) -
          lit(1.015d) * (col("n_words").cast("double") / col("n_sent")) -
          lit(84.6d) * (col("n_syll").cast("double") / col("n_words")))

  private val readabilitySql =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS n_words,
      |    CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
      |      AS n_syll,
      |    CAST(1 + len(regexp_extract_all(text, '[.!?]')) AS BIGINT)
      |      AS n_sent
      |  FROM documents)
      |SELECT doc_id, n_words, n_syll, n_sent,
      |  206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
      |    - 84.6 * (CAST(n_syll AS DOUBLE) / n_words) AS flesch
      |FROM f WHERE n_words > 0""".stripMargin

  // ---- q267: skip-gram pair counts ----------------------------------------

  /** q267: SKIP-GRAMS — (center, context) pair counts within a ±2 token
    * window, the embedding-training preprocessing op (word2vec's input is
    * exactly this table). Positions come from ONE posexplode; pairs from
    * a doc-keyed self-join constrained to j ∈ (i, i+2] — per-token work
    * is the window width, never the doc length squared. Positions index
    * the RAW split (empty tokens drop rows but never renumber), ordered
    * pairs keep their distance, and a support floor bounds the output to
    * recurring pairs. Both engines zip word and position from the same
    * split, so counts are hash-gated.
    *
    * At 100 TB: pair volume = 2·corpus tokens before the aggregate —
    * map-side partials collapse it; the self-join is doc-keyed (the q234
    * bound). */
  def skipGrams(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i0", "w")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("w"))
      .where(col("w") =!= "")
    val a = toks.select(col("doc_id"), col("i"), col("w").as("w1"))
    val b = toks.select(col("doc_id"), col("i").as("j"), col("w").as("w2"))
    a.join(b, Seq("doc_id"))
      .where(col("j") > col("i") && col("j") <= col("i") + 2)
      .groupBy(col("w1"), col("w2"), (col("j") - col("i")).cast("long").as("dist"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= 10)
  }

  private val skipGramsSql =
    """WITH toks AS (
      |  SELECT doc_id, i, w FROM (
      |    SELECT doc_id, generate_subscripts(xs, 1) AS i, unnest(xs) AS w
      |    FROM (SELECT doc_id, string_split(text, ' ') AS xs
      |          FROM documents))
      |  WHERE w <> '')
      |SELECT a.w AS w1, b.w AS w2, CAST(b.i - a.i AS BIGINT) AS dist,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM toks a JOIN toks b
      |  ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 2
      |GROUP BY 1, 2, 3
      |HAVING count(*) >= 10""".stripMargin

  // ---- q298: quantile normalization across sources -------------------------

  /** q298: QUANTILE NORMALIZATION — make per-source score distributions
    * comparable by mapping each document's WITHIN-SOURCE rank onto the
    * POOLED distribution's value at the same quantile (the calibration
    * step before cross-source selection by a shared threshold: q71-style
    * quality scores from different sources aren't on one scale; ranks
    * are). Exact integer mechanics: within-source rank r of n_s maps to
    * pooled position ⌈r·N/n_s⌉ = (r·N + n_s − 1) div n_s — both engines'
    * integer division — and the normalized value is the pooled value AT
    * that rank, joined by position. Total orders carry (n_chars, doc_id)
    * so ranks are unique and cross-engine identical. The pooled ranking
    * is one global sort of the doc-grain frame — the q239/q48 honest
    * exact-quantile cost class, with the equi-depth-histogram sketch as
    * the at-scale drop-in. */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val whole = Window.partitionBy().rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val pooled = docs
      .withColumn("t", row_number().over(
        Window.orderBy(col("n_chars"), col("doc_id"))))
      .select(col("t").cast("long").as("t"), col("n_chars").as("pooled_chars"))
    val ranked = docs
      .withColumn("r", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("nn", count(lit(1)).over(whole))
      .withColumn("t", expr("(r * nn + ns - 1) div ns"))
    ranked.join(pooled, Seq("t"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("pooled_chars").as("norm_chars"))
  }

  /** q298b: QUANTILE NORMALIZATION AT SCALE — q298's two corpus-wide
    * single-partition windows (the pooled rank and the global count)
    * replaced by the exact distributed rank and a driver-side scalar; the
    * per-source rank keeps its PARTITIONED window (each source sorts in
    * its own tasks — already shuffle-bounded). Output rows are
    * BIT-IDENTICAL to q298 (same oracle). */
  def quantileNormalizeDist(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.DistributedRank
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val nn = docs.count()
    val pooled = DistributedRank.withGlobalRank(
        docs.select(col("n_chars"), col("doc_id")),
        Seq(col("n_chars"), col("doc_id")), "__rk")
      .select((col("__rk") + 1).as("t"), col("n_chars").as("pooled_chars"))
    val ranked = docs
      .withColumn("r", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("t", expr(s"(r * $nn + ns - 1) div ns"))
    ranked.join(pooled, Seq("t"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("pooled_chars").as("norm_chars"))
  }

  private val quantileNormalizeSql =
    """WITH pooled AS (
      |  SELECT row_number() OVER (ORDER BY n_chars, doc_id) AS t,
      |    n_chars AS pooled_chars
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
      |      AS r,
      |    count(*) OVER (PARTITION BY source) AS ns,
      |    count(*) OVER () AS nn
      |  FROM documents)
      |SELECT doc_id, source, n_chars, pooled_chars AS norm_chars
      |FROM ranked JOIN pooled ON (r * nn + ns - 1) // ns = pooled.t""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q298_quantile_norm", quantileNormalize, Some(quantileNormalizeSql)),
    QueryDef("q298b_qnorm_dist", quantileNormalizeDist,
      Some(quantileNormalizeSql)),
    QueryDef("q267_skipgrams", skipGrams, Some(skipGramsSql)),
    QueryDef("q256_readability", readability, Some(readabilitySql)),
    QueryDef("q246_tfidf_topk", tfidfTopk, Some(tfidfTopkSql)),
    QueryDef("q237_weighted_sample", weightedSample, Some(weightedSampleSql)),
    QueryDef("q234_pmi_pairs", pmiPairs, Some(pmiPairsSql)),
    QueryDef("q193_signal_agreement", signalAgreement,
      Some(signalAgreementSql)),
    QueryDef("q189_selection_pipeline", selectionPipeline,
      Some(selectionPipelineSql)),
    QueryDef("q187_epoch_shuffle", epochShuffle, Some(epochShuffleSql)),
    QueryDef("q185_lang_profile_id", langProfileId, Some(langProfileIdSql)),
    QueryDef("q186_token_shards", tokenShards, Some(tokenShardsSql)),
    QueryDef("q182_quality_calibration", qualityCalibration,
      Some(qualityCalibrationSql)),
    QueryDef("q183_dist_match_sample", distMatchSample,
      Some(distMatchSampleSql)),
    QueryDef("q178_bm25_topk", bm25TopK, Some(bm25TopKSql)),
    QueryDef("q180_dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    QueryDef("q177_filter_funnel", filterFunnel, Some(filterFunnelSql)),
    QueryDef("q172_chunk_stride", chunkStride, Some(chunkStrideSql)),
    QueryDef("q170_exact_k_sample", exactKSample, Some(exactKSampleSql)),
    QueryDef("q171_stream_mix_monitor", streamMixMonitor,
      Some(temperatureMixSql)),
    QueryDef("q165_temperature_mix", temperatureMix, Some(temperatureMixSql)),
    QueryDef("q166_lexical_diversity", lexicalDiversity, Some(lexicalDiversitySql)),
    QueryDef("q167_bigram_familiarity", bigramFamiliarity, Some(bigramFamiliaritySql)),
    QueryDef("q100_curation", curationPipeline, Some(curationPipelineSql)),
    QueryDef("q66_salient_terms", salientTerms, Some(salientTermsSql)),
    QueryDef("q69_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    QueryDef("q68_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    QueryDef("q195_cms_freq", cmsFrequencies, Some(cmsFrequenciesSql)),
    QueryDef("q282_cms_join_card", cmsJoinCard, Some(cmsJoinCardSql)),
    QueryDef("q284_skew_keys", skewKeys, Some(skewKeysSql)),
    QueryDef("q199_bootstrap_mean", bootstrapMean, Some(bootstrapMeanSql)),
    QueryDef("q200_cms_commit", cmsCommit, Some(cmsCommitSql)),
    QueryDef("q204_matview_rewrite", matviewTopWords, Some(matviewTopWordsSql)),
    QueryDef("q205_bootstrap_median", bootstrapMedian, Some(bootstrapMedianSql)),
    QueryDef("q210_data_card", dataCard, Some(dataCardSql)),
    QueryDef("q211_source_divergence", sourceDivergence, Some(sourceDivergenceSql)),
    QueryDef("q89_length_filter", lengthFilter, Some(lengthFilterSql)),
    QueryDef("q87_seq_packing", seqPacking, Some(seqPackingSql)),
    QueryDef("q88_rep_quality", repetitionQuality, Some(repetitionQualitySql)),
    QueryDef("q85_pii_scrub", piiScrub, Some(piiScrubSql)),
    QueryDef("q86_pii_stats", piiStats, Some(piiStatsSql)),
    QueryDef("q79_top_tokens", topTokens, Some(topTokensSql)),
    QueryDef("q126_collocations", collocations, Some(collocationsSql)),
    QueryDef("q128_mix_resample", mixResample, Some(mixResampleSql)),
    QueryDef("q134_length_histogram", lengthHistogram, Some(lengthHistogramSql)),
    QueryDef("q141_source_shift", sourceShift, Some(sourceShiftSql)),
    QueryDef("q142_pps_sample", ppsSample, Some(ppsSampleSql)),
    QueryDef("q146_weighted_median", weightedMedian, Some(weightedMedianSql)),
    QueryDef("q149_vocab_encode", vocabEncode, Some(vocabEncodeSql)),
    QueryDef("q159_bpe_tokenize", bpeTokenize, Some(bpeTokenizeSql)),
    QueryDef("q160_linear_quality", linearQuality, Some(linearQualitySql)),
    QueryDef("q162_bpe_doc_tokens", bpeDocTokens, Some(bpeDocTokensSql)),
    QueryDef("q150_batch_shaping", batchShaping, Some(batchShapingSql)),
    QueryDef("q78_normalize", normalize, Some(normalizeSql)),
    QueryDef("q58_source_mix", sourceMix, Some(sourceMixSql)),
    QueryDef("q59_token_budget", tokenBudget, Some(tokenBudgetSql)),
    QueryDef("q76_edit_distance", editDistance, Some(editDistanceSql)),
    QueryDef("q70_lang_id", langId, Some(langIdSql)),
    QueryDef("q71_quality", quality, Some(qualitySql)),
    QueryDef("q72_token_stats", tokenStats, Some(tokenStatsSql)),
    QueryDef("q73_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("q74_rolling_fp", rollingFingerprint, Some(rollingFingerprintSql)),
    QueryDef("q75_regex_tokens", regexTokens, Some(regexTokensSql)))
}
