package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.dot_d
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over `embeddings.embedding` (Array[Float]).
  *
  * Vector math uses the engine's native `DotProduct` expression
  * (graft.functions.dot_d): a codegen'd, allocation-free multiply-accumulate
  * — the `aggregate(zip_with(...))` composable form is CodegenFallback and
  * allocates an intermediate array per row, which is exactly the hot loop
  * at 100 TB. The fold is left-to-right either way, so the result is
  * bit-identical to DuckDB's sequential `list_dot_product`. Floats are cast
  * to double (exact) before any arithmetic.
  *
  *  - brute-force top-k: queries broadcast against all candidates, ranked by
  *    exact cosine. The baseline: one pass over the corpus per query batch,
  *    embarrassingly parallel — at 100 TB the right shape when the query set
  *    is small (broadcast side) and the corpus is the big scan;
  *  - LSH-bucketed: 64 sign bits (one random-hyperplane hash per
  *    component) banded 4×16 with capped bucket membership prune the pair
  *    space from O(n²) to bounded bucket-local pairs — the scale path for
  *    all-pairs similarity (here: embedding-cosine near-dup candidates
  *    above a threshold), with q61b measuring what the buckets surface.
  */
object Similarity {

  /** vec_id, v (double[]), nrm for every embedding row. */
  /** Shared vector loader of the whole ANN/embedding family. The cast +
    * norm (and every consumer's distance arithmetic) fuse onto this scan,
    * which on the unsplittable single-file input is ONE task — rebalance
    * first (guide §2.5 via [[Tables.spread]]; measured 1.5 s single-task
    * on q226's brute-force gate, no-op on multi-split inputs). */
  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, dir, "embeddings",
        Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(dot_d(col("v"), col("v"))))

  private val vectorsSql =
    """SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
      |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)""".stripMargin

  /** Exact cosine top-10 for query vectors (vec_id < 5). MEMOIZED per
    * (session, sf): the brute-force ground truth grades FOUR registered
    * entries (q60 itself, q64's recall gate, q209's MRR, q226's PQ gate)
    * — one pays the exact pass, the rest reuse the checkpointed
    * |queries|×10 rows ([[Memo]] lifecycle; Bench clears between
    * passes). */
  def knnBrute(spark: SparkSession, dir: String): DataFrame =
    Memo("knn_brute", spark, dir) {
      computeKnnBrute(spark, dir).localCheckpoint()
    }

  private def computeKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = vectors(spark, dir)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot_d(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 10)
  }

  private val knnBruteSql =
    s"""WITH n AS ($vectorsSql),
       |p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       |  FROM n q, n c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, cos, rn FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM p) t
       |WHERE rn <= 10""".stripMargin

  /** Sign-LSH geometry: one sign bit per embedding component (64 total),
    * split into [[lshBands]] bands of [[lshBandBits]] bits. A sign bit IS a
    * random-hyperplane hash (the hyperplane is the coordinate axis), so the
    * 64-bit pattern is a SimHash of the embedding — and banding gives the
    * q56 pigeonhole guarantee: any pair whose sign patterns differ in <= 3
    * of the 64 bits shares at least one intact band and is surfaced (unless
    * its bucket was capped, see [[maxSignBucket]]). */
  val lshBands = 4
  val lshBandBits = 16

  /** Per-band bucket-membership cap for the sign-LSH self-join — the same
    * bound as q56's [[Dedup.maxBandBucket]]: one degenerate bucket (e.g. a
    * corpus slice whose embeddings all point into the same orthant)
    * contributes k²/2 candidate pairs, so uncapped occupancy is the
    * quadratic failure mode at corpus scale. With 2^16 bucket values per
    * band, expected occupancy is N/65536; the cap bounds the worst case.
    * q61b measures what the buckets (and the cap) actually surface. */
  val maxSignBucket = 128

  /** Slim fingerprint index (vec_id, band, bits) — 4 fixed-width rows per
    * vector, NOT the vector data — with hot buckets removed; exposed for
    * the spec that asserts the cap holds. Checkpointed once: consumed three
    * times (hot-bucket count + both candidate-join sides). */
  private[graft] def cappedSignBands(spark: SparkSession, dir: String): DataFrame =
    // Memoized: the band index feeds q61's candidate join AND q61b's recall
    // companion — one fingerprint pass + hot-bucket agg for both.
    Memo("sign_bands", spark, dir) {
      val bandVals = (0 until lshBands).map { b =>
        (0 until lshBandBits)
          .map(j => when(expr(s"v[${b * lshBandBits + j}]") >= 0, 1L << j)
            .otherwise(0L))
          .reduce(_ + _)
      }
      val bands = vectors(spark, dir)
        .select(col("vec_id"), posexplode(array(bandVals: _*)))
        .toDF("vec_id", "band", "bits")
        .localCheckpoint()
      val hot = bands.groupBy(col("band"), col("bits"))
        .agg(count(lit(1)).as("n")).where(col("n") > maxSignBucket)
        .select(col("band"), col("bits"))
      // the anti join itself stays in the consumer plans (PlanSpec gates
      // its shape); only the fingerprint pass above is materialized
      bands.join(broadcast(hot), Seq("band", "bits"), "left_anti")
    }

  private val cappedSignBandsSql = {
    val bandSelects = (0 until lshBands).map { b =>
      val bits = (0 until lshBandBits)
        .map(j => s"CASE WHEN v[${b * lshBandBits + j + 1}] >= 0 " +
          s"THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      s"SELECT vec_id, $b AS band, $bits AS bits FROM n"
    }.mkString(" UNION ALL ")
    s"""allbands AS ($bandSelects),
       |hot AS (SELECT band, bits FROM allbands
       |  GROUP BY band, bits HAVING count(*) > $maxSignBucket),
       |bands AS (SELECT * FROM allbands ab WHERE NOT EXISTS (
       |  SELECT 1 FROM hot h WHERE h.band = ab.band AND h.bits = ab.bits))""".stripMargin
  }

  /** Sign-LSH near-dup pairs: candidates share one 16-bit sign band (any of
    * 4), then exact cosine >= 0.15 verifies. The LSH staging at scale:
    * the candidate join runs on the slim banded fingerprint index (bucket
    * occupancy capped, so pair work is bucket-local and bounded), the
    * distinct candidate pairs then pull their two vectors by key for the
    * exact verify — the corpus itself is never self-joined. */
  def nearDupLsh(spark: SparkSession, dir: String): DataFrame = {
    val bands = cappedSignBands(spark, dir)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
      .distinct()
    val v = vectors(spark, dir)
    cand
      .join(v.select(col("vec_id").as("d1"), col("v").as("v1"),
        col("nrm").as("n1")), "d1")
      .join(v.select(col("vec_id").as("d2"), col("v").as("v2"),
        col("nrm").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (dot_d(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos"))
      .where(col("cos") >= 0.15)
  }

  private val nearDupLshSql =
    s"""WITH n AS ($vectorsSql),
       |$cappedSignBandsSql,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bits = b.bits AND a.vec_id < b.vec_id)
       |SELECT c.d1, c.d2,
       |  list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cos
       |FROM cand c JOIN n x ON x.vec_id = c.d1 JOIN n y ON y.vec_id = c.d2
       |WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.15""".stripMargin

  /** Slice size for q61b's exact ground truth (all-pairs over the first
    * [[recallSlice]] vec_ids — bounded O(slice²) work at any corpus scale). */
  val recallSlice = 200

  /** q61b: honest recall of the sign-LSH near-dup path against exact ground
    * truth — the q64 pattern applied to q61. Ground truth = ALL pairs with
    * cosine >= 0.15 inside a fixed slice (vec_id < [[recallSlice]]), computed
    * by exact all-pairs; caught = those the capped sign-LSH buckets surface.
    * Both counts are VALUE-pinned by the oracle (it recomputes the same
    * deterministic pipelines), so any drift in the LSH path hash-fails.
    * The fraction is reported, not thresholded: on isotropic-random
    * embeddings a 0.15-cosine pair flips many sign bits and banded sign-LSH
    * has no recall guarantee to assert (its guarantee is the <=3-bit-flip
    * pigeonhole — true near-dups); this gate is what makes the measured
    * recall visible instead of unmeasured (the q62/q64 IVF stance). */
  def lshRecall(spark: SparkSession, dir: String): DataFrame = {
    // The slice is bounded (recallSlice rows at ANY corpus scale), so the
    // all-pairs ground truth broadcasts one side — a BNLJ over slice², never
    // a corpus-sized join.
    val v = vectors(spark, dir).where(col("vec_id") < recallSlice)
    val truth = v.as("a").join(broadcast(v.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
        (dot_d(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= 0.15)
      .select(col("d1"), col("d2"))
    val caught = nearDupLsh(spark, dir)
      .where(col("d1") < recallSlice && col("d2") < recallSlice)
      .select(col("d1"), col("d2"), lit(1).as("hit"))
    truth.join(caught, Seq("d1", "d2"), "left")
      .agg(count(lit(1)).as("n_true"), count(col("hit")).as("n_caught"))
  }

  private val lshRecallSql =
    s"""WITH n AS ($vectorsSql),
       |$cappedSignBandsSql,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bits = b.bits AND a.vec_id < b.vec_id),
       |caught AS (
       |  SELECT c.d1, c.d2
       |  FROM cand c JOIN n x ON x.vec_id = c.d1 JOIN n y ON y.vec_id = c.d2
       |  WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.15
       |    AND c.d1 < $recallSlice AND c.d2 < $recallSlice),
       |truth AS (
       |  SELECT a.vec_id AS d1, b.vec_id AS d2
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id
       |  WHERE a.vec_id < $recallSlice AND b.vec_id < $recallSlice
       |    AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.15)
       |SELECT CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(c.d1) AS BIGINT) AS n_caught
       |FROM truth t LEFT JOIN caught c ON c.d1 = t.d1 AND c.d2 = t.d2""".stripMargin

  /** IVF-style ANN: a deterministic coarse quantizer (argmax over the
    * first 4 components — i.e. nearest of 4 axis-aligned centroids) assigns
    * every vector to an inverted list; queries probe ONLY their own list,
    * then rank by exact cosine. The IVF shape at scale: the corpus scan
    * becomes a partition-pruned bucket scan (bucket as a partition column),
    * cost drops from O(corpus) to O(corpus / nlist) per query. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = vectors(spark, dir)
      .withColumn("bucket",
        expr("array_position(slice(v, 1, 4), array_max(slice(v, 1, 4)))"))
    val q = bucketed.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    bucketed.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot_d(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
  }

  private val knnIvfSql =
    s"""WITH n AS (
       |  SELECT vec_id, v, nrm,
       |    list_position(v[1:4], list_max(v[1:4])) AS bucket
       |  FROM ($vectorsSql) t),
       |p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       |  FROM n q JOIN n c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 5)
       |SELECT query_id, neighbor_id, cos, rn FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM p) t
       |WHERE rn <= 3""".stripMargin

  /** Probes per query for the multi-probe IVF variant. */
  val nProbe = 2

  /** q107: MULTI-probe IVF — the standard fix for single-probe recall
    * (q62's honestly-reported weakness: with no cluster structure, a
    * query's true neighbors often live one bucket over). Each query ranks
    * the coarse-quantizer cells by its own component values (descending,
    * index-ascending tiebreak — `0.0 - x` instead of `-x` canonicalizes
    * -0.0 so both engines sort identically) and probes the top [[nProbe]];
    * the candidate set is a strict superset of q62's, so per-query top-3
    * cosine mass can only improve (`PropertySpec` pins that theorem).
    * Scale: cost per query rises from O(corpus/nlist) to
    * O(nProbe·corpus/nlist), still partition-pruned bucket scans — the
    * recall/latency dial every IVF deployment exposes. */
  def knnIvfMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = vectors(spark, dir)
      .withColumn("bucket",
        expr("array_position(slice(v, 1, 4), array_max(slice(v, 1, 4)))"))
    // One query row per probed cell (explode of the nProbe ranked cells):
    // the bucket match becomes an EQUI key, so the plan is a broadcast HASH
    // join on bucket — at scale that key is the partition column and the
    // probe list prunes to nProbe bucket scans. (An array_contains join
    // would plan as a nested-loop over the whole corpus instead.) A corpus
    // vector has one bucket, so it matches at most one probe per query —
    // the explode cannot duplicate pairs.
    val q = vectors(spark, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(expr("slice(transform(array_sort(zip_with(slice(v, 1, 4), " +
          "sequence(1, 4), (x, i) -> named_struct('negv', 0.0D - x, " +
          s"'idx', CAST(i AS BIGINT)))), s -> s.idx), 1, $nProbe)"))
          .as("probe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    bucketed.join(broadcast(q),
        col("bucket") === col("probe") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot_d(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
  }

  private val knnIvfMultiprobeSql =
    s"""WITH n AS (
       |  SELECT vec_id, v, nrm,
       |    list_position(v[1:4], list_max(v[1:4])) AS bucket
       |  FROM ($vectorsSql) t),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn,
       |    list_transform(list_sort(list_transform(range(1, 5),
       |      i -> {'negv': 0.0 - v[i], 'idx': i})), s -> s.idx)[1:$nProbe]
       |      AS probes
       |  FROM ($vectorsSql) t2 WHERE vec_id < 5),
       |p AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.qv, c.v) / (q.qn * c.nrm) AS cos
       |  FROM q JOIN n c
       |    ON list_contains(q.probes, c.bucket) AND c.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, cos, rn FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT)
       |    AS rn
       |  FROM p) t
       |WHERE rn <= 3""".stripMargin

  /** Candidate depth for the re-ranked ANN: the exact pass re-scores this
    * many sketch-ranked candidates per query. Measured recall@3 vs the q60
    * ground truth is 15/15 at every test scale with depth 20; 50 gives
    * margin at negligible cost (the exact pass is 50 rows per query). */
  val rerankDepth = 50

  /** Re-ranked scalar-quantization ANN (the SQ8 + re-rank pattern): stage 1
    * scores the WHOLE corpus with an int8-quantized dot product — at scale
    * that's a quarter of the memory bandwidth of the float scan, and in a
    * real deployment the quantized column is the only one the scan reads —
    * and keeps the top [[rerankDepth]] per query; stage 2 re-ranks only
    * those with exact cosine. Unlike bucketing ANN (q61/q62), recall does
    * not depend on the corpus having cluster structure: the sketch score is
    * correlated with the true score on ANY data (quantization error is
    * bounded per component), which is why this is the variant the recall
    * gate (q64) holds to a hard threshold. Quantization uses floor (not
    * round) so both engines produce identical integer-valued doubles. */
  def knnRerank(spark: SparkSession, dir: String): DataFrame = {
    val base = vectors(spark, dir).withColumn("vq",
      expr("transform(v, x -> CAST(floor(greatest(-1.0D, least(1.0D, x)) * 127) AS DOUBLE))"))
    val q = base.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("vq").as("qq"))
    val wSketch = Window.partitionBy(col("query_id"))
      .orderBy(col("sq").desc, col("neighbor_id").asc)
    val cand = base.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("qn"), col("v"), col("nrm"),
        dot_d(col("qq"), col("vq")).as("sq"))
      .withColumn("crn", row_number().over(wSketch))
      .where(col("crn") <= rerankDepth)
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.select(col("query_id"), col("neighbor_id"),
        (dot_d(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(wExact).cast("long"))
      .where(col("rn") <= 3)
  }

  private val knnRerankSql =
    s"""WITH b AS (
       |  SELECT vec_id, v, nrm,
       |    list_transform(v,
       |      x -> CAST(floor(greatest(-1.0, least(1.0, x)) * 127) AS DOUBLE)) AS vq
       |  FROM ($vectorsSql) t),
       |cand AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      q.v AS qv, q.nrm AS qn, c.v AS cv, c.nrm AS cnrm,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.vq, c.vq) DESC, c.vec_id) AS crn
       |    FROM b q, b c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id) z
       |  WHERE crn <= $rerankDepth)
       |SELECT query_id, neighbor_id, cos, rn FROM (
       |  SELECT query_id, neighbor_id,
       |    list_dot_product(qv, cv) / (qn * cnrm) AS cos,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY list_dot_product(qv, cv) / (qn * cnrm) DESC, neighbor_id) AS rn
       |  FROM cand) t2
       |WHERE rn <= 3""".stripMargin

  /** Recall@3 gate for the ANN variants against q60's exact ground truth —
    * the q47b pattern applied to similarity search. Per query: the hit
    * counts of the IVF (q62) and re-ranked (q63) top-3 against the exact
    * top-3. Both counts are VALUE-pinned by the oracle (it recomputes the
    * same deterministic pipelines, so any drift in either ANN's output
    * hash-fails the gate), and the re-ranked variant additionally carries a
    * hard TRUE-literal quality bar: `rerank_ok` asserts >= 2 of 3 exact
    * neighbors found (measured: 3 of 3 at every test scale). The IVF's
    * hits are reported but NOT thresholded — on cluster-free data a
    * single-probe bucketing index has no recall guarantee to assert, and
    * this gate is what makes that visible instead of unmeasured.
    *
    * SCALE-VALIDATED gate: `rerank_ok` is pinned TRUE by the oracle.
    * Measured rr_hits = 3/3 for every query at sf0.001 (500 vecs), sf0.01
    * (500), and sf0.1 (2000) — the bound asserted (>= 2 of 3) leaves one
    * neighbor of margin below the measured floor. Re-measure rule: when a
    * new sf is added to the test matrix, run q60+q63 at that sf FIRST and
    * confirm rr_hits >= 2 before trusting this gate there; if a corpus
    * ever breaks it, the fix is raising [[rerankDepth]], not the gate. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact3 = knnBrute(spark, dir).where(col("rn") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    val ivf3 = knnIvf(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("ivf_hit"))
    val rr3 = knnRerank(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("rr_hit"))
    exact3
      .join(ivf3, Seq("query_id", "neighbor_id"), "left")
      .join(rr3, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        count(col("ivf_hit")).as("ivf_hits"),
        count(col("rr_hit")).as("rr_hits"))
      .select(col("query_id"), col("n_exact"), col("ivf_hits"), col("rr_hits"),
        (col("rr_hits") >= 2).as("rerank_ok"))
  }

  private val annRecallSql =
    s"""WITH ex AS (
       |  SELECT query_id, neighbor_id FROM ($knnBruteSql) WHERE rn <= 3),
       |ivf AS (SELECT query_id, neighbor_id FROM ($knnIvfSql)),
       |rr AS (SELECT query_id, neighbor_id FROM ($knnRerankSql))
       |SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(count(i.neighbor_id) AS BIGINT) AS ivf_hits,
       |  CAST(count(r.neighbor_id) AS BIGINT) AS rr_hits,
       |  TRUE AS rerank_ok
       |FROM ex e
       |LEFT JOIN ivf i
       |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
       |LEFT JOIN rr r
       |  ON r.query_id = e.query_id AND r.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  // ---- q209: retrieval quality — MRR of the IVF path ----------------------

  /** q209: MEAN-RECIPROCAL-RANK evaluation of the IVF index against the
    * brute-force ground truth — index-quality measurement as a
    * first-class operator (the q64 recall companion answers "is the true
    * neighborhood covered"; MRR answers "how high does the TRUE nearest
    * neighbor rank", the metric retrieval dashboards actually track).
    * Reciprocal ranks are kept EXACT as sixths (6 = lcm(1..3), the
    * shortlist depth): rr6 ∈ {6, 3, 2, 0} — no IEEE division, so every
    * per-query row hash-grades; the corpus MRR is Σrr6 / (6·|Q|),
    * derivable by the reader. A miss (true NN absent from the shortlist)
    * scores 0, not dropped — the q176 zero-fill discipline. */
  def retrievalMrr(spark: SparkSession, dir: String): DataFrame = {
    val truth = knnBrute(spark, dir).where(col("rn") === 1)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = knnIvf(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rn"))
    truth.join(ivf, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("neighbor_id").as("true_nn"),
        coalesce(col("rn"), lit(0L)).as("ivf_rank"),
        expr("CASE WHEN rn IS NULL THEN 0L ELSE 6L div rn END").as("rr6"))
  }

  private val retrievalMrrSql =
    s"""WITH ex AS (
       |  SELECT query_id, neighbor_id FROM ($knnBruteSql) WHERE rn = 1),
       |ivf AS (SELECT query_id, neighbor_id, rn FROM ($knnIvfSql))
       |SELECT e.query_id, e.neighbor_id AS true_nn,
       |  CAST(coalesce(i.rn, 0) AS BIGINT) AS ivf_rank,
       |  CAST(CASE WHEN i.rn IS NULL THEN 0 ELSE 6 // i.rn END AS BIGINT)
       |    AS rr6
       |FROM ex e LEFT JOIN ivf i
       |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id""".stripMargin

  /** Embedding-cosine near-dup, blocked by `label`: all pairs within a block
    * with cosine >= 0.3 -> (keep_id=min, dup_id=max). The blocked self-join
    * is the scale shape for semantic dedup: the shuffle key is the block, so
    * the pair space is sum(block²) not corpus², and each block's pairs are
    * computed partition-locally. (q61 is the unblocked variant with LSH
    * pruning; here the block key is a given attribute.) */
  def dedupCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(dot_d(col("v"), col("v"))))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("keep_id"), col("b.vec_id").as("dup_id"),
        (dot_d(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= 0.3)
  }

  private val dedupCosineSql =
    """WITH n AS (
      |  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
      |  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings))
      |SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
      |  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.3""".stripMargin

  // ---- q65: distributed k-means over embeddings ---------------------------

  private val kmK = 8
  private val kmIters = 4

  /** One Lloyd assignment pass with ALL centroids broadcast as a single
    * array row: each point scores every centroid with higher-order array
    * functions and keeps the argmin — entirely map-side, ZERO shuffle of
    * the corpus. (The alternative — explode points×centroids and
    * groupBy(point) — re-shuffles the full vector column every iteration;
    * at 100 TB that shuffle IS the cost of k-means done wrong.) d2 uses
    * ||x-c||² = x·x + c·c - 2x·c with both squared norms precomputed.
    * Ties break on cid via the struct ordering of array_min.
    *
    * The inner product is the native `dot_d` expression — registered into
    * the session's FunctionRegistry at build time so the expr() text
    * resolves even in an extension-less session (the driver's). Inside the
    * transform() lambda the outer HigherOrderFunction stays interpreted
    * (Spark's lambda functions don't codegen), but dot_d replaces the
    * `aggregate(zip_with(...))` form, which allocated an intermediate
    * k-element array per point×centroid and folded it through boxed lambda
    * variables — the per-row allocation in the hottest loop of the fit.
    * Bit-identical result: dot_d's multiply-accumulate is the same
    * left-to-right fold (`PlanSpec` pins the no-ZipWith/ArrayAggregate
    * shape). */
  private[graft] def kmAssign(pts: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.GraftExtensions.registerDotD(pts.sparkSession)
    pts.crossJoin(broadcast(
        cents.agg(collect_list(struct(col("cid"), col("cv"), col("csq"))).as("cs"))))
      .withColumn("s", expr(
        """array_min(transform(cs, c -> struct(
          |  sq + c.csq - 2.0D * dot_d(v, c.cv) AS d2,
          |  c.cid AS cid)))""".stripMargin))
      .select(col("vec_id"), col("v"),
        col("s.cid").as("cid"), col("s.d2").as("d2"))
  }

  /** Centroid update: per-dimension mean via posexplode → partial-agg
    * avg per (cid, pos) — the shuffle carries only k×d×partitions partial
    * sums, never the corpus — then reassembled in dimension order. */
  private def kmUpdate(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("cx"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), p -> p.cx)")
        .as("cv"))
      .withColumn("csq", dot_d(col("cv"), col("cv")))

  /** Distributed k-means (Lloyd's) over the embedding corpus — the
    * clustering step of embedding-based data curation. Deterministic
    * seeding (the first k vectors by id), [[kmIters]] fixed iterations,
    * per-round `localCheckpoint` to truncate lineage (the q55 lesson: an
    * iterative plan that references itself doubles per round). Centroid
    * float values are aggregation-order-sensitive at the ULP level, so the
    * gate follows the q47b pattern: the oracle pins the exact row count
    * and the structural constants, and TRUE-literal booleans assert the
    * properties Lloyd guarantees — final inertia NO GREATER than the
    * seed-assignment inertia (non-strict: Lloyd's guarantees non-increase,
    * and on a degenerate input whose seeds already cover every distinct
    * vector both inertias are exactly 0 — a strict < would deterministically
    * fail there, the same trap as a 1-rsd sketch gate), and a non-empty
    * bounded cluster set.
    *
    * SCALE-VALIDATED gate: `inertia_improved` / `clusters_ok` are pinned
    * TRUE by the oracle. Unlike an empirical threshold these assert a
    * THEOREM (Lloyd's monotonicity; k_used ∈ [1,k] by construction) over
    * exact comparisons of deterministically-computed doubles — they hold at
    * any sf by proof, and were additionally measured green at sf0.001/
    * sf0.01/sf0.1. Re-measure rule for a new sf: none required beyond the
    * standard verify run — a failure would indicate a code defect, not a
    * scale effect. */
  /** Shared corpus-point view for the k-means family. */
  private def kmPoints(spark: SparkSession, dir: String): DataFrame =
    vectors(spark, dir)
      .withColumn("sq", dot_d(col("v"), col("v")))
      .select(col("vec_id"), col("v"), col("sq"))

  /** Deterministic seeds: the first k vectors by id. */
  private def kmSeeds(pts: DataFrame): DataFrame =
    pts.where(col("vec_id") < kmK)
      .select(col("vec_id").cast("int").as("cid"),
        col("v").as("cv"), col("sq").as("csq"))

  /** The trained centroid table, memoized per (session, sf): q65 grades
    * the fit and q161 consumes it for semantic dedup — training runs once
    * per pass, like the q127/q140 shared edge list. */
  private[graft] def kmCentroids(spark: SparkSession, dir: String): DataFrame =
    Memo("km_cents", spark, dir) {
      val pts = kmPoints(spark, dir)
      var cents = kmSeeds(pts)
      for (_ <- 1 to kmIters)
        cents = kmUpdate(kmAssign(pts, cents)).localCheckpoint()
      cents
    }

  // ---- q203: incremental k-means sufficient-statistics commit -------------

  /** q203: INCREMENTAL maintenance of the learned clustering — the
    * mini-batch update every production embedding-curation stack runs
    * when new vectors arrive: the model's SUFFICIENT STATISTICS
    * (per-cluster count and per-dimension coordinate sum under the FIXED
    * learned centroids, the q65 memoized artifact) are a commutative
    * monoid, so the committed gen0 statistics merge with the arriving
    * batch's by pure addition — the historical corpus is never
    * re-assigned, and the merge moves k·d rows however much corpus
    * either side summarizes. Updated centroids are then means read off
    * gen1 (one tiny division per (cid, pos)), exactly Lloyd's next step.
    *
    * Exactness: IEEE float addition is non-associative, so a
    * sum-of-doubles would differ between the incremental and rebuilt
    * paths at the ULP — the coordinate sums are therefore DECIMAL(30,15)
    * casts (the q179/q118 Exact discipline), making the monoid claim a
    * bit-equality, not an approximation. The gate COMPARES the committed
    * gen1 against a full-corpus rebuild per (cid, pos): `merge_exact`
    * pins statistic equality, `counts_match` pins membership, and the
    * oracle grades them TRUE alongside the exact corpus count (the q65
    * theorem-gate pattern — a float drift, a lost vector, or a
    * double-merged partition flips a boolean). */
  def kmeansCommit(spark: SparkSession, dir: String): DataFrame = {
    val cents = kmCentroids(spark, dir)
    def statsOf(pred: org.apache.spark.sql.Column): DataFrame =
      kmAssign(kmPoints(spark, dir).where(pred), cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(30,15)")).as("s"))
    // ONE assignment pass produces BOTH sides, keyed by the disjoint
    // history/batch split — the gate's independence is untouched: the
    // full-corpus rebuild below is still a SEPARATE pass, so merged ==
    // rebuilt remains a real two-computation comparison, it just no
    // longer pays a third corpus scan to build the halves separately
    val halves = kmAssign(kmPoints(spark, dir), cents)
      .select((col("vec_id") % 10 === 7).as("is_batch"),
        col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("is_batch"), col("cid"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(30,15)")).as("s"))
      .localCheckpoint()
    val gen0 = Warehouse.materializeBucketed(spark,
      halves.where(!col("is_batch")).drop("is_batch"),
      "graft_km_gen0", 4, Seq("cid"))
    val merged = gen0.unionByName(halves.where(col("is_batch")).drop("is_batch"))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
    val gen1 = Warehouse.materializeBucketed(spark, merged,
      "graft_km_gen1", 4, Seq("cid"))
    val full = statsOf(lit(true))
    val cmp = gen1.as("g").join(full.as("f"), Seq("cid", "pos"), "full_outer")
      .agg(
        min(col("g.n").isNotNull && col("f.n").isNotNull &&
          col("g.n") === col("f.n")).as("counts_match"),
        min(col("g.s").isNotNull && col("f.s").isNotNull &&
          col("g.s") === col("f.s")).as("merge_exact"))
    val d = Tables(spark, dir, "embeddings").agg(count(lit(1)).as("n_points"))
    d.crossJoin(broadcast(cmp))
      .select(col("n_points"), lit(kmK.toLong).as("k"),
        col("counts_match"), col("merge_exact"))
  }

  private val kmeansCommitSql =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_points,
       |  CAST($kmK AS BIGINT) AS k,
       |  TRUE AS counts_match, TRUE AS merge_exact
       |FROM embeddings""".stripMargin

  def kmeansFit(spark: SparkSession, dir: String): DataFrame = {
    val pts = kmPoints(spark, dir)
    val a0 = kmAssign(pts, kmSeeds(pts))
    val aF = kmAssign(pts, kmCentroids(spark, dir))
    val i0 = a0.agg(sum(col("d2")).as("i0"))
    aF.agg(count(lit(1)).as("n_points"),
        countDistinct(col("cid")).as("k_used"),
        sum(col("d2")).as("i_final"))
      .crossJoin(broadcast(i0))
      .select(col("n_points"),
        lit(kmK.toLong).as("k"), lit(kmIters.toLong).as("n_iters"),
        (col("i_final") <= col("i0")).as("inertia_improved"),
        col("k_used").between(1, kmK).as("clusters_ok"))
  }

  private val kmeansFitSql =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_points,
       |  CAST($kmK AS BIGINT) AS k, CAST($kmIters AS BIGINT) AS n_iters,
       |  TRUE AS inertia_improved, TRUE AS clusters_ok
       |FROM embeddings""".stripMargin

  /** Minimum fraction (percent) of exact label-blocked near-dup pairs the
    * learned clustering must co-cluster. MEASURED: 34/31/29% at
    * sf0.001/0.01/0.1 — k=8 centroids over 10 overlapping label clouds
    * structurally split some label mass across clusters (SemDeDup accepts
    * exactly this loss; production raises k, it does not chase 100%).
    * Random assignment co-clusters ~1/k ≈ 12%, so the 20% floor is the
    * meaningful half-way gate: a broken/degenerate fit fails it, the real
    * fit clears it with ~1.5× headroom at every sf. Re-measure rule: new
    * sf → run q161 once, confirm n_co/n_true_pairs stays ≥ 0.25 before
    * trusting the gate. */
  private val semRecallPct = 20L

  /** q161: SEMANTIC DEDUP, SemDeDup-shaped (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding corpus with the LEARNED
    * k-means fit (the q65 centroids, memoized), then prune near-duplicate
    * pairs WITHIN clusters only — the pair space collapses from corpus²
    * to Σ|cluster|², which is the entire reason semantic dedup runs at
    * 100 TB (the within-cluster self-join shuffles on cid; centroid
    * assignment is the q65 map-side pass, so the corpus shuffles exactly
    * once, on the cluster key).
    *
    * Graded the q47b way, with the q61b/q64 recall twist: the exact
    * ground truth is q54's label-blocked cosine pairs (oracle-computable;
    * labels play the role of known-duplicate groups), and the output pins
    *  - `n_true_pairs` exactly (the oracle recomputes q54's join);
    *  - `subset_ok`: co-clustered true pairs ≤ true pairs (theorem);
    *  - `drop_covers_ok`: every co-clustered true pair's higher id is
    *    among the dropped ids (theorem — such a pair IS a within-cluster
    *    pair above threshold, so its max endpoint gets dropped);
    *  - `recall_ok`: the learned clusters co-locate ≥ [[semRecallPct]]%
    *    of the true pairs — the empirical gate that fails on a broken or
    *    degenerate fit (random assignment co-clusters ~1/k). */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val pts = kmPoints(spark, dir)
    val assigned = kmAssign(pts, kmCentroids(spark, dir))
      .select(col("vec_id"), col("cid"), col("v"),
        sqrt(dot_d(col("v"), col("v"))).as("nrm"))
      .localCheckpoint() // three consumers: pair join (both sides) + recall
    val clusterPairs = assigned.as("x").join(assigned.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .select(col("y.vec_id").as("drop_id"),
        (dot_d(col("x.v"), col("y.v")) /
          (col("x.nrm") * col("y.nrm"))).as("cos"))
      .where(col("cos") >= 0.3)
    val nDropped = clusterPairs.agg(
      countDistinct(col("drop_id")).as("n_dropped"))
    val truth = dedupCosine(spark, dir)
      .join(assigned.select(col("vec_id").as("keep_id"), col("cid").as("ca")),
        Seq("keep_id"))
      .join(assigned.select(col("vec_id").as("dup_id"), col("cid").as("cb")),
        Seq("dup_id"))
    val dropSet = clusterPairs.select(col("drop_id")).distinct()
    val truthAgg = truth
      .join(dropSet.withColumnRenamed("drop_id", "dup_id")
        .withColumn("dropped", lit(1)), Seq("dup_id"), "left")
      .agg(count(lit(1)).as("n_true_pairs"),
        count_if(col("ca") === col("cb")).as("n_co"),
        count_if(col("ca") === col("cb") && col("dropped").isNull)
          .as("n_co_undropped"))
    truthAgg.crossJoin(broadcast(nDropped))
      .select(col("n_true_pairs"),
        (col("n_co") <= col("n_true_pairs")).as("subset_ok"),
        (col("n_co_undropped") === 0L &&
          col("n_dropped") >= 0L).as("drop_covers_ok"),
        (col("n_co") * 100L >= col("n_true_pairs") * semRecallPct)
          .as("recall_ok"))
  }

  private val semanticDedupSql =
    """WITH n AS (
      |  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
      |  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings))
      |SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
      |  TRUE AS subset_ok, TRUE AS drop_covers_ok, TRUE AS recall_ok
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.3""".stripMargin

  /** q143: hybrid retrieval via RECIPROCAL RANK FUSION — each query's
    * top-100 by cosine and top-100 by raw inner product (two retrievers
    * that genuinely disagree on unnormalized vectors: cosine is
    * direction-only, the dot product rewards magnitude) are fused by
    * RRF(c) = Σ_lists 10⁹ div (60 + rank), the standard-constant (k=60,
    * Cormack et al. SIGIR'09) formula in EXACT integer arithmetic —
    * rank positions are integers, so scaled floor-division reciprocals
    * make the fused score engine-independent, where a float 1/(60+r)
    * sum could tie-break differently at the ULP.
    *
    * Scale shape: fusion consumes only the per-retriever TOP-K lists
    * (rank windows partitioned per query — at 100 TB these are the ANN
    * shortlists of q62/q63, not full scans), then a |queries|·≤2K-row
    * full outer join on the candidate key; a doc missing from one list
    * simply contributes that list's term as 0. Final top-5 per query by
    * the exact (rrf desc, id) order. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val e = vectors(spark, dir)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot_d(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"),
        dot_d(col("qv"), col("v")).as("dp"))
    def topList(score: String): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col(score).desc, col("neighbor_id").asc)
      scored.withColumn("r", row_number().over(w))
        .where(col("r") <= 100)
        .select(col("query_id"), col("neighbor_id"),
          expr("CAST(1000000000 div (60 + r) AS BIGINT)").as(s"s_$score"))
    }
    val fused = topList("cos")
      .join(topList("dp"), Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        (coalesce(col("s_cos"), lit(0L)) + coalesce(col("s_dp"), lit(0L)))
          .as("rrf"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("neighbor_id").asc)
    fused.withColumn("rn", row_number().over(wf).cast("long"))
      .where(col("rn") <= 5)
  }

  private val rrfFusionSql =
    s"""WITH n AS ($vectorsSql),
       |p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos,
       |    list_dot_product(q.v, c.v) AS dp
       |  FROM n q, n c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |tc AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(1000000000 // (60 + r) AS BIGINT) AS s_cos
       |  FROM (SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r
       |    FROM p) t WHERE r <= 100),
       |td AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(1000000000 // (60 + r) AS BIGINT) AS s_dp
       |  FROM (SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY dp DESC, neighbor_id) AS r
       |    FROM p) t WHERE r <= 100),
       |f AS (
       |  SELECT coalesce(tc.query_id, td.query_id) AS query_id,
       |    coalesce(tc.neighbor_id, td.neighbor_id) AS neighbor_id,
       |    coalesce(tc.s_cos, 0) + coalesce(td.s_dp, 0) AS rrf
       |  FROM tc FULL JOIN td ON tc.query_id = td.query_id
       |    AND tc.neighbor_id = td.neighbor_id)
       |SELECT query_id, neighbor_id, rrf, rn FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS BIGINT)
       |    AS rn
       |  FROM f) z
       |WHERE rn <= 5""".stripMargin

  // ---- q168: STREAMING ANN-index ingest -----------------------------------

  /** q168: the ANN complement of q117's streaming ingest screen — new
    * embedding vectors arrive as micro-batches and each is screened ON
    * ARRIVAL against the PERSISTED bucketed IVF index: assign the
    * arrival's coarse cell row-locally (q62's deterministic quantizer),
    * probe ONLY that cell of the history store for the exact top-1 cosine
    * neighbor, and emit an insert/near-dup decision per arrival. The
    * per-arrival rank needs a window, so the screen runs per micro-batch
    * inside `foreachBatch` (q133's stateless enrichment shape, append
    * mode, zero stream-side state).
    *
    * Scale: the store is bucketed on the cell key, so a probe touches one
    * cell's partition, O(corpus/nlist) per arrival; the history side
    * refreshes per trigger from the store table and the q120-style
    * commit absorbs accepted arrivals back into the index. Hash-exact
    * because per-pair dot products are fixed-order folds (bit-identical
    * to DuckDB's `list_dot_product`, as q60 proves) and top-1 is a MAX —
    * order-insensitive, no float accumulation across rows. */
  def streamAnnIngest(spark: SparkSession, dir: String): DataFrame = {
    val cell = expr("array_position(slice(v, 1, 4), array_max(slice(v, 1, 4)))")
    Warehouse.materializeBucketed(spark,
      vectors(spark, dir).where(col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("neighbor_id"), col("v").as("hv"),
          col("nrm").as("hn"), cell.cast("long").as("bucket")),
      "graft_ivf_store", 8, Seq("bucket"))
    graft.streaming.EventStreams.boundedVecPerBatchRun(spark, dir, batch => {
      val st = batch.sparkSession.table("graft_ivf_store")
      val arr = batch.where(col("vec_id") % 10 === 0)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS double))").as("v"))
        .withColumn("nrm", sqrt(dot_d(col("v"), col("v"))))
        .withColumn("bucket", cell.cast("long"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      arr.join(broadcast(st), Seq("bucket"), "left")
        .withColumn("cos", dot_d(col("v"), col("hv")) / (col("nrm") * col("hn")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("bucket"), col("neighbor_id"), col("cos"),
          when(col("cos") >= 0.9, lit("near_dup"))
            .when(col("cos").isNull, lit("insert_new_cell"))
            .otherwise(lit("insert")).as("decision"))
    })
  }

  private val streamAnnIngestSql =
    s"""WITH n AS ($vectorsSql),
       |b AS (
       |  SELECT vec_id, v, nrm,
       |    CAST(list_position(v[1:4], list_max(v[1:4])) AS BIGINT) AS bucket
       |  FROM n),
       |hist AS (
       |  SELECT vec_id AS neighbor_id, v AS hv, nrm AS hn, bucket
       |  FROM b WHERE vec_id % 10 <> 0),
       |arr AS (SELECT vec_id, v, nrm, bucket FROM b WHERE vec_id % 10 = 0),
       |p AS (
       |  SELECT a.vec_id, a.bucket, h.neighbor_id,
       |    list_dot_product(a.v, h.hv) / (a.nrm * h.hn) AS cos
       |  FROM arr a LEFT JOIN hist h ON h.bucket = a.bucket),
       |r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM p)
       |SELECT vec_id, bucket, neighbor_id, cos,
       |  CASE WHEN cos >= 0.9 THEN 'near_dup'
       |       WHEN cos IS NULL THEN 'insert_new_cell'
       |       ELSE 'insert' END AS decision
       |FROM r WHERE rn = 1""".stripMargin

  // ---- q169: ANN store COMMIT ----------------------------------------------

  /** q169: the WRITE side closing q168's vector-ingest cycle (q120's
    * commit applied to the ANN index): screen the arrival batch against
    * the gen0 bucketed store — accept when the in-cell best cosine is
    * under the near-dup bar (or the cell is empty) — then write gen1 =
    * gen0 ∪ accepted, bucketed on the cell key for the next cycle's
    * probes. Returns per-cell stats of the READ-BACK gen1 table with an
    * exact `sum(vec_id)` membership checksum, so the oracle (a
    * full-corpus recompute of the same accept rule) pins the committed
    * membership itself, not just counts.
    *
    * Scale: the screen joins arrivals to one cell each (bucket-pruned);
    * the merge moves only the store and the accepted batch — corpus
    * vectors are never re-read; max() over deterministic per-pair dots is
    * order-insensitive, so the accept decision is hash-exact. */
  /** The committed gen1 IVF store (gen0 history + near-dup-screened
    * arrivals), read back from its bucketed table — ONE build shared by
    * the q169 commit summary and the q206 audit. */
  private def ivfGen1(spark: SparkSession, dir: String): DataFrame = {
    val cell = expr("array_position(slice(v, 1, 4), array_max(slice(v, 1, 4)))")
    val bucketed = vectors(spark, dir).withColumn("bucket", cell.cast("long"))
    val gen0 = Warehouse.materializeBucketed(spark,
      bucketed.where(col("vec_id") % 10 =!= 0)
        .select(col("vec_id"), col("v"), col("nrm"), col("bucket")),
      "graft_ivf_gen0", 8, Seq("bucket"))
    val arr = bucketed.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("v").as("av"), col("nrm").as("an"),
        col("bucket"))
    val best = arr
      .join(broadcast(gen0.select(col("v").as("hv"), col("nrm").as("hn"),
        col("bucket"))), Seq("bucket"), "left")
      .groupBy(col("vec_id"))
      .agg(max(dot_d(col("av"), col("hv")) / (col("an") * col("hn")))
        .as("best"))
    val accepted = arr.join(best, Seq("vec_id"))
      .where(col("best").isNull || col("best") < 0.9)
      .select(col("vec_id"), col("av").as("v"), col("an").as("nrm"),
        col("bucket"))
    Warehouse.materializeBucketed(spark,
      gen0.unionByName(accepted), "graft_ivf_gen1", 8, Seq("bucket"))
  }

  def annStoreCommit(spark: SparkSession, dir: String): DataFrame =
    ivfGen1(spark, dir).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("vec_id")).as("id_checksum"),
        count(when(col("vec_id") % 10 === 0, 1)).as("n_inserted"))

  // ---- q206: ANN index staleness / integrity audit -------------------------

  /** q206: the AUDIT member of the ANN store cycle (q168 ingests, q169
    * commits, this reconciles) — the question an index operator asks
    * before trusting retrieval: does the committed index still account
    * for the corpus? A full-outer compare of the current corpus against
    * the read-back gen1 on vec_id classifies every row: indexed,
    * rejected-as-near-dup (an EXPLAINED absence — the commit's screen
    * dropped it by design), unexplained-missing (corpus rows the index
    * silently lost — must be zero), stale (index rows no longer in the
    * corpus — must be zero), and bucket drift (stored cell ≠ recomputed
    * cell — must be zero). `account_ok` pins the partition: every corpus
    * row is exactly one of indexed/rejected/unexplained.
    *
    * Scale shape: one id-keyed outer join of two 8-byte-keyed tables plus
    * the corpus-side cell recompute (map-side) — never a vector-space
    * operation; at 100 TB the audit costs one co-keyed shuffle. */
  def annStoreAudit(spark: SparkSession, dir: String): DataFrame = {
    val cell = expr("array_position(slice(v, 1, 4), array_max(slice(v, 1, 4)))")
    val corpus = vectors(spark, dir)
      .select(col("vec_id"), cell.cast("long").as("bucket"))
    val g = ivfGen1(spark, dir)
      .select(col("vec_id"), col("bucket").as("sbucket"))
    corpus.join(g, Seq("vec_id"), "full_outer")
      .groupBy(coalesce(col("bucket"), col("sbucket")).as("bucket"))
      .agg(
        count(when(col("bucket").isNotNull, 1)).as("n_corpus"),
        count(when(col("bucket").isNotNull && col("sbucket").isNotNull, 1))
          .as("n_indexed"),
        count(when(col("bucket").isNotNull && col("sbucket").isNull &&
          col("vec_id") % 10 === 0, 1)).as("n_rejected"),
        count(when(col("bucket").isNotNull && col("sbucket").isNull &&
          col("vec_id") % 10 =!= 0, 1)).as("n_unexplained"),
        count(when(col("bucket").isNull, 1)).as("n_stale"),
        count(when(col("bucket").isNotNull && col("sbucket").isNotNull &&
          col("bucket") =!= col("sbucket"), 1)).as("n_drift"))
      .select(col("bucket"), col("n_corpus"), col("n_indexed"),
        col("n_rejected"), col("n_unexplained"), col("n_stale"),
        col("n_drift"),
        (col("n_corpus") === col("n_indexed") + col("n_rejected") +
          col("n_unexplained")).as("account_ok"))
  }

  private val annStoreAuditSql =
    s"""WITH n AS ($vectorsSql),
       |b AS (
       |  SELECT vec_id, v, nrm,
       |    CAST(list_position(v[1:4], list_max(v[1:4])) AS BIGINT) AS bucket
       |  FROM n),
       |hist AS (SELECT vec_id, v, nrm, bucket FROM b WHERE vec_id % 10 <> 0),
       |arr AS (SELECT vec_id, v, nrm, bucket FROM b WHERE vec_id % 10 = 0),
       |best AS (
       |  SELECT a.vec_id, a.bucket,
       |    max(list_dot_product(a.v, h.v) / (a.nrm * h.nrm)) AS best
       |  FROM arr a LEFT JOIN hist h ON h.bucket = a.bucket
       |  GROUP BY a.vec_id, a.bucket),
       |gen1 AS (
       |  SELECT vec_id, bucket FROM hist
       |  UNION ALL
       |  SELECT vec_id, bucket FROM best WHERE best IS NULL OR best < 0.9)
       |SELECT b.bucket, CAST(count(*) AS BIGINT) AS n_corpus,
       |  CAST(count(g.vec_id) AS BIGINT) AS n_indexed,
       |  CAST(count(CASE WHEN g.vec_id IS NULL AND b.vec_id % 10 = 0
       |    THEN 1 END) AS BIGINT) AS n_rejected,
       |  CAST(0 AS BIGINT) AS n_unexplained,
       |  CAST(0 AS BIGINT) AS n_stale,
       |  CAST(0 AS BIGINT) AS n_drift,
       |  TRUE AS account_ok
       |FROM b LEFT JOIN gen1 g ON g.vec_id = b.vec_id
       |GROUP BY b.bucket""".stripMargin

  private val annStoreCommitSql =
    s"""WITH n AS ($vectorsSql),
       |b AS (
       |  SELECT vec_id, v, nrm,
       |    CAST(list_position(v[1:4], list_max(v[1:4])) AS BIGINT) AS bucket
       |  FROM n),
       |hist AS (SELECT vec_id, v, nrm, bucket FROM b WHERE vec_id % 10 <> 0),
       |arr AS (SELECT vec_id, v, nrm, bucket FROM b WHERE vec_id % 10 = 0),
       |best AS (
       |  SELECT a.vec_id, a.bucket,
       |    max(list_dot_product(a.v, h.v) / (a.nrm * h.nrm)) AS best
       |  FROM arr a LEFT JOIN hist h ON h.bucket = a.bucket
       |  GROUP BY a.vec_id, a.bucket),
       |gen1 AS (
       |  SELECT vec_id, bucket FROM hist
       |  UNION ALL
       |  SELECT vec_id, bucket FROM best WHERE best IS NULL OR best < 0.9)
       |SELECT bucket, count(*) AS n_vectors,
       |  CAST(sum(vec_id) AS BIGINT) AS id_checksum,
       |  CAST(count(CASE WHEN vec_id % 10 = 0 THEN 1 END) AS BIGINT)
       |    AS n_inserted
       |FROM gen1 GROUP BY bucket""".stripMargin

  // ---- q175: hard-negative mining ------------------------------------------

  /** q175: hard-negative mining for contrastive training (DPR/SimCSE prep)
    * — for each query vector, the top-k most similar candidates with a
    * DIFFERENT label: similar enough to be hard, wrong by construction.
    * Same partition-pruned IVF shape as q62 (the label filter rides the
    * join predicate, so candidates never leave their cell), broadcast
    * query set, exact cosine rank — at 100 TB this is nProbe bucket scans
    * per query batch, nothing corpus-wide. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"),
        col("label"))
      .withColumn("nrm", sqrt(dot_d(col("v"), col("v"))))
      .withColumn("bucket",
        expr("array_position(slice(v, 1, 4), array_max(slice(v, 1, 4)))"))
    val q = b.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("label").as("qlabel"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    b.join(broadcast(q),
        col("bucket") === col("qbucket") &&
          col("vec_id") =!= col("query_id") &&
          col("label") =!= col("qlabel"))
      .select(col("query_id"), col("qlabel"),
        col("vec_id").as("neighbor_id"), col("label").as("nlabel"),
        (dot_d(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
  }

  private val hardNegativesSql =
    """WITH n AS (
      |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, label,
      |    list_position(v[1:4], list_max(v[1:4])) AS bucket
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)),
      |p AS (
      |  SELECT q.vec_id AS query_id, q.label AS qlabel,
      |    c.vec_id AS neighbor_id, c.label AS nlabel,
      |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      |  FROM n q JOIN n c ON c.bucket = q.bucket
      |    AND c.vec_id <> q.vec_id AND c.label <> q.label
      |  WHERE q.vec_id < 5)
      |SELECT query_id, qlabel, neighbor_id, nlabel, cos, rn FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM p) t
      |WHERE rn <= 3""".stripMargin

  // ---- q179: embedding moment matrix (fixed-point exact) -------------------

  /** The final double-space moment formulas shared verbatim by both
    * engines (one correctly-rounded IEEE op per step over exact integer
    * inputs — the q118 discipline). Scale: values are floor(x·2^20)
    * integers, so means divide by 2^20 and second moments by 2^40. */
  private val momentExprs = Seq(
    "CAST(n AS BIGINT) AS n",
    "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0D AS mean_i",
    "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0D AS mean_j",
    """(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      | - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1099511627776.0D
      | AS var_i""".stripMargin,
    """(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      | - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |   * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) / 1099511627776.0D
      | AS var_j""".stripMargin,
    """(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      | - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |   * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) / 1099511627776.0D
      | AS cov_pop""".stripMargin)

  /** q179: the dimension-pair moment matrix of the embedding table —
    * per-pair means, variances, and population covariance, the input to
    * whitening / PCA / feature-drift monitoring on a vector corpus.
    *
    * Exactness: each float component is quantized to floor(x·2^20) (a
    * float32 times a power of two is exact in double, floor has no tie
    * cases — both engines produce the identical integer), so every moment
    * is an integer sum carried in DECIMAL(38,0)/HUGEINT — accumulation
    * order cannot matter, unlike a naive double sum which would diverge
    * between engines (and between Spark partitions) at the ULP. One
    * final shared double formula per statistic (q118's recipe) converts
    * to embedding units.
    *
    * Plan shape: d·(d−1)/2 pair rows are generated per vector INSIDE the
    * scan by a nested array transform (no self-join — a join of the
    * exploded (vec, dim) table with itself would shuffle the corpus
    * twice and is the classic quadratic mistake). The heavy pair pass
    * aggregates exactly ONE decimal (the cross-moment; vi·vj is exact in
    * int64 at ≤ 2^42) per row — n, Σv, Σv² are DIMENSION quantities, so
    * they come from a cheap d-key aggregate joined back broadcast
    * instead of riding the d²/2-per-row pass ×5 (measured 2.5× on the
    * bench). Both aggregations are map-side combined into bounded key
    * spaces; the shuffles carry |partitions|·(d²/2 + d) partial rows,
    * nothing ∝ corpus size. */
  def embedMoments(spark: SparkSession, dir: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    // the d²/2 pair expansion below fuses onto this scan; a single-file
    // input would run it on ONE task (measured 3.4 s of a 4.1 s query at
    // local[32]) — rebalance first (guide §2.5, no-op on split inputs)
    val quant = Tables.spread(spark, dir, "embeddings",
        Tables(spark, dir, "embeddings").select(col("embedding")))
      .select(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))")
        .as("q"))
    // Per-DIM first moments from a d-key aggregate — n, Σv, Σv² are
    // dimension quantities, so carrying them per PAIR would multiply the
    // heavy d²/2-per-row aggregation's work ×5 for values a 64-row join
    // supplies; the pair pass sums exactly ONE decimal per row (the
    // cross-moment, whose vi·vj product is exact in int64 at ≤ 2^42).
    val dims = quant
      .select(posexplode(col("q")))
      .select(col("pos").cast("long").as("d"), col("col").as("v"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast(d38)).as("s1"),
        sum((col("v").cast(d19) * col("v").cast(d19)).cast(d38)).as("s2"))
      // referenced twice (i-side and j-side) — checkpoint the d-row table
      // so the corpus is not scanned and aggregated once per reference
      .localCheckpoint(true)
    val pairs = quant
      .select(explode(expr(
        """flatten(transform(sequence(0, size(q) - 2), i ->
          |  transform(sequence(i + 1, size(q) - 1), j ->
          |    named_struct('i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT),
          |      'p', q[i] * q[j]))))""".stripMargin)).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"), col("p.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p").cast(d38)).as("sxy"))
    pairs
      .join(broadcast(dims.select(col("d").as("i"), col("n"),
        col("s1").as("sx"), col("s2").as("sxx"))), Seq("i"))
      .join(broadcast(dims.select(col("d").as("j"),
        col("s1").as("sy"), col("s2").as("syy"))), Seq("j"))
      .select(col("i") +: col("j") +: momentExprs.map(expr): _*)
  }

  private val embedMomentsSql =
    s"""WITH v AS (
       |  SELECT list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |a AS (SELECT q, unnest(range(0, len(q) - 1)) AS i FROM v),
       |b AS (SELECT q, i, unnest(range(i + 1, len(q))) AS j FROM a),
       |p AS (
       |  SELECT i, j, q[CAST(i + 1 AS INTEGER)] AS vi,
       |    q[CAST(j + 1 AS INTEGER)] AS vj FROM b),
       |m AS (
       |  SELECT i, j, count(*) AS n,
       |    sum(vi::HUGEINT) AS sx, sum(vj::HUGEINT) AS sy,
       |    sum(vi::HUGEINT * vi::HUGEINT) AS sxx,
       |    sum(vj::HUGEINT * vj::HUGEINT) AS syy,
       |    sum(vi::HUGEINT * vj::HUGEINT) AS sxy
       |  FROM p GROUP BY i, j)
       |SELECT i, j,
       |  ${momentExprs.map(_.replace("\n", "\n|  ").replace("1048576.0D", "1048576.0").replace("1099511627776.0D", "1099511627776.0")).mkString(",\n|  ")}
       |FROM m""".stripMargin

  // ---- q181: greedy k-center coreset (farthest-first traversal) ------------

  /** q181: diverse coreset selection over the embedding corpus — the
    * greedy k-center / farthest-first traversal (Gonzalez 1985), the
    * standard "pick k maximally-spread exemplars" op for eval-set and
    * curriculum curation. Seed = the smallest vec_id; each round selects
    * the point FARTHEST from the chosen set (max–min squared distance,
    * vec_id tie-break) and emits its distance-at-selection — a 2-approx
    * of the optimal k-center radius.
    *
    * Determinism: distances are squared L2 over floor(x·2^20) integer
    * components — Δ ≤ 2^21 per dim, Δ² ≤ 2^42, ×64 dims ≤ 2^48: exact in
    * int64 on the Spark side and HUGEINT-safe in the oracle, so the
    * argmax and its tie-break are integer comparisons both engines
    * resolve identically (the same reason q54/q60 quantize before
    * comparing).
    *
    * Plan shape: the k−1 rounds each broadcast ONE center vector into a
    * per-row least(dmin, d²(p, c)) update — a codegen'd scan with no
    * shuffle — and take the global argmax via TakeOrdered(1)
    * (per-partition maxima, one row to the driver): O(k·n·d) total work,
    * k driver round-trips of one row each (the q130/q140 iterative-
    * fitter discipline), lineage bounded by a localCheckpoint per round.
    * The oracle unrolls the same k rounds as chained CTEs — greedy
    * selection is inherently sequential, so an unrolled plan IS the
    * algorithm, not a scale compromise. */
  def kcenterCoreset(spark: SparkSession, dir: String): DataFrame = {
    val k = 8
    val pts0 = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))")
        .as("q"))
    // the per-round distance is the engine's NATIVE l2sq_l expression
    // (codegen'd integer subtract-multiply-accumulate) — the composable
    // aggregate(zip_with(...)) fold is CodegenFallback and would evaluate
    // interpreted once per row per round, the fitter's hot loop
    graft.functions.GraftExtensions.registerL2Sq(spark)
    def d2(center: Seq[Long]) = {
      val c = center.mkString("array(", "L, ", "L)")
      expr(s"l2sq_l(q, $c)")
    }
    val seed = pts0.orderBy(col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("q")).head()
    var centers = Vector[(Long, Seq[Long], Option[Long])](
      (seed.getLong(0), seed.getSeq[Long](1), None))
    var cur = pts0.withColumn("dmin", lit(Long.MaxValue)).localCheckpoint(true)
    for (_ <- 2 to k) {
      cur = cur
        .withColumn("dmin", least(col("dmin"), d2(centers.last._2)))
        .localCheckpoint(true)
      val next = cur.orderBy(col("dmin").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("q"), col("dmin")).head()
      centers :+= ((next.getLong(0), next.getSeq[Long](1),
        Some(next.getLong(2))))
    }
    import spark.implicits._
    centers.zipWithIndex
      .map { case ((id, _, d), ix) => (ix + 1L, id, d) }
      .toDF("sel_order", "vec_id", "d2_sel")
  }

  private val kcenterCoresetSql = {
    def dist(p: String, c: String) =
      s"""CAST(list_sum(list_transform(range(1, len($p.q) + 1),
         |    i -> ($p.q[CAST(i AS INTEGER)] - $c.q[CAST(i AS INTEGER)])
         |         * ($p.q[CAST(i AS INTEGER)] - $c.q[CAST(i AS INTEGER)])))
         |  AS BIGINT)""".stripMargin
    val steps = (2 to 8).map { t =>
      val prevD = if (t == 2) "e1" else s"e${t - 1}"
      val distE = dist("d", s"c$t")
      s"""c$t AS (
         |  SELECT vec_id, q, dmin FROM $prevD ORDER BY dmin DESC, vec_id LIMIT 1),
         |e$t AS (
         |  SELECT d.vec_id, d.q,
         |    least(d.dmin, ${distE.replace("\n", "\n|    ")}) AS dmin
         |  FROM $prevD d, c$t)""".stripMargin
    }
    val d1 = dist("v", "c")
    val selects = (2 to 8).map(t =>
      s"UNION ALL SELECT CAST($t AS BIGINT), vec_id, dmin FROM c$t")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |c1 AS (SELECT vec_id, q FROM v ORDER BY vec_id LIMIT 1),
       |e1 AS (
       |  SELECT v.vec_id, v.q,
       |    ${d1.replace("\n", "\n|    ")} AS dmin
       |  FROM v, c1 c),
       |${steps.mkString(",\n")}
       |SELECT sel_order, vec_id, d2_sel FROM (
       |  SELECT CAST(1 AS BIGINT) AS sel_order, vec_id,
       |    CAST(NULL AS BIGINT) AS d2_sel FROM c1
       |  ${selects.mkString("\n|  ")}
       |) u""".stripMargin
  }

  // ---- q184: embedding standardization (z-score whitening apply) -----------

  /** The per-dimension variance in quantized space, as ONE shared
    * formula string (the q179/q118 discipline): exact integer moments →
    * a fixed chain of correctly-rounded double ops, identical in both
    * engines. */
  private val dimMeanExpr = "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
  private val dimVarExpr =
    """CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      | - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin

  /** q184: per-dimension z-score standardization of the embedding corpus
    * — the diagonal-whitening APPLY step that q179's moment matrix
    * feeds (recomputed here as a d-key aggregate so the query is
    * self-contained): z = (x − μ_d)/σ_d per component, the
    * preprocessing every distance-based downstream op (k-means, k-center,
    * IVF) wants when dimensions have unequal scales.
    *
    * Exactness: standardization is invariant under any common linear
    * scaling of x, so the WHOLE computation stays in floor(x·2^20)
    * integer space — means and variances from DECIMAL(38,0)/HUGEINT
    * integer sums (order-free), then one shared double-formula chain;
    * sqrt is IEEE-correctly-rounded in both engines. Degenerate
    * (zero-variance) dimensions are dropped by an exact guard.
    *
    * Plan shape: two corpus scans — one map-side-combined aggregate
    * into d keys, then the d-row moment table broadcast back onto a
    * scan-local transform (`PlanSpec` pins the broadcast); output is the
    * exploded (vec_id, dim, z) form the oracle can sort. */
  def embedStandardize(spark: SparkSession, dir: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val dims = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))")
        .as("q"))
      .select(col("vec_id"), posexplode(col("q")))
      .select(col("vec_id"), col("pos").cast("long").as("i"),
        col("col").as("v"))
    val mom = dims.groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast(d38)).as("sx"),
        sum((col("v").cast(d19) * col("v").cast(d19)).cast(d38)).as("sxx"))
      .select(col("i"), expr(dimMeanExpr).as("mean_q"),
        expr(dimVarExpr).as("var_q"))
      .where(col("var_q") > 0d)
    dims.join(broadcast(mom), Seq("i"))
      .select(col("vec_id"), col("i"),
        expr("(CAST(v AS DOUBLE) - mean_q) / sqrt(var_q)").as("z"))
  }

  private val embedStandardizeSql =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |d AS (
       |  SELECT vec_id, unnest(range(0, len(q))) AS i, unnest(q) AS v
       |  FROM v),
       |m AS (
       |  SELECT i, count(*) AS n, sum(v::HUGEINT) AS sx,
       |    sum(v::HUGEINT * v::HUGEINT) AS sxx
       |  FROM d GROUP BY i),
       |s AS (
       |  SELECT i, ${dimMeanExpr} AS mean_q,
       |    ${dimVarExpr.replace("\n", "\n|    ")} AS var_q
       |  FROM m)
       |SELECT d.vec_id, d.i, (CAST(v AS DOUBLE) - mean_q) / sqrt(var_q) AS z
       |FROM d JOIN s ON d.i = s.i
       |WHERE var_q > 0""".stripMargin

  // ---- q226: product-quantization ANN (PQ + ADC + re-rank) ----------------

  /** PQ geometry: 64 dims split into [[pqM]] contiguous subspaces of
    * [[pqSubDim]], [[pqK]] codewords per subspace → an 8-byte code per
    * vector (64 bytes of float32 → 8 bytes, the 32× compression that
    * makes billion-vector indexes RAM-resident). */
  val pqM = 8
  val pqSubDim = 8
  val pqK = 256

  /** ADC shortlist depth — deeper than [[rerankDepth]] because PQ's
    * 8-byte sketch is noisier per candidate than SQ8's 64-byte one; the
    * exact pass still touches only this many rows per query. Measured
    * with depth 100: rr_ok (≥ 2 of the exact top-3) and top1_found hold
    * at sf0.001/0.01/0.1; with depth 50 two sf0.1 queries dropped to 1
    * hit (2000 unclustered vectors, ~8 points per codeword — the
    * hardest regime), which is what set this depth. */
  val pqDepth = 100

  /** Unit-normalized vectors (cosine space: L2² on the sphere is
    * 2 − 2·cos, so PQ's L2 machinery ranks by cosine). Memoized +
    * checkpointed: codebook training, corpus encoding, and the query/
    * re-rank sides all read the same materialization. */
  private def pqNorm(spark: SparkSession, dir: String): DataFrame =
    Memo("pq_base", spark, dir) {
      vectors(spark, dir).where(col("nrm") > 0)
        .select(col("vec_id"),
          expr("transform(v, x -> x / nrm)").as("vn"))
        .localCheckpoint()
    }

  /** Exploded subvectors (vec_id, s, sub, ssq) — one row per subspace. */
  private def pqSubs(base: DataFrame): DataFrame =
    base.select(col("vec_id"), posexplode(
        expr(s"transform(sequence(1, $pqM), s -> slice(vn, (s-1)*$pqSubDim + 1, $pqSubDim))"))
        .as(Seq("s", "sub")))
      .withColumn("ssq", dot_d(col("sub"), col("sub")))

  /** Assign every subvector its nearest codeword (exact L2² argmin,
    * code-ascending tiebreak via the struct order). Shaped as a broadcast
    * JOIN against the codebook rows + a map-side-partial min over
    * (d2, code) structs: every distance stays inside whole-stage codegen
    * (the previous `array_min(transform(...))` over a 256-struct array
    * column evaluated INTERPRETED, allocating 256 structs per subvector —
    * the q226 bench tail's hot spot), and the partial aggregation ships
    * one row per (vec_id, s) regardless of k. */
  private def pqAssign(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), Seq("s"))
      .withColumn("d2",
        col("ssq") + col("cwsq") - lit(2.0) * dot_d(col("sub"), col("cw")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("code"))).as("a"),
        first(col("sub")).as("sub"), first(col("ssq")).as("ssq"))
      .select(col("vec_id"), col("s"), col("sub"), col("ssq"),
        col("a").getField("code").as("code"))

  /** The trained codebook (s, code, cw, cwsq): equal-count projection
    * init (per subspace, `ntile(k)` over the total (first-component,
    * vec_id) order — deterministic, no RNG, exactly balanced buckets;
    * replaced the r15 percentile-fence + interpreted-HOF bucketing,
    * which was the q226 bench tail's other hot spot) refined by ONE
    * exact-L2 Lloyd pass in the full subspace. Codeword coordinates are
    * DECIMAL-summed means (the q203 sufficient-statistics discipline) so
    * the codebook is bit-stable across partitionings — the property that
    * lets the recall gate hold a hard threshold. Memoized per (session,
    * sf). */
  private def pqCodebook(spark: SparkSession, dir: String): DataFrame =
    Memo("pq_codebook", spark, dir) {
      computePqCodebook(spark, dir).localCheckpoint()
    }

  private def computePqCodebook(spark: SparkSession, dir: String): DataFrame = {
    val subs = pqSubs(pqNorm(spark, dir))
    val wInit = Window.partitionBy(col("s"))
      .orderBy(col("sub").getItem(0).asc, col("vec_id").asc)
    val bucketed = subs.withColumn("code", ntile(pqK).over(wInit) - 1)
    // ONE codegen'd shuffle per means pass: each of the pqSubDim
    // coordinates is its own decimal-mean aggregate column (exact, any
    // arrival order), re-assembled into the codeword array — replaces
    // the posexplode + per-position groupBy + collect_list/array_sort
    // double shuffle
    def means(df: DataFrame): DataFrame = {
      val sums = (0 until pqSubDim).map(i =>
        (sum(col("sub").getItem(i).cast(DecimalType(30, 15))) /
          count(lit(1))).cast("double").as(s"__c$i"))
      df.groupBy(col("s"), col("code"))
        .agg(sums.head, sums.tail: _*)
        .withColumn("cw", array((0 until pqSubDim).map(i =>
          col(s"__c$i")): _*))
        .select(col("s"), col("code"), col("cw"))
        .withColumn("cwsq", dot_d(col("cw"), col("cw")))
    }
    val cw0 = means(bucketed) // used once: the Lloyd pass's broadcast
    means(pqAssign(subs, cw0))
  }

  /** q226: PRODUCT-QUANTIZATION ANN — the third leg of the ANN family
    * (IVF q62/q107 prunes WHERE to look, SQ8 q63 shrinks every
    * coordinate, PQ shrinks every VECTOR to [[pqM]] byte-sized codes and
    * scores candidates without touching float data at all). Jégou et
    * al.'s ADC: each query precomputes an m×k distance TABLE (exact L2²
    * from its subvectors to every codeword); a candidate's approximate
    * distance is the sum of m table lookups keyed by its stored codes —
    * here the lookup is an equi-join of the exploded code column against
    * the broadcast table and the sum is an 8-element sorted fold
    * (deterministic, no float-order drift). Top-[[pqDepth]] by ADC
    * distance, then the q63 exact re-rank over the shortlist.
    *
    * Gates (q63's SCALE-VALIDATED pattern): `rr_ok` pins ≥ 2 of the
    * exact top-3 found (measured 3/3 at sf0.001/0.01/0.1), `top1_found`
    * pins the true nearest neighbor inside the re-ranked top-3 (measured
    * present at every sf); `n_cand` is the shortlist size, derivable as
    * LEAST(depth, corpus−1) because the distance table covers every
    * code — a candidate can never drop out of ADC scoring. Re-measure
    * rule: a new sf runs q226 once before trusting the gate; the fix for
    * a miss is raising [[pqDepth]], never loosening the gate.
    *
    * At 100 TB: the codebook is m·k rows (broadcast); encoding is one
    * corpus scan; the steady-state index is m codes/vector — the ONLY
    * per-vector data the ADC scan reads (32× less bandwidth than the
    * float scan, the reason PQ wins at billion scale); the ADC join
    * shuffles nothing (broadcast table + map-side partial sum), and the
    * exact pass touches [[pqDepth]] rows per query. Codebook
    * training reads the corpus twice (percentile init + one Lloyd pass);
    * production trains on a sample, identical plumbing. */
  def pqAnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.registerDotD(spark)
    val base = pqNorm(spark, dir) // memoized + checkpointed
    val cb = pqCodebook(spark, dir) // m·k rows, memoized + checkpointed
    val codes = pqAssign(pqSubs(base), cb)
      .select(col("vec_id"), col("s"), col("code"))
    val qsubs = pqSubs(base.where(col("vec_id") < 5))
      .select(col("vec_id").as("query_id"), col("s"), col("sub"), col("ssq"))
    // the ADC distance table: |queries|·m·k rows, broadcast
    val dt = qsubs.join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        (col("ssq") + col("cwsq") - lit(2.0) * dot_d(col("sub"), col("cw")))
          .as("dpart"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("ad2").asc, col("vec_id").asc)
    // checkpointed: BOTH consumers below (exact re-rank, n_cand) broadcast
    // this |queries|·pqDepth-row list — without it each broadcast re-runs
    // the whole ADC join+window subtree
    val shortlist = codes.join(broadcast(dt), Seq("s", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(collect_list(struct(col("s"), col("dpart"))).as("parts"))
      // sorted fold: bit-identical sum whatever order partials arrive in
      .withColumn("ad2", expr(
        "aggregate(transform(array_sort(parts), p -> p.dpart), 0.0D, (a, b) -> a + b)"))
      .withColumn("crn", row_number().over(wA))
      .where(col("crn") <= pqDepth)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .localCheckpoint()
    val qv = base.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("vn").as("qvn"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    // shortlist is |queries|·pqDepth rows — ALWAYS the broadcast side;
    // the corpus-scale float table must not move for the exact pass
    val rr3 = base.withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot_d(col("qvn"), col("vn")).as("cos"))
      .withColumn("rn", row_number().over(wE))
      .where(col("rn") <= 3)
    val exact = knnBrute(spark, dir).where(col("rn") <= 3)
      .select(col("query_id"), col("neighbor_id"),
        (col("rn") === 1).as("is_top1"))
    val nCand = shortlist.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_cand"))
    exact.join(broadcast(rr3.select(col("query_id"), col("neighbor_id"),
        lit(1).as("hit"))), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("hit")).as("rr_hits"),
        max(when(col("is_top1"), col("hit"))).as("top1_hit"))
      .join(broadcast(nCand), Seq("query_id"))
      .select(col("query_id"), col("n_cand"),
        (col("rr_hits") >= 2).as("rr_ok"),
        col("top1_hit").isNotNull.as("top1_found"))
  }

  private val pqAnnSql =
    s"""WITH n AS (SELECT count(*) AS cnt FROM embeddings)
       |SELECT vec_id AS query_id,
       |  CAST(LEAST($pqDepth, cnt - 1) AS BIGINT) AS n_cand,
       |  TRUE AS rr_ok, TRUE AS top1_found
       |FROM embeddings, n WHERE vec_id < 5""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q226_pq_ann", pqAnn, Some(pqAnnSql)),
    QueryDef("q184_embed_standardize", embedStandardize,
      Some(embedStandardizeSql)),
    QueryDef("q179_embed_moments", embedMoments, Some(embedMomentsSql)),
    QueryDef("q181_kcenter_coreset", kcenterCoreset, Some(kcenterCoresetSql)),
    QueryDef("q175_hard_negatives", hardNegatives, Some(hardNegativesSql)),
    QueryDef("q169_ann_store_commit", annStoreCommit,
      Some(annStoreCommitSql)),
    QueryDef("q168_stream_ann_ingest", streamAnnIngest,
      Some(streamAnnIngestSql)),
    QueryDef("q143_rrf_fusion", rrfFusion, Some(rrfFusionSql)),
    QueryDef("q65_kmeans", kmeansFit, Some(kmeansFitSql)),
    QueryDef("q203_kmeans_commit", kmeansCommit, Some(kmeansCommitSql)),
    QueryDef("q206_ann_store_audit", annStoreAudit, Some(annStoreAuditSql)),
    QueryDef("q209_retrieval_mrr", retrievalMrr, Some(retrievalMrrSql)),
    QueryDef("q161_semantic_dedup", semanticDedup, Some(semanticDedupSql)),
    QueryDef("q60_knn_brute", knnBrute, Some(knnBruteSql)),
    QueryDef("q61_neardup_lsh", nearDupLsh, Some(nearDupLshSql)),
    QueryDef("q61b_lsh_recall", lshRecall, Some(lshRecallSql)),
    QueryDef("q62_knn_ivf", knnIvf, Some(knnIvfSql)),
    QueryDef("q107_ivf_multiprobe", knnIvfMultiprobe,
      Some(knnIvfMultiprobeSql)),
    QueryDef("q63_ann_rerank", knnRerank, Some(knnRerankSql)),
    QueryDef("q64_ann_recall", annRecall, Some(annRecallSql)),
    QueryDef("q54_dedup_cosine", dedupCosine, Some(dedupCosineSql)))
}
