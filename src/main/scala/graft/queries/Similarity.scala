package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.dot_d
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *  - LSH-bucketed: 8-bit sign-signature buckets prune the pair space from
  *    O(n²) to bucket-local pairs — the scale path for all-pairs similarity
  *    (here: embedding-cosine near-dup candidates above a threshold).
  */
object Similarity {

  /** vec_id, v (double[]), nrm for every embedding row. */
  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(dot_d(col("v"), col("v"))))

  private val vectorsSql =
    """SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
      |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)""".stripMargin

  /** Exact cosine top-10 for query vectors (vec_id < 5). */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
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

  /** Sign-signature expression over the first 8 components. */
  private def sig(spark: SparkSession, dir: String): DataFrame = {
    val bits = (0 until 8)
      .map(j => when(expr(s"v[$j]") >= 0, 1L << j).otherwise(0L))
      .reduce(_ + _)
    vectors(spark, dir).withColumn("sig", bits)
  }

  private val sigSql = {
    val bits = (0 until 8)
      .map(j => s"CASE WHEN v[${j + 1}] >= 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"SELECT *, $bits AS sig FROM ($vectorsSql) t"
  }

  /** LSH-bucketed near-dup pairs: candidates share an 8-bit sign bucket,
    * then exact cosine >= 0.15 within the bucket. */
  def nearDupLsh(spark: SparkSession, dir: String): DataFrame = {
    val s = sig(spark, dir)
    s.as("a")
      .join(s.as("b"),
        col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
        (dot_d(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= 0.15)
  }

  private val nearDupLshSql =
    s"""WITH s AS ($sigSql)
       |SELECT a.vec_id AS d1, b.vec_id AS d2,
       |  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
       |FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
       |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.15""".stripMargin

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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q60_knn_brute", knnBrute, Some(knnBruteSql)),
    QueryDef("q61_neardup_lsh", nearDupLsh, Some(nearDupLshSql)),
    QueryDef("q62_knn_ivf", knnIvf, Some(knnIvfSql)),
    QueryDef("q54_dedup_cosine", dedupCosine, Some(dedupCosineSql)))
}
