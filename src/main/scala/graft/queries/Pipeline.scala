package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship end-to-end LLM training-data pipeline as ONE dataflow:
  *
  *   quality gate -> language gate -> exact dedup -> near-dup clustering
  *   -> representative selection -> corpus stats
  *
  * Every stage is a previously-verified operator (q71, q70, q50, q55)
  * composed into a single DAG — Catalyst sees the whole pipeline, so the
  * gates fuse into the scan projection and each dedup stage only processes
  * the previous stage's survivors (the clustering branch scans `documents`
  * separately — its input is the full corpus by construction). At 100 TB
  * this is
  * the shape that matters: one pass over the corpus, a hash-key shuffle
  * per dedup stage, and the iterative clustering bounded by LSH bucket
  * sizes. The oracle recomputes the identical pipeline in DuckDB CTEs
  * (including the connected components, as a recursive CTE).
  */
object Pipeline {

  def run(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")

    // Stage 1+2: quality + language gates (q71/q70 semantics).
    val scored = docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text")))
      .withColumn("en_ratio",
        expr("size(filter(w, x -> x IN ('the','a','of','and','to','is','in','it')))")
          .cast("double") / size(col("w")))
      .where(col("n_tokens").between(20, 200) && col("alpha_ratio") >= 0.7 &&
        col("en_ratio") >= 0.04)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_tokens"))

    // Stage 3: exact dedup — keep the smallest doc_id per md5 fingerprint.
    val exactReps = scored
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exactKept = scored.join(exactReps, "doc_id")

    // Stage 4: near-dup clustering (q55 components over the MinHash
    // candidate graph); docs outside any cluster are their own component.
    val comp = Dedup.dupClusters(spark, dir)
    val withComp = exactKept.join(comp, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))

    // Stage 5: representative per component = smallest surviving doc_id.
    val reps = withComp.groupBy(col("component"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val finalDocs = withComp.join(reps, "doc_id")

    // Stage 6: corpus stats for the kept set.
    finalDocs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  private val sql =
    """WITH RECURSIVE scored AS (
      |  SELECT doc_id, lang, source, text,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |  WHERE CAST(len(string_split(text, ' ')) AS BIGINT) BETWEEN 20 AND 200
      |    AND CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
      |      / length(text) >= 0.7
      |    AND CAST(len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the','a','of','and','to','is','in','it'))) AS DOUBLE)
      |      / len(string_split(text, ' ')) >= 0.04),
      |exact_reps AS (
      |  SELECT min(doc_id) AS doc_id
      |  FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM scored) t
      |  GROUP BY fp),
      |exact_kept AS (
      |  SELECT s.* FROM scored s JOIN exact_reps r ON s.doc_id = r.doc_id),
      |cand AS (%MINHASH%),
      |edges AS (
      |  SELECT d1 AS a, d2 AS b FROM cand
      |  UNION SELECT d2 AS a, d1 AS b FROM cand),
      |reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS component
      |  FROM reach GROUP BY a),
      |with_comp AS (
      |  SELECT k.*, coalesce(c.component, k.doc_id) AS component
      |  FROM exact_kept k LEFT JOIN comp c ON k.doc_id = c.doc_id),
      |reps AS (
      |  SELECT min(doc_id) AS doc_id FROM with_comp GROUP BY component)
      |SELECT w.lang, w.source, count(*) AS n_docs,
      |  CAST(sum(w.n_tokens) AS BIGINT) AS total_tokens
      |FROM with_comp w JOIN reps r ON w.doc_id = r.doc_id
      |GROUP BY w.lang, w.source""".stripMargin
      .replace("%MINHASH%", Dedup.minhashOracleSql)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q99_pipeline", run, Some(sql)))
}
