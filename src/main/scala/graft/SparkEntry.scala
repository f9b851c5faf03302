package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CatalogQueries, Dedup, Extensions, Graph, Joins, Lakehouse, Layout, Parity, Pipeline, Quality, Relational, Scalars, Similarity, SqlDml, SqlFront, Temporal, TextAnalysis, TimeSeries, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator's named query + DuckDB oracle from the
  * per-area registries in `graft.queries`.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    Parity.defs ++
      Relational.defs ++
      Joins.defs ++
      Windows.defs ++
      Scalars.defs ++
      Dedup.defs ++
      Similarity.defs ++
      TextAnalysis.defs ++
      TimeSeries.defs ++
      Temporal.defs ++
      Pipeline.defs ++
      Layout.defs ++
      Graph.defs ++
      SqlFront.defs ++
      Quality.defs ++
      Extensions.defs ++
      Lakehouse.defs ++
      SqlDml.defs ++
      CatalogQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end LLM data pipeline (quality/lang gates -> exact dedup ->
    * near-dup clustering -> representatives -> corpus stats, q99). */
  def entry(spark: SparkSession): DataFrame = {
    // The driver owns this session (no graft builder ran), so apply the
    // required session conf here — the one harness-boundary exception to
    // "set it at session construction".
    Tables.sessionConf.foreach { case (k, v) => spark.conf.set(k, v) }
    Pipeline.run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
