package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Aggregators, MRJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity workloads: the two example jobs the reference ships
  * (WordCount `wordcount-src/WordCount.java:13-35`, WordLength
  * `wordlength-src/WordLength.java:13-40`), each in two forms —
  * idiomatic DataFrame (codegen'd explode/groupBy, the form Bench exercises
  * at scale) and through the `MRJob` facade (the reference's programming
  * model). Tokenization is a literal single-space split so DuckDB's
  * `string_split` is an exact oracle.
  */
object Parity {

  private def words(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")

  private val wordsSql =
    "SELECT unnest(string_split(text, ' ')) AS word FROM documents"

  def wordcount(spark: SparkSession, dir: String): DataFrame =
    words(spark, dir).groupBy("word").agg(count(lit(1)).as("cnt"))

  def wordlength(spark: SparkSession, dir: String): DataFrame =
    words(spark, dir)
      .groupBy(length(col("word")).cast("long").as("len"))
      .agg(count(lit(1)).as("cnt"))

  def mrWordcount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables(spark, dir, "documents").select($"text").as[String]
    MRJob(lines)
      .mapToPairs(l => l.split(" ", -1).iterator.filter(_.nonEmpty).map(_ -> 1L))
      .reduceByKey(_ + _)
      .toDF("word", "cnt")
  }

  def mrWordlength(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables(spark, dir, "documents").select($"text").as[String]
    MRJob(lines)
      .mapToPairs(l =>
        l.split(" ", -1).iterator.filter(_.nonEmpty).map(w => (w.length.toLong, 1L)))
      .reduceByKey(_ + _)
      .toDF("len", "cnt")
  }

  /** The reference's `Text.add` concat-merge (`Text.java:29-32`), in the
    * deterministic sorted form (SURVEY.md §7.5). */
  def mrConcat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nation = Tables(spark, dir, "nation")
      .select($"n_regionkey", $"n_name").as[(Int, String)]
    MRJob(nation)
      .mapToPairs(Iterator.single(_))
      .reduceGroupsSorted((_, vs: Seq[String]) => vs.mkString(","))
      .toDF("key", "names")
  }

  /** The same concat monoid as a first-class `Aggregator` (partial+final,
    * usable in any groupBy.agg) — customer names per nation. */
  def concatAggregator(spark: SparkSession, dir: String): DataFrame = {
    val sortedConcat = udaf(Aggregators.SortedConcat)
    Tables(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("key"))
      .agg(sortedConcat(col("c_name")).as("names"))
  }

  /** q123: the `graft-chunks` DSV2 connector inside the ORACLE gate (it
    * was previously spec-tested only). The documents table is staged as
    * ONE text file in doc_id order, re-read through the connector with an
    * awkward chunk size (37 — exercises the uneven tail chunk), and
    * aggregated per chunk: line count plus an md5-derived line-hash sum.
    * The oracle never sees the connector — it derives each line's chunk id
    * ARITHMETICALLY ((row_number − 1) / 37 over the same order) and
    * recomputes the same aggregates, so the distributed layout job, the
    * global id assignment, the byte-offset seeks, and the reader all have
    * to be bit-right for the hash to match. The single-file staging is
    * gate harness, not the operator (the connector plans one partition
    * per chunk regardless of file count). */
  def chunkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_chunk_gate")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val txtDir = s"$out/txt"
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(1).sortWithinPartitions("doc_id")
      .select(col("text"))
      .write.mode("overwrite").text(txtDir)
    spark.read.format("graft-chunks")
      .option("recordsPerChunk", 37).load(txtDir)
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(conv(substring(md5(col("value")), 1, 15), 16, 10).cast("long")
          % 2147483647L).as("h_sum"))
  }

  /** q158: the reference's COMPLETE job lifecycle through both custom
    * connectors — reducer output becomes the next job's chunked input
    * (MapReduce chaining: ReduceRunner's per-reducer TSV part files are
    * exactly what a follow-up job's master re-splits,
    * framework-src/ReduceRunner.java:154-172 →
    * framework-src/MasterNode.java:89-126). An aggregate is written
    * through the `graft-tsv` DSV2 BatchWrite (per-attempt temp files,
    * atomic commit renames), read back through the `graft-chunks` DSV2
    * source (global chunk ids over the part files), parsed, and
    * re-aggregated — the oracle computes the aggregate directly, so any
    * loss, duplication, or corruption across the write/read boundary
    * (a broken commit protocol, a leftover temp file, a mis-split
    * chunk) breaks the hash. */
  def sinkChainRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_tsv_gate")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val tsvDir = s"$out/wc"
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("string").as("n"))
      .select(col("o_orderpriority"), col("n"))
      .write.format("graft-tsv").mode("overwrite").save(tsvDir)
    spark.read.format("graft-chunks")
      .option("recordsPerChunk", 2).load(tsvDir)
      .select(split(col("value"), "\t").as("kv"))
      .select(col("kv").getItem(0).as("o_orderpriority"),
        col("kv").getItem(1).cast("long").as("n"))
  }

  private val sinkChainRoundtripSql =
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** q217: the STREAMING leg of the sink contract — a bounded stream
    * committed through `graft-tsv`'s `StreamingWrite`, one EPOCH per
    * micro-batch (the input is staged as four parquet files and drained
    * with `maxFilesPerTrigger=1`, so four separate epoch commits append
    * into one directory, each riding the atomic manifest+epoch-ledger
    * rename). The committed directory is then read back through
    * `graft-chunks` and aggregated; the oracle is q158's batch aggregate
    * over `orders` — a lost epoch, a double-committed epoch (re-delivery
    * must be a no-op), or a mis-carried manifest breaks the hash.
    * Crash-mid-epoch recovery is unit-pinned in `TsvSinkUnitSpec`. */
  def sinkStreamRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val out = java.nio.file.Files.createTempDirectory("graft_tsv_stream")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val inDir = s"$out/in"; val tsvDir = s"$out/sink"; val ck = s"$out/ck"
    Tables(spark, dir, "orders")
      .select(col("o_orderpriority"))
      .repartition(4) // four files -> four micro-batches -> four epochs
      .write.parquet(inDir)
    val q = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .writeStream
      .format("graft-tsv")
      .option("path", tsvDir)
      .option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.format("graft-chunks")
      .option("recordsPerChunk", 1000).load(tsvDir)
      .groupBy(col("value").as("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
  }

  private val chunkRoundtripSql =
    """WITH lines AS (
      |  SELECT text,
      |    (row_number() OVER (ORDER BY doc_id) - 1) // 37 AS chunk_id
      |  FROM documents)
      |SELECT CAST(chunk_id AS INT) AS chunk_id, count(*) AS n_lines,
      |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 2147483647)
      |    AS BIGINT) AS h_sum
      |FROM lines GROUP BY 1""".stripMargin

  /** q124: the connector's GLOBAL chunk-id assignment across MULTIPLE
    * files — the reference's `MasterNode.assignChunkID` counter — inside
    * the oracle gate. One text file per language (name order = lang
    * order), chunk-read as one directory; the oracle computes each file's
    * consumed-id count arithmetically (`c/37 + 1`: ceil for a partial
    * tail OR the even-division empty chunk — the reference numbers one
    * extra either way) and prefix-sums it in name order to reproduce the
    * ids without ever seeing the connector. */
  /** One text file per language under `<tmp>/txt`, named `<idx>_<lang>`
    * with a zero-padded index so file-NAME order always equals the langs'
    * SORT order (a bare `$lang.txt` diverges when one lang is a prefix of
    * another — "en" sorts before "en-GB" but "en-GB.txt" < "en.txt").
    * Returns (txt dir, sorted langs). The label set is bounded (a handful
    * of languages) — harness staging, not a data-plane collect. */
  /** Stages per-lang text files for the chunk-connector entries. `stage`
    * lands a GROUP of langs in ONE Spark job — a partitioned text write,
    * hash-distributed by lang so each `lang=` directory gets exactly one
    * part file, rows doc_id-ordered within it (byte-identical to the old
    * one-job-per-lang staging, which paid a full scan + write per lang:
    * guide §1.2, remove repeated passes first). */
  private def langStager(spark: SparkSession, dir: String, tmpPrefix: String)
      : (java.nio.file.Path, Array[String], Seq[(String, Int)] => Unit) = {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory(tmpPrefix)
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val txt = Files.createDirectories(out.resolve("txt"))
    val docs = Tables(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), col("text"))
    val langs = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).sorted
    val stage = (ls: Seq[(String, Int)]) => {
      val stageDir = s"$out/stage_${ls.head._2}"
      docs.where(col("lang").isin(ls.map(_._1): _*))
        .repartition(col("lang")).sortWithinPartitions("lang", "doc_id")
        .select(col("text"), col("lang"))
        .write.mode("overwrite").partitionBy("lang").text(stageDir)
      for ((l, idx) <- ls) {
        val part = {
          val listing = Files.list(Paths.get(s"$stageDir/lang=$l"))
          try listing.filter(p => p.getFileName.toString.startsWith("part-"))
            .findFirst().get()
          finally listing.close()
        }
        Files.move(part, txt.resolve(f"$idx%03d_$l.txt"))
      }
      ()
    }
    (txt, langs, stage)
  }

  def chunkMultifile(spark: SparkSession, dir: String): DataFrame = {
    val (txt, langs, stage) = langStager(spark, dir, "graft_chunk_multi")
    stage(langs.zipWithIndex.toSeq)
    spark.read.format("graft-chunks")
      .option("recordsPerChunk", 37).load(txt.toString)
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(conv(substring(md5(col("value")), 1, 15), 16, 10).cast("long")
          % 2147483647L).as("h_sum"))
  }

  private val chunkMultifileSql =
    """WITH counts AS (
      |  SELECT lang, count(*) AS c FROM documents GROUP BY lang),
      |offs AS (
      |  SELECT lang, CAST(coalesce(sum(c // 37 + 1) OVER (
      |    ORDER BY lang ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    0) AS BIGINT) AS off
      |  FROM counts),
      |lines AS (
      |  SELECT lang, text,
      |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rn
      |  FROM documents)
      |SELECT CAST(o.off + l.rn // 37 AS INT) AS chunk_id,
      |  count(*) AS n_lines,
      |  CAST(sum(('0x' || substr(md5(l.text), 1, 15))::BIGINT % 2147483647)
      |    AS BIGINT) AS h_sum
      |FROM lines l JOIN offs o ON l.lang = o.lang GROUP BY 1""".stripMargin

  /** q131: the chunk store consumed INCREMENTALLY through the connector's
    * micro-batch stream — half the files staged before the stream starts,
    * half arriving mid-run — with the SAME arithmetic oracle as q124: after
    * full consumption the complete-mode aggregate must equal the batch
    * read, proving the offset (the global chunk-id counter) hands every
    * chunk to exactly one batch, ids continuing across arrivals. */
  def chunkStreamIngest(spark: SparkSession, dir: String): DataFrame = {
    val (txt, langs, stage) = langStager(spark, dir, "graft_chunk_stream")
    val half = langs.length / 2
    stage(langs.zipWithIndex.take(half).toSeq)
    spark.catalog.dropTempView("q131_sink")
    val q = spark.readStream.format("graft-chunks")
      .option("recordsPerChunk", 37).load(txt.toString)
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(conv(substring(md5(col("value")), 1, 15), 16, 10).cast("long")
          % 2147483647L).as("h_sum"))
      .writeStream.format("memory").queryName("q131_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stage(langs.zipWithIndex.drop(half).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    spark.table("q131_sink")
  }

  private val wcOracle =
    s"SELECT word, count(*) AS cnt FROM ($wordsSql) t WHERE word <> '' GROUP BY word"
  private val wlOracle =
    s"SELECT length(word) AS len, count(*) AS cnt FROM ($wordsSql) t WHERE word <> '' GROUP BY 1"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_wordcount", wordcount, Some(wcOracle)),
    QueryDef("q02_wordlength", wordlength, Some(wlOracle)),
    QueryDef("q03_mr_wordcount", mrWordcount, Some(wcOracle)),
    QueryDef("q04_mr_wordlength", mrWordlength, Some(wlOracle)),
    QueryDef("q05_mr_concat", mrConcat, Some(
      "SELECT n_regionkey AS key, string_agg(n_name, ',' ORDER BY n_name) AS names " +
        "FROM nation GROUP BY n_regionkey")),
    QueryDef("q06_concat_agg", concatAggregator, Some(
      "SELECT c_nationkey AS key, string_agg(c_name, ',' ORDER BY c_name) AS names " +
        "FROM customer GROUP BY c_nationkey")),
    QueryDef("q123_chunk_roundtrip", chunkRoundtrip, Some(chunkRoundtripSql)),
    QueryDef("q124_chunk_multifile", chunkMultifile, Some(chunkMultifileSql)),
    QueryDef("q131_chunk_stream", chunkStreamIngest, Some(chunkMultifileSql)),
    QueryDef("q158_sink_chain", sinkChainRoundtrip,
      Some(sinkChainRoundtripSql)),
    QueryDef("q217_sink_stream", sinkStreamRoundtrip,
      Some(sinkChainRoundtripSql)))
}
