package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse-table materialization shared by every query that
  * demonstrates the persisted-index shape (q29, q115, q116, q117, q120):
  * pay the distribution once at write time, consume it shuffle-free after. */
private[graft] object Warehouse {

  /** Idempotent table reset: a fresh session's catalog doesn't know tables
    * left in the warehouse dir by a previous JVM, and
    * `saveAsTable(overwrite)` then fails with LOCATION_ALREADY_EXISTS —
    * drop both the catalog entry and the location. */
  def resetTable(spark: SparkSession, t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + t)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Write `df` as a bucketed+sorted warehouse table and read it back.
    * The input is hash-distributed by the bucket keys into `nBuckets`
    * partitions before the write (guide §6, Iceberg's hash
    * write-distribution): each task then owns exactly one bucket, so the
    * table lands as ONE file per bucket written in parallel — instead of
    * every input task writing a file per bucket (tasks×buckets small
    * files at scale; a single serial writer task on a 1-partition local
    * input, 0.9 s measured on q29). HashPartitioning and the bucket spec
    * share Murmur3-pmod, so the alignment is exact. */
  def materializeBucketed(spark: SparkSession, df: DataFrame,
      table: String, nBuckets: Int, keys: Seq[String]): DataFrame = {
    resetTable(spark, table)
    df.repartition(nBuckets, keys.map(df.col): _*)
      .write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
    spark.table(table)
  }

  /** VACUUM for the committed-store families (q120/q169/q192/q200/q203):
    * each commit writes a NEW `<prefix>_gen<N>` table and leaves its
    * predecessors on disk forever — this is the retention half of the
    * maintenance pair (q215 compaction being the other). Drops every
    * generation but the newest `keep`, catalog entry and files both, and
    * returns the dropped table names (oldest first).
    *
    * Reader safety: consumers of a store family always open the MAXIMUM
    * generation (the commit contract — each cycle's probes read the
    * newest store), so no NEW reader can open an expired generation; the
    * live generations' files are never touched, so every in-flight
    * reader of a retained generation is unaffected. An in-flight reader
    * of an EXPIRED generation races with the delete — that is what the
    * retention window is for: run with `keep` ≥ (1 + the number of
    * generations any reader can lag behind), exactly the argument
    * log-structured table formats make for their VACUUM horizon. */
  def vacuumGenerations(spark: SparkSession, prefix: String,
      keep: Int): Seq[String] = {
    require(keep >= 1, s"vacuumGenerations($prefix): keep must be >= 1")
    val genRe = (java.util.regex.Pattern.quote(prefix) + "_gen(\\d+)").r
    val gens = spark.catalog.listTables().collect().map(_.name)
      .collect { case n @ genRe(i) => (i.toInt, n) }
      .sortBy(_._1).map(_._2).toSeq
    val expired = gens.dropRight(keep)
    expired.foreach(resetTable(spark, _))
    expired
  }
}
