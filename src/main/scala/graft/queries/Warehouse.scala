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

  /** Write `df` as a bucketed+sorted warehouse table and read it back. */
  def materializeBucketed(spark: SparkSession, df: DataFrame,
      table: String, nBuckets: Int, keys: Seq[String]): DataFrame = {
    resetTable(spark, table)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
    spark.table(table)
  }
}
