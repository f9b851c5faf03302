package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** SCALE probe for the compressed delete-vector payload (SCALE.md's
  * bytes-on-wire decade row): build a snapshot store from `<sfDir>`'s
  * orders, flip it to merge-on-read, run a 10%-of-keyspace catalog
  * DELETE (the clustered-delete shape row-level retention produces), and
  * print tombstone count, total dv bytes on disk, and bytes/tombstone —
  * against the legacy format's flat 8 B/position (plus parquet row
  * overhead).
  *
  *   runMain graft.tools.DvBytesProbe <sfDir>
  */
object DvBytesProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = SparkSession.builder()
      .master(graft.Sessions.master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (root, mx) = graft.queries.Lakehouse.initStore(spark, sfDir)
    graft.catalog.GraftCatalog.register(spark, "dv_probe", root)
    spark.sql("CALL graft.set_write_mode('dv_probe', 'mor')")
    val lo = mx / 10; val hi = lo + mx / 10
    val before = spark.table("graft.dv_probe").count()
    spark.sql(
      s"DELETE FROM graft.dv_probe WHERE o_orderkey BETWEEN $lo AND $hi")
    val after = spark.table("graft.dv_probe").count()
    val tombstones = before - after
    val conf = spark.sparkContext.hadoopConfiguration
    val dvBytes = graft.sources.SnapshotStore.deleteVectors(spark, root)
      .map { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
    // MoR correctness cross-check rides along: the live count must match
    // a COW-model recount
    val expect = graft.Tables(spark, sfDir, "orders")
      .where(!col("o_orderkey").between(lo, hi)).count()
    println(f"[dvprobe] rows=$before tombstones=$tombstones " +
      f"dv_bytes=$dvBytes bytes_per_tombstone=${
        dvBytes.toDouble / tombstones}%.3f legacy_floor=8.0 " +
      f"live_ok=${after == expect}")
    spark.stop()
  }
}
