package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the round-16 claim "a MoR read ≈ a clean columnar read":
  * stages lineitem as a snapshot table, times the same aggregate scan
  * (a) clean at v1, (b) after a scattered MoR DELETE tombstoned ~1% of
  * rows (delete vectors applied INSIDE the vectorized reader via the
  * selection wrapper). Prints min-of-3 per mode. Usage:
  * `runMain graft.tools.MorScanProbe [sfDir]`. */
object MorScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.forMaster(SparkSession.builder(), "local[32]")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.SnapshotStore
    val out = java.nio.file.Files.createTempDirectory("mor_scan_probe")
    graft.streaming.EventStreams.deleteTreeOnExit(out)
    val root = s"$out/t"
    val base = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .repartitionByRange(8, col("l_orderkey"))
    SnapshotStore.commit(spark, root,
      SnapshotStore.writeData(spark, root, base, "base"), 0)
    graft.catalog.GraftCatalog.register(spark, "mor_probe", root)
    def timeScan(label: String): Double = {
      def once(): Double = {
        val s = System.nanoTime
        spark.sql(
          """SELECT l_returnflag, count(*), sum(l_quantity),
            |  sum(l_extendedprice) FROM graft.mor_probe
            |GROUP BY 1""".stripMargin).collect()
        (System.nanoTime - s) / 1e9
      }
      val t = (1 to 3).map(_ => once()).min
      println(f"MORPROBE $label%-18s ${t}%6.3f s")
      t
    }
    val nRows = spark.table("graft.mor_probe").count()
    val clean = timeScan("clean_columnar")
    SnapshotStore.setWriteMode(spark, root, "mor")
    // scattered tombstones: ~1% of rows across every file
    spark.sql("DELETE FROM graft.mor_probe WHERE l_orderkey % 97 = 0")
    val nDel = nRows - spark.table("graft.mor_probe").count()
    val vectored = timeScan("mor_vectored")
    println(f"MORPROBE rows=$nRows deleted=$nDel ratio=${vectored / clean}%.2f")
    spark.stop()
  }
}
