package graft.tools

import graft.sources.SnapshotStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the DRIVER-HEAP footprint of merge-on-read metadata as
  * tombstones grow a decade (SCALE.md's r14 row — the r13 `weak` was
  * exactly this: `SnapshotTable.tombstones` collected every (file, pos)
  * pair to the driver, heap ∝ tombstones):
  *
  *   runMain graft.tools.DvHeapProbe <sfDir>
  *
  * Builds a 16-file orders snapshot, tombstones ~1% then ~10% of rows
  * merge-on-read, loads the catalog table, and reports what the driver
  * now retains ([[graft.catalog.SnapshotTable.dvPointers]]): pointer
  * ENTRIES (file → covering dv files), which are FILE-count scale, vs
  * the tombstone count, which grows 10× — alongside a read through the
  * executor-side vector path to show the applied row count stays exact.
  */
object DvHeapProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-dv-heap-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.sessionConf.head._1,
        graft.Tables.sessionConf.head._2)
      .getOrCreate()
    try {
      val orders = graft.Tables(spark, dir, "orders")
      val total = orders.count()
      for (mod <- Seq(100L, 10L)) {
        val out = java.nio.file.Files.createTempDirectory("dvheap")
        val root = s"$out/t"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
        SnapshotStore.commit(spark, root, SnapshotStore.writeData(spark,
          root, orders.repartitionByRange(16, col("o_orderkey")), "base"), 0)
        val dv = SnapshotStore.writeData(spark, root,
          SnapshotStore.tombstonesWhere(spark, root,
            col("o_orderkey") % mod === 0L).repartition(4), "dv")
        SnapshotStore.commit(spark, root,
          SnapshotStore.files(spark, root) ++ dv.map(SnapshotStore.dvLine), 1)
        val nTomb = spark.read.parquet(
          SnapshotStore.deleteVectors(spark, root): _*).count()
        graft.catalog.GraftCatalog.register(spark, "dv_probe", root)
        val t = new graft.catalog.SnapshotTable(spark, "graft.dv_probe",
          root, 2)
        val pointerEntries = t.dvPointers.map(_._2.size).sum
        val live = spark.table("graft.dv_probe").count()
        println(s"[dvheap] frac=1/$mod rows=$total tombstones=$nTomb " +
          s"live=$live pointerFiles=${t.dvPointers.size} " +
          s"pointerEntries=$pointerEntries")
        require(live == total - nTomb, "executor-side vectors lost rows")
      }
    } finally spark.stop()
  }
}
