package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure VERSION-COUNT scaling of the snapshot-native mutation path
  * (SCALE.md's per-version cost model for the q290/q301/q308 family):
  *
  *   runMain graft.tools.VersionScale <sfDir> <nBatches> [nFiles]
  *
  * Builds a versioned store (orders clustered `nFiles` ways), then applies
  * `nBatches` copy-on-write UPDATE batches through
  * `Lakehouse.mutateSnapshot` — batch b bumps the prices of one key
  * VIGESIMILE (rotating `(b % 20)`-th twentieth of the key domain), so
  * every batch touches a fixed-size slice localized to 1-2 files by the
  * clustering. Prints ONE JSON line with per-version wall times.
  *
  * The claim under test (the scaladocs' O(delta) argument): per-version
  * cost ∝ changed slice + one manifest rename — INDEPENDENT of both the
  * version count (manifests accumulate but only the max is resolved; the
  * file list stays ~|files| lines) and the table size (unchanged files
  * are never opened). Stable per-version times across b=1..N at two sfs
  * are the evidence; a drift upward with b would expose an O(versions)
  * accumulation, a 10× jump across sfs an O(table) rewrite.
  */
object VersionScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: VersionScale <sfDir> <nBatches> [nFiles]")
    val sfDir = args(0)
    val n = args(1).toInt
    val nFiles = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder()
      .master(graft.Sessions.master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.SnapshotStore

    val out = java.nio.file.Files.createTempDirectory("graft_vscale")
    val root = s"$out/table"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val base = graft.Tables(spark, sfDir, "orders")
      .repartitionByRange(nFiles, col("o_orderkey"))
    SnapshotStore.commit(spark, root,
      SnapshotStore.writeData(spark, root, base, "base"), 0)
    val mx = SnapshotStore.read(spark, root)
      .agg(max(col("o_orderkey"))).head().getLong(0)

    val times = (1 to n).map { b =>
      val lo = mx / 20 * (b % 20)
      val hi = lo + mx / 20
      val t0 = System.nanoTime()
      graft.queries.Lakehouse.mutateSnapshot(spark, root, s"b$b") { cur =>
        val t = spark.read.parquet(cur: _*)
        val affected = t.where(col("o_orderkey").between(lo, hi))
          .select(input_file_name().as("f")).distinct()
          .collect().map(r =>
            new org.apache.hadoop.fs.Path(r.getString(0)).toUri.getPath).toSeq
        if (affected.isEmpty) (Nil, None, None)
        else {
          val repl = spark.read.parquet(affected: _*)
            .withColumn("o_totalprice",
              when(col("o_orderkey").between(lo, hi),
                col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
          (affected, Some(repl), None)
        }
      }
      (System.nanoTime() - t0) / 1e9
    }
    val rows = SnapshotStore.read(spark, root).count()
    val manifest = SnapshotStore.files(spark, root).length
    val perV = times.map(t => f"$t%.2f").mkString("[", ",", "]")
    val firstHalf = times.take(n / 2).sum / math.max(1, n / 2)
    val secondHalf = times.drop(n / 2).sum / math.max(1, n - n / 2)
    println(f"""{"sf":"$sfDir","n_versions":$n,"n_files":$nFiles,"rows":$rows,"manifest_files":$manifest,"total_sec":${times.sum}%.2f,"mean_first_half":$firstHalf%.2f,"mean_second_half":$secondHalf%.2f,"per_version_sec":$perV}""")
    spark.stop()
  }
}
