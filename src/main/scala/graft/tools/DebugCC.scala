package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch instrumentation main (not part of the driver contract). */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("debug-cc")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("q52 candidates count") {
      graft.queries.Dedup.minhashCandidates(spark, dir).count()
    }
    time("dupClusters total") {
      graft.queries.Dedup.dupClusters(spark, dir).count()
    }
    spark.stop()
  }
}
