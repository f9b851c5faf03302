package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch instrumentation main (not part of the driver contract):
  * times individual registry queries through the same noop sink Bench
  * uses. Usage: runMain graft.tools.DebugCC <sfDir> <queryName>...
  * Each query runs twice (cold + warm) so plan/codegen cost is separable
  * from execution cost.
  */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("debug-queries")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (name <- names; pass <- 1 to 2) {
      if (pass > 1) graft.queries.Dedup.clearCcCache()
      time(s"$name pass$pass") {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
