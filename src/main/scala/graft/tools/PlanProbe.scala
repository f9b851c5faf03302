package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      // AQE prints Final AND Initial sections — count only the final
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val scans = "FileScan parquet".r.findAllIn(p).size
      val reuse = "ReusedExchange".r.findAllIn(p).size
      val gen = "Generate explode".r.findAllIn(p).size
      println(s"[probe] $name scans=$scans reused=$reuse explodes=$gen")
    }
    spark.stop()
  }
}
