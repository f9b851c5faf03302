package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev harness: dump the formatted physical plan of registered queries.
  * Usage: runMain graft.tools.Explain <sfDir> <queryName> [<queryName>...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.tail) {
      println(s"========== $name ==========")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
