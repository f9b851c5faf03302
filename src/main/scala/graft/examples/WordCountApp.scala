package graft.examples

import graft.operators.MRJob
import org.apache.spark.sql.SparkSession

/** The reference's WordCount client (`wordcount-src/WordCount.java:13-35` +
  * `ClientDriver`) ported 1:1 to the graft facade — see MIGRATION.md for
  * the line-by-line mapping. Usage:
  *
  *   runMain graft.examples.WordCountApp <textInputDir> <outputDir> [reducers]
  */
object WordCountApp {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val reducers = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-wordcount")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    import spark.implicits._

    // reference: map(key, value, output) { tokenize; output.collect(word, 1) }
    //            reduce(key, values, output) { sum }  +  IntWritable.add
    MRJob.textDir(spark, in)
      .mapToPairs(line =>
        line.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L))
      .reduceByKey(_ + _)
      .writeTsv(out, reducers)

    spark.stop()
  }
}

/** The reference's WordLength histogram (`wordlength-src/WordLength.java:
  * 13-40`) on the same facade. */
object WordLengthApp {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val reducers = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-wordlength")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    import spark.implicits._

    MRJob.textDir(spark, in)
      .mapToPairs(line =>
        line.split("\\s+").iterator.filter(_.nonEmpty).map(w => w.length.toLong -> 1L))
      .reduceByKey(_ + _)
      .writeTsv(out, reducers)

    spark.stop()
  }
}
