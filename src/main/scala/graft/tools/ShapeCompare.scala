package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Head-to-head timing of the q167 model-derivation shapes at a given
  * sf dir: OLD (model aggregated directly from the exploded bigram
  * stream — two corpus explodes, map-side-combined small model shuffle)
  * vs NEW (model re-aggregated from the per-doc count table — one
  * explode, the (doc, bigram) exchange reused). Decides with numbers
  * which side of the explode-vs-reuse trade-off wins at scale. */
object ShapeCompare {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master(graft.Sessions.master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def bg = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
          |  i -> concat(toks[i], ' ', toks[i + 1]))""".stripMargin)).as("b"))

    def finish(perDoc: DataFrame, model: DataFrame): DataFrame =
      perDoc.join(model, Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt") * col("k")).as("sum_cnt"), sum(col("k")).as("n_bigrams"))

    def oldShape(): DataFrame = {
      val model = bg.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      val perDoc = bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("k"))
      finish(perDoc, model)
    }
    def newShape(): DataFrame = {
      val perDoc = bg.where(col("b").isNotNull)
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("k"))
      val model = perDoc.groupBy(col("b")).agg(sum(col("k")).as("cnt"))
      finish(perDoc, model)
    }
    for (pass <- 1 to 2; (name, f) <- Seq("old" -> oldShape _, "new" -> newShape _)) {
      val t0 = System.nanoTime()
      val n = f().count()
      println(f"[shape] pass=$pass $name%-4s ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
