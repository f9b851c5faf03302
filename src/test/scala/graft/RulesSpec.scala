package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must rewrite naive levenshtein range
  * predicates to the banded form without changing results. */
class RulesSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("levenshtein <= k is rewritten to the banded threshold form") {
    val p = Tables(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    val naive = p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .where(levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
      .select(col("a.p_partkey"), col("b.p_partkey"))

    val optimized = naive.queryExecution.optimizedPlan.toString
    assert(optimized.contains("levenshtein(") && optimized.contains("Some(3)"),
      optimized.take(800))

    // Same rows as the explicitly-banded q76 form.
    assert(naive.count() ==
      SparkEntry.queries("q76_edit_distance")(spark, sf).count())
  }

  test("rewrite preserves levenshtein semantics on edge cases") {
    val df = spark.createDataFrame(Seq(
      ("", ""), ("abc", "abc"), ("abc", "abd"), ("abc", "xyz"),
      ("a", "abcde"), ("kitten", "sitting"))).toDF("l", "r")
    val got = df.where(levenshtein(col("l"), col("r")) <= 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("", ""), ("abc", "abc"), ("abc", "abd")))
  }
}
