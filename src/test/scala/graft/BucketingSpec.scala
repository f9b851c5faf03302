package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: both sides pre-bucketed on the join key →
  * the join plans with NO shuffle exchange. This is the 100 TB pattern for
  * repeatedly-joined fact tables (pay the shuffle once at write time,
  * never again at read time). */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("join of two tables bucketed on the key plans without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf, "orders")
        .write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      Tables(spark, sf, "customer")
        .write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"), plan)

      // and it computes the same result as the plain join
      val expected = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expected && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("winnow and sign-band indexes persist bucketed and self-join shuffle-free") {
    // the q116 pattern applied to the REST of the index family (VERDICT
    // r5 item 4): the winnowed fingerprint index and the sign-LSH band
    // index, persisted bucketed on their join keys, feed their candidate
    // self-joins with no exchange on the key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import graft.queries.{Dedup, Similarity}
      Dedup.winnowFingerprints(spark, sf)
        .select(col("doc_id"), col("fp_h").as("h")).distinct()
        .write.mode("overwrite").bucketBy(4, "h").sortBy("h")
        .saveAsTable("winnow_b")
      val wj = spark.table("winnow_b").as("a")
        .join(spark.table("winnow_b").as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      val wp = wj.queryExecution.executedPlan.toString
      assert(wp.contains("SortMergeJoin"), wp)
      assert(!wp.contains("Exchange hashpartitioning(h"), wp)
      assert(wj.count() > 0)

      // bucket on EXACTLY the join key pair: Spark's planner disables the
      // bucketed scan when bucket columns are a strict subset of the keys
      Similarity.cappedSignBands(spark, sf)
        .write.mode("overwrite").bucketBy(4, "bits", "band")
        .sortBy("bits", "band")
        .saveAsTable("signbands_b")
      val sj = spark.table("signbands_b").as("a")
        .join(spark.table("signbands_b").as("b"),
          col("a.bits") === col("b.bits") && col("a.band") === col("b.band") &&
            col("a.vec_id") < col("b.vec_id"))
      val sp = sj.queryExecution.executedPlan.toString
      assert(sp.contains("SortMergeJoin"), sp)
      assert(!sp.contains("Exchange hashpartitioning"), sp)
      assert(sj.count() >= 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS winnow_b")
      spark.sql("DROP TABLE IF EXISTS signbands_b")
    }
  }
}
