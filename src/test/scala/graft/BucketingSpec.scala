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
}
