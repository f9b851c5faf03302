package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL entry point: registering the tables as views makes the whole
  * engine drivable from `spark.sql` — same Catalyst plans as the
  * DataFrame forms, including the engine's own registered functions. */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("spark.sql over registered views equals the DataFrame form") {
    for (t <- Tables.names)
      Tables(spark, sf, t).createOrReplaceTempView(t)
    val sql = spark.sql(
      """SELECT c_mktsegment, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val df = {
      import org.apache.spark.sql.functions._
      Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_orders"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(sql == df && sql.nonEmpty)
  }

  test("engine-native functions are callable from SQL") {
    for (t <- Tables.names)
      Tables(spark, sf, t).createOrReplaceTempView(t)
    val r = spark.sql(
      """SELECT vec_id,
        |  dot_d(transform(embedding, x -> cast(x AS double)),
        |        transform(embedding, x -> cast(x AS double))) AS sq_norm
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    assert(r.length == 5 && r.forall(_.getDouble(1) > 0))
  }
}
