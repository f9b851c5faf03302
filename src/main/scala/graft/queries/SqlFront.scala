package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL FRONT END as a graded registry tier: the same engine surface
  * every DataFrame query exercises, entered through `spark.sql(...)` over
  * registered views instead — the path a BI tool or an analyst hits.
  * `SqlSurfaceSpec` proves views + SQL + the native functions resolve;
  * these entries put the whole front end under the driver's DuckDB
  * oracle, so parser → analyzer → (Graft extension rules) → execution is
  * end-to-end hash-graded, not just unit-asserted.
  *
  * Each query is the SQL twin of a canonical DataFrame entry (q10
  * aggregate, q20 broadcast join, q30 window top-k) with IDENTICAL
  * column names and exactness discipline (`Exact` decimal-sum casts
  * written out in SQL), so its CORRECTNESS row must match the DataFrame
  * twin's — any divergence between the two front ends is a gate failure.
  * The view layer maps 1:1 onto [[graft.Tables]] loaders (the `events`
  * view carries the normalized `ts`), which is exactly the catalog shape
  * a production deployment would register once at session start.
  */
object SqlFront {

  /** Register the named driver tables as temp views (idempotent). */
  private def withViews(spark: SparkSession, dir: String,
      names: String*): Unit =
    names.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))

  /** q219: the q10 pricing-summary aggregate through `spark.sql`. */
  def sqlAgg(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** q220: the q20 dimension-join revenue rollup through `spark.sql`. */
  def sqlJoin(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "orders", "customer")
    spark.sql(
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
  }

  /** q221: the q30 per-user window top-k through `spark.sql` (rn cast to
    * BIGINT — Spark's row_number is INT where DuckDB's is BIGINT, the
    * same cast the DataFrame twin carries). */
  def sqlWindow(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "events")
    spark.sql(
      """SELECT event_id, user_id, value, rn FROM (
        |  SELECT event_id, user_id, value,
        |    CAST(row_number() OVER (
        |      PARTITION BY user_id ORDER BY value DESC, event_id)
        |      AS BIGINT) AS rn
        |  FROM events WHERE value IS NOT NULL) t
        |WHERE rn <= 3""".stripMargin)
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q219_sql_agg", sqlAgg, Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${graft.Exact.sqlSum2("l_quantity")} AS sum_qty,
         |  ${graft.Exact.sqlSum2("l_extendedprice")} AS sum_base_price,
         |  ${graft.Exact.sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${graft.Exact.sqlAvg2("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin)),
    QueryDef("q220_sql_join", sqlJoin, Some(
      s"""SELECT c_mktsegment,
         |  ${graft.Exact.sqlSum2("o_totalprice")} AS revenue,
         |  count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin)),
    QueryDef("q221_sql_window", sqlWindow, Some(
      """SELECT event_id, user_id, value, rn FROM (
        |  SELECT event_id, user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL) t
        |WHERE rn <= 3""".stripMargin)))
}
