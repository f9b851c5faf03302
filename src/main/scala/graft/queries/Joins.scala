package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface: broadcast-hash, shuffle (sort-merge), multi-way star join,
  * semi/anti, outer, and an equi+range join. The reference has no joins at
  * all (SURVEY.md §2.2) — this is north-star breadth, designed for scale:
  * dimension tables are explicitly `broadcast()` so the fact scan never
  * shuffles for them; only genuinely large-large joins (lineitem⋈orders)
  * shuffle, on their natural key, with AQE free to pick SMJ/SHJ.
  */
object Joins {
  import Exact._

  /** Facts ⋈ broadcast dimension; aggregation keyed on the dim attribute. */
  def revenueBySegment(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .join(broadcast(Tables(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(dsum2(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))

  /** Large⋈large on the natural key — shuffle join, partial agg above it. */
  def revenueByStatusYear(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  /** TPC-H Q5-shaped star join: one big fact chain + broadcast dims. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  def custWithOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))

  /** Customers with no order since 2001 (anti join against a filtered,
    * pushed-down right side). */
  def custWithoutRecentOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(
        Tables(spark, dir, "orders")
          .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  def ordersPerCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))

  /** Equi key + range predicate: ships-within-a-week lineitems. The equi key
    * carries the shuffle; the range is a post-join filter — the scalable
    * shape for interval joins with a natural equi component. */
  def shippedWithinWeek(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q20_join_broadcast", revenueBySegment, Some(
      s"""SELECT c_mktsegment, ${sqlSum2("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin)),
    QueryDef("q21_join_shuffle", revenueByStatusYear, Some(
      s"""SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1, 2""".stripMargin)),
    QueryDef("q22_join_star", revenueByNation, Some(
      s"""SELECT r_name, n_name,
         |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin)),
    QueryDef("q23_join_semi", custWithOrders, Some(
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment""".stripMargin)),
    QueryDef("q24_join_anti", custWithoutRecentOrders, Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin)),
    QueryDef("q25_join_outer", ordersPerCustomer, Some(
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin)),
    QueryDef("q26_join_range", shippedWithinWeek, Some(
      """SELECT o_orderpriority, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderpriority""".stripMargin)))
}
