package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface: scan/filter/project, aggregation (the
  * reference's core capability, O7/O10/O11), distinct, sort/limit, set ops,
  * rollup/cube. All declarative — Catalyst pushes the filters/projections
  * into the parquet scan and plans partial+final hash aggregation, which is
  * precisely the reference's per-chunk-reduce + add-merge model at scale.
  */
object Relational {
  import Exact._

  /** TPC-H Q1-shaped pricing summary: partial+final hash agg over ~4 groups;
    * at 100 TB this is a map-side-combine-dominated scan, the ideal shape. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        davg2(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val pricingSummarySql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum2("l_quantity")} AS sum_qty,
       |  ${sqlSum2("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum4("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlAvg2("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Filter+projection pushed to the parquet scan (PushedFilters/ReadSchema). */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("2000-06-01").cast("timestamp") &&
        col("l_discount") > 0.07)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_shipdate"))

  def distinctFlags(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    * no global sort; the only shape that survives 100 TB ordering. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  private def custNk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").select(col("c_nationkey").as("nk"))
  private def suppNk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "supplier").select(col("s_nationkey").as("nk"))

  def unionNations(spark: SparkSession, dir: String): DataFrame =
    custNk(spark, dir).union(suppNk(spark, dir)).distinct()

  def intersectNations(spark: SparkSession, dir: String): DataFrame =
    custNk(spark, dir).intersect(suppNk(spark, dir))

  /** Customers ordering in 1995 but never since 1999 (non-trivial EXCEPT). */
  def exceptLapsedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    orders.where(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("ck")).distinct()
      .except(orders.where(year(col("o_orderdate")) >= 1999)
        .select(col("o_custkey").as("ck")).distinct())
  }

  def rollupLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))

  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum2(col("o_totalprice")).as("tot"), count(lit(1)).as("cnt"))

  /** Explicit GROUPING SETS (beyond rollup/cube): (flag,status), (flag), ().
    * Catalyst plans one Expand + single hash agg — one shuffle for all sets. */
  def groupingSetsLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q10_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    QueryDef("q11_filter_project", filterProject, Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00' AND l_discount > 0.07""".stripMargin)),
    QueryDef("q12_distinct", distinctFlags, Some(
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),
    QueryDef("q13_top_orders", topOrders, Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),
    QueryDef("q14_union", unionNations, Some(
      "SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier")),
    QueryDef("q15_intersect", intersectNations, Some(
      "SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier")),
    QueryDef("q16_except", exceptLapsedCustomers, Some(
      """SELECT DISTINCT o_custkey AS ck FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT DISTINCT o_custkey AS ck FROM orders WHERE year(o_orderdate) >= 1999""".stripMargin)),
    QueryDef("q17_rollup", rollupLineitem, Some(
      s"""SELECT l_returnflag, l_linestatus, ${sqlSum2("l_quantity")} AS sum_qty,
         |  count(*) AS cnt
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),
    QueryDef("q18_cube", cubeOrders, Some(
      s"""SELECT o_orderstatus, o_orderpriority, ${sqlSum2("o_totalprice")} AS tot,
         |  count(*) AS cnt
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),
    QueryDef("q19_grouping_sets", groupingSetsLineitem, Some(
      s"""SELECT l_returnflag, l_linestatus, ${sqlSum2("l_quantity")} AS sum_qty,
         |  count(*) AS cnt
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)))
}
