package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function coverage: string, date, math, JSON, conditional. All
  * `org.apache.spark.sql.functions` built-ins (codegen'd, no UDFs). Integer
  * outputs are aligned to BIGINT because DuckDB's length/year/ceil return
  * 64-bit. Computed monetary values are cast to DECIMAL at the scale where
  * the true value is exact (product of two 2-dp columns -> 4 dp), never
  * `round()`ed — engines' double rounding implementations differ at
  * boundaries, exact-decimal casts don't.
  */
object Scalars {
  import Exact._

  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      lower(col("p_type")).as("type_l"),
      substring(col("p_name"), 1, 8).as("name8"),
      length(col("p_name")).cast("long").as("name_len"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      regexp_extract(col("p_name"), "[0-9]+", 0).as("first_num"))

  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("tot"))

  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1.0) + col("l_tax")))
        .cast(DecimalType(27, 4)).cast("double").as("gross"),
      abs(col("l_discount") - lit(0.05)).as("dd"),
      ceil(col("l_quantity")).as("qc"),
      floor(col("l_quantity")).as("qf"),
      sqrt(col("l_quantity")).as("qs"))

  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"))

  def caseWhen(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("big").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("tot"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q40_string_funcs", stringFuncs, Some(
      """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
        |  substring(p_name, 1, 8) AS name8, length(p_name) AS name_len,
        |  concat(p_brand, '#', p_type) AS brand_type,
        |  regexp_extract(p_name, '[0-9]+') AS first_num
        |FROM part""".stripMargin)),
    QueryDef("q41_date_funcs", dateFuncs, Some(
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
         |  count(*) AS n, ${sqlSum2("o_totalprice")} AS tot
         |FROM orders GROUP BY 1, 2""".stripMargin)),
    QueryDef("q42_math_funcs", mathFuncs, Some(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1.0 + l_tax) AS DECIMAL(27,4)) AS DOUBLE) AS gross,
        |  abs(l_discount - 0.05) AS dd,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qc,
        |  CAST(floor(l_quantity) AS BIGINT) AS qf,
        |  sqrt(l_quantity) AS qs
        |FROM lineitem""".stripMargin)),
    QueryDef("q43_json_funcs", jsonFuncs, Some(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type""".stripMargin)),
    QueryDef("q44_case_when", caseWhen, Some(
      s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
         |  WHEN o_totalprice < 300000 THEN 'mid' ELSE 'big' END AS bucket,
         |  count(*) AS n, ${sqlSum2("o_totalprice")} AS tot
         |FROM orders GROUP BY 1""".stripMargin)))
}
