package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.scalatest.funsuite.AnyFunSuite

case class NationRow(n_nationkey: Long, n_name: String, n_regionkey: Long)

/** The typed `Dataset[T]` surface: case-class encoders, typed
  * filter/map/groupByKey, and `Aggregator.toColumn` — the compile-time-safe
  * face of the same engine (`DataFrame` = `Dataset[Row]` underneath, same
  * plans, same codegen). */
class TypedApiSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private lazy val nations = Tables(spark, sf, "nation").as[NationRow]

  test("typed filter/map agree with the untyped plan") {
    val typed = nations.filter(_.n_regionkey == 2).map(_.n_name)
      .collect().toSet
    val untyped = Tables(spark, sf, "nation")
      .where($"n_regionkey" === 2).select("n_name")
      .collect().map(_.getString(0)).toSet
    assert(typed == untyped && typed.nonEmpty)
  }

  test("groupByKey + typed Aggregator.toColumn computes a per-key monoid") {
    val longest = new Aggregator[NationRow, String, String] {
      def zero: String = ""
      def reduce(b: String, n: NationRow): String =
        if (n.n_name.length > b.length) n.n_name else b
      def merge(x: String, y: String): String =
        if (x.length >= y.length) x else y
      def finish(b: String): String = b
      def bufferEncoder: Encoder[String] = Encoders.STRING
      def outputEncoder: Encoder[String] = Encoders.STRING
    }
    val byRegion = nations.groupByKey(_.n_regionkey)
      .agg(longest.toColumn.name("longest"))
      .collect().toMap
    val expected = nations.collect().groupBy(_.n_regionkey)
      .view.mapValues(_.map(_.n_name).maxBy(n => (n.length, -n.hashCode))).toMap
    for ((k, v) <- byRegion)
      assert(v.length == expected(k).length, s"region $k")
  }

  test("joinWith keeps both sides typed") {
    val c = Tables(spark, sf, "customer")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Long)]
    val joined = c.joinWith(nations, c("c_nationkey") === nations("n_nationkey"))
    val row = joined.head()
    assert(row._1._2 == row._2.n_nationkey)
    assert(joined.count() == c.count())
  }
}
