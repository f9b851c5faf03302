package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and yields a sane result; the
  * oracle-differential gate (graft.Verify + DuckDB) covers exact values. */
class QueriesSmokeSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  // Pair-producing and diff queries can legitimately be empty at tiny
  // scale (q287: no key restates between the two as-at dates when the
  // tiny corpus has no masked late arrival in the window — the oracle
  // still grades the 0-row result exactly).
  private val mayBeEmpty = Set("q51_dedup_jaccard", "q52_dedup_minhash",
    "q61_neardup_lsh", "q16_except", "q24_join_anti",
    "q287_restatement_diff")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("sketch aggregates are within tolerance of exact values") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q47_sketch_aggs")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k).toDouble
      assert(math.abs(a - e) / e < 0.1, s"$k: approx $a vs exact $e")
    }
  }

  test("every oracle key is a registered query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
