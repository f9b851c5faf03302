package graft

import graft.plans.AsOfJoin
import graft.queries.Joins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of physical operator (AsOfJoinPlan/Strategy/Exec):
  * value-identical to the composed union+window form (q27), correct
  * null-extension and inclusive-tie semantics on adversarial synthetic
  * inputs, and the plan shape the operator exists for — one exchange per
  * side, a streaming merge, no window, no range join. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("q27b native as-of equals the composed union+window q27 exactly") {
    val native = Joins.lastOrderAsOfNative(spark, TestSpark.sf)
    val composed = SparkEntry.queries("q27_join_asof")(spark, TestSpark.sf)
    assert(native.count() == composed.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("left rows with no as-of match are null-extended; ties are inclusive") {
    val probe = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (3L, 1L, "d"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 5L, "x5"), (1L, 8L, "x8"), (2L, 9L, "y9"))
      .toDF("bk", "bt", "v")
    val r = AsOfJoin(probe, build, "k", "bk", "t", "bt")
      .select($"tag", $"v").collect().map(x => (x.getString(0), x.getString(1)))
      .toMap
    assert(r("a") == "x8") // latest at-or-before 10
    assert(r("b") == "x5") // inclusive: bt == t matches
    assert(r("c") == null) // build time 9 > 7 — no match
    assert(r("d") == null) // key absent entirely
  }

  test("null extension nulls NON-NULLABLE build columns (not 0/epoch)") {
    // local-relation Longs are non-nullable; an unmatched probe row must
    // surface NULL through them, not the type's zero value (the projection
    // must bind against nullable right attributes)
    val probe = Seq((1L, 10L)).toDF("k", "t")
    val build = Seq((2L, 5L, 42L)).toDF("bk", "bt", "v")
    val r = AsOfJoin(probe, build, "k", "bk", "t", "bt").head
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), r)
  }

  test("mixed-representation key or time types are rejected loudly") {
    val probe = Seq((1L, 10L)).toDF("k", "t")
    val build = Seq((2, 5L, 42L)).toDF("bk", "bt", "v") // Int key
    intercept[IllegalArgumentException] {
      AsOfJoin(probe, build, "k", "bk", "t", "bt")
    }
    val buildDate = Seq((2L, java.sql.Date.valueOf("2020-01-01")))
      .toDF("bk", "bt") // Date time vs Long time
    intercept[IllegalArgumentException] {
      AsOfJoin(probe, buildDate, "k", "bk", "t", "bt")
    }
  }

  test("match resets across keys (no bleed of a previous key's buffer)") {
    val probe = Seq((1L, 100L, "p1"), (2L, 100L, "p2")).toDF("k", "t", "tag")
    val build = Seq((1L, 50L, "m1")).toDF("bk", "bt", "v")
    val r = AsOfJoin(probe, build, "k", "bk", "t", "bt")
      .select($"tag", $"v").collect().map(x => (x.getString(0), x.getString(1)))
      .toMap
    assert(r("p1") == "m1")
    assert(r("p2") == null)
  }

  test("plans as AsOfJoinExec with one exchange per side and no window") {
    val p = Joins.lastOrderAsOfNative(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p) // AsOfJoinExec renders as "AsOfJoin"
    assert(!p.contains("Window"), p)
    assert(!p.toLowerCase.contains("cartesian"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected <=3 exchanges (2 sides + agg), got:\n$p")
  }

  test("native operator is partition-count invariant") {
    val a = Joins.lastOrderAsOfNative(spark, TestSpark.sf)
      .withColumn("h", md5(concat_ws("|", $"event_id", $"user_id",
        $"asof_day".cast("string"), $"asof_spend".cast("string"))))
      .agg(count(lit(1)), sum(conv(substring($"h", 1, 15), 16, 10).cast("long") % 2147483647L))
      .head
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Joins.lastOrderAsOfNative(spark, TestSpark.sf)
        .withColumn("h", md5(concat_ws("|", $"event_id", $"user_id",
          $"asof_day".cast("string"), $"asof_spend".cast("string"))))
        .agg(count(lit(1)), sum(conv(substring($"h", 1, 15), 16, 10).cast("long") % 2147483647L))
        .head
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
