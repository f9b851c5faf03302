package graft

import graft.functions.dot_d
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct expression: bit-parity with the composable
  * higher-order-function form, null semantics, SQL registration via
  * GraftExtensions, and codegen participation. */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val fold =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  test("dot_d is bit-identical to the aggregate(zip_with) fold") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(64)((
      Array.fill(33)(rnd.nextDouble() * 2 - 1),
      Array.fill(33)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(dot_d($"a", $"b").as("native"), expr(fold).as("folded"))
    assert(df.where($"native" =!= $"folded").count() == 0)
    assert(df.count() == 64)
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(dot_d($"a", $"b")).head.isNullAt(0))
  }

  test("dot_d is registered in SQL via GraftExtensions") {
    val r = spark.sql("SELECT dot_d(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d")
    assert(r.head.getDouble(0) == 32.0)
  }

  test("dot_d stays inside whole-stage codegen") {
    // non-foldable input (else the optimizer constant-folds the whole thing)
    val df = spark.range(10)
      .select(array($"id".cast("double"), lit(2.0)).as("v"))
      .select(dot_d($"v", $"v").as("d"))
    val p = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("codegen id"), p) // inside a WholeStageCodegen subtree
    assert(df.collect().map(_.getDouble(0)).sum > 0)
  }

  test("sorted_intersect_l equals array_intersect on sorted distinct arrays") {
    import graft.functions.sorted_intersect_l
    val rnd = new scala.util.Random(13)
    // random sorted distinct arrays, including empties and disjoint pairs
    val rows = Seq.fill(128)((
      rnd.shuffle((0L until 200L).toList).take(rnd.nextInt(40)).sorted.toArray,
      rnd.shuffle((0L until 200L).toList).take(rnd.nextInt(40)).sorted.toArray))
    val df = rows.toDF("a", "b").select(
      sorted_intersect_l($"a", $"b").as("native"),
      array_intersect($"a", $"b").as("builtin"))
    assert(df.where(not($"native" <=> $"builtin")).count() == 0)
    assert(df.count() == 128)
    // null propagation matches array_intersect
    val n = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
    assert(n.select(sorted_intersect_l($"a", $"b")).head.isNullAt(0))
    // SQL registration via GraftExtensions
    val r = spark.sql(
      "SELECT sorted_intersect_l(array(1L,3L,5L), array(2L,3L,5L,9L)) AS v")
    assert(r.head.getSeq[Long](0) == Seq(3L, 5L))
    // stays inside whole-stage codegen
    val cg = spark.range(10)
      .select(array($"id", $"id" + 5L).as("v"))
      .select(sorted_intersect_l($"v", $"v").as("s"))
    val p = cg.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("codegen id"), p)
    assert(cg.collect().map(_.getSeq[Long](0).length).sum == 20)
  }

  test("l2sq_l equals the integer zip_with fold and handles nulls/SQL/codegen") {
    import graft.functions.l2sq_l
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(64)((
      Array.fill(33)(rnd.nextLong() % (1L << 21)),
      Array.fill(33)(rnd.nextLong() % (1L << 21))))
    val intFold =
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"
    val df = rows.toDF("a", "b")
      .select(l2sq_l($"a", $"b").as("native"), expr(intFold).as("folded"))
    assert(df.where($"native" =!= $"folded").count() == 0)
    // null propagation
    val nd = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(nd.select(l2sq_l($"a", $"b")).head.isNullAt(0))
    // length mismatch → null (the zip_with fold's semantics: the padded
    // null element nulls the sum), in BOTH interpreted and codegen paths
    val mm = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    assert(mm.select(l2sq_l($"a", $"b")).head.isNullAt(0))
    val mmFold = mm.selectExpr(intFold + " AS f")
    assert(mmFold.head.isNullAt(0)) // the documented equivalence itself
    val mmCg = spark.range(3) // non-local input: exercises doGenCode
      .select(array($"id", lit(2L), lit(3L)).as("a"), array($"id").as("b"))
      .select(l2sq_l($"a", $"b").as("d"))
    assert(mmCg.collect().forall(_.isNullAt(0)))
    // SQL registration via GraftExtensions
    assert(spark.sql("SELECT l2sq_l(array(1L, 5L), array(4L, 1L)) AS d")
      .head.getLong(0) == 25L)
    // codegen participation: non-foldable, non-local input (a literal
    // local relation would collapse to LocalTableScan before codegen)
    val cg = spark.range(10)
      .select(array($"id", lit(2L)).as("v"))
      .select(l2sq_l($"v", $"v").as("d"))
    val plan = cg.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("codegen id"), plan)
    assert(cg.collect().forall(_.getLong(0) == 0L))
  }

  test("top_k_pairs: order, ties, k bound, null skipping — any partitioning") {
    graft.functions.GraftExtensions.registerTopK(spark)
    // group 1: 5 candidates incl. a score tie (id asc breaks it) and a
    // null score (skipped); group 2: fewer rows than k
    val rows = Seq[(Long, java.lang.Double, Long)](
      (1L, 5.0, 101L), (1L, 7.0, 102L), (1L, 5.0, 100L), (1L, null, 99L),
      (1L, 1.0, 103L), (2L, 2.0, 201L))
    for (parts <- Seq(1, 3, 7)) {
      val got = spark.createDataFrame(rows).toDF("g", "s", "i")
        .repartition(parts)
        .groupBy($"g")
        .agg(expr("top_k_pairs(s, i, 3)").as("tk"))
        .collect().map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(p => (p.getDouble(0), p.getLong(1))))
        .toMap
      assert(got(1L) == Seq((7.0, 102L), (5.0, 100L), (5.0, 101L)),
        s"parts=$parts: ${got(1L)}")
      assert(got(2L) == Seq((2.0, 201L)), s"parts=$parts")
    }
  }

  test("cms_agg: matrix matches the SQL md5 hash family, any partitioning") {
    graft.functions.GraftExtensions.registerCms(spark)
    val rows = Seq(("alpha", 5L), ("beta", 3L), ("gamma", 7L), ("alpha", 2L),
      ("delta", 1L), (null, 9L)) // null key skipped (SQL agg convention)
    val (depth, width) = (4, 32)
    // Expected matrix built through Spark's OWN md5/conv SQL path — an
    // independent implementation of the hash the native aggregate must
    // match bit-for-bit (the cross-engine contract the oracle relies on).
    val df = spark.createDataFrame(rows).toDF("w", "c").where($"w".isNotNull)
    val expected = Array.fill(depth * width)(0L)
    (0 until depth).foreach { i =>
      df.select(
          expr(s"CAST(conv(substring(md5(concat('$i:', w)), 1, 15), 16, 10) AS BIGINT) % $width")
            .cast("int").as("cell"), $"c")
        .groupBy($"cell").agg(sum($"c").as("s")).collect()
        .foreach(r => expected(i * width + r.getInt(0)) = r.getLong(1))
    }
    for (parts <- Seq(1, 3, 7)) {
      val got = spark.createDataFrame(rows).toDF("w", "c").repartition(parts)
        .agg(expr(s"cms_agg(w, c, $depth, $width)").as("m"))
        .head().getSeq[Long](0).toArray
      assert(got.sameElements(expected), s"parts=$parts")
      // each matrix row is a partition of the total mass
      (0 until depth).foreach { i =>
        assert(got.slice(i * width, (i + 1) * width).sum == 18L, s"row $i")
      }
    }
  }

  test("cms_agg survives a serialize/deserialize/merge round trip") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{LongType, StringType}
    val agg = graft.functions.CmsAgg(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, LongType, nullable = true), 2, 8)
    val a = agg.createAggregationBuffer()
    a(agg.cell(0, "x")) += 4L
    a(8 + agg.cell(1, "x")) += 4L
    val b = agg.deserialize(agg.serialize(a))
    assert(b.sameElements(a))
    val other = agg.createAggregationBuffer()
    other(agg.cell(0, "y")) += 2L
    other(8 + agg.cell(1, "y")) += 2L
    val m = agg.merge(b, other)
    assert(m.sum == 12L)
    assert(m(agg.cell(0, "x")) >= 4L && m(8 + agg.cell(1, "y")) >= 2L)
  }

  test("top_k_pairs survives a serialize/deserialize/merge round trip") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val agg = graft.functions.TopKPairs(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), 2)
    val a = agg.createAggregationBuffer()
    Seq((3.0, 1L), (9.0, 2L), (1.0, 3L)).foreach(p =>
      agg.merge(a, scala.collection.mutable.ArrayBuffer(p)))
    val b = agg.deserialize(agg.serialize(a))
    assert(b == scala.collection.mutable.ArrayBuffer((9.0, 2L), (3.0, 1L)))
    val c = agg.merge(b, scala.collection.mutable.ArrayBuffer((5.0, 9L)))
    assert(c == scala.collection.mutable.ArrayBuffer((9.0, 2L), (5.0, 9L)))
  }
}
