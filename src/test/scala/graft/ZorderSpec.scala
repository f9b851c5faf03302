package graft

import graft.queries.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the Morton interleave against an independent per-bit
  * model, and the pruning theorem the layout exists for — dropping the low
  * 2k Z-bits leaves at most k free low bits per dimension, so every cell
  * bounds BOTH keys (double-sided min-max prunability). */
class ZorderSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Independent model: interleave bit-by-bit (31 bits per dimension). */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 31).foldLeft(0L) { (z, i) =>
      z | (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the bit-by-bit model on random and edge inputs") {
    val rnd = new scala.util.Random(11)
    val max31 = 0x7FFFFFFFL
    val pairs = Seq((0L, 0L), (max31, max31), (max31, 0L), (0L, max31),
      (1L, 2L), (200000L, 999L)) ++
      Seq.fill(500)((rnd.nextLong(max31 + 1), rnd.nextLong(max31 + 1)))
    val df = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b").as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zValue masks inputs to 31 bits (no aliasing across the key domain)") {
    val df = Seq(((1L << 31) + 7L, 3L)).toDF("a", "b")
      .select(Layout.zValue($"a", $"b").as("z"))
    assert(df.head.getLong(0) == mortonRef(7L, 3L))
    // a full-width key interleaves losslessly — no silent collision of
    // distinct keys below 2^31
    val w = Seq((200000L, 999L), (200000L + 65536L, 999L)).toDF("a", "b")
      .select(Layout.zValue($"a", $"b").as("z")).collect().map(_.getLong(0))
    assert(w(0) != w(1), "16-bit-style aliasing detected")
  }

  test("every z>>10 cell spans at most 32 values of EACH dimension") {
    val cells = Layout.zorderCells(spark, TestSpark.sf).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      val (pLo, pHi) = (r.getLong(2), r.getLong(3))
      val (sLo, sHi) = (r.getLong(4), r.getLong(5))
      assert(pHi - pLo <= 31, s"cell ${r.getLong(0)} part span")
      assert(sHi - sLo <= 31, s"cell ${r.getLong(0)} supp span")
    }
  }

  test("Z-cells bound both dims where a single-key sort cannot (16-bit grid)") {
    // Deterministic scrambled grid over the FULL 16-bit range of both keys
    // (the sf0.001 tables are too narrow to show the contrast): a-sorted
    // 1024-row blocks leak almost the whole b range, while every z>>10 cell
    // still bounds both dims to <= 31.
    val df = spark.range(16384).toDF("id")
      .withColumn("a", (col("id") * 2654435761L % 65536L).cast("int"))
      .withColumn("b", ((col("id") + 9L) * 40503L % 65536L).cast("int"))
    val blocked = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"a", $"id")) - 1)
      .withColumn("blk", ($"rn" / 1024).cast("long"))
      .groupBy($"blk").agg((max($"b") - min($"b")).as("b_span"))
    val avgSpan = blocked.agg(avg($"b_span")).head.getDouble(0)
    assert(avgSpan > 1000,
      s"a-sorted blocks should leak the b range, got avg $avgSpan")
    val cells = df
      .withColumn("cell", shiftright(Layout.zValue($"a", $"b"), 10))
      .groupBy($"cell")
      .agg((max($"a") - min($"a")).as("a_span"),
        (max($"b") - min($"b")).as("b_span"))
    assert(cells.where($"a_span" > 31 || $"b_span" > 31).count() == 0)
  }

  /** Stage an events dir for the skipping pair: 4 disjoint days, ids
    * unique, values 2-dp. */
  private def stageEvents(): String = {
    val d = java.nio.file.Files.createTempDirectory("skipspec")
    // 16 distinct days: zoneSkip/indexedAttach REQUIRE the corpus to cover
    // their fixed day offsets (11th/16th) instead of silently degrading
    val rows = (0L until 400L).map { i =>
      (i, java.sql.Timestamp.valueOf(
        f"2024-02-${(i % 16) + 1}%02d ${i % 24}%02d:00:00"),
        i % 7, s"t${i % 3}", (i % 100) / 4.0)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", $"ts".cast(org.apache.spark.sql.types.TimestampNTZType))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d.toString
  }

  test("q224 zone-map skip prunes files and loses no rows") {
    val dir = stageEvents()
    // query day = the 11th distinct day (2024-02-11): a 1-day predicate
    // against an 8-file ts-ranged layout
    val got = Layout.zoneSkip(spark, dir)
    assert(got.where(!$"pruned").isEmpty, "zone map must prune files")
    val expected = graft.Tables(spark, dir, "events")
      .where(date_format($"ts", "yyyy-MM-dd") === "2024-02-11")
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotMap = got.select($"event_type", $"n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotMap == expected, s"got $gotMap expected $expected")
  }

  test("q225 bloom skip finds every target (no false negatives) and prunes") {
    val dir = stageEvents()
    val got = Layout.bloomSkip(spark, dir)
      .select($"event_id", $"pruned").collect()
    // targets: min (0), max (399), first past midpoint (200)
    assert(got.map(_.getLong(0)).sorted.toSeq == Seq(0L, 200L, 399L), got.toSeq)
    assert(got.forall(_.getBoolean(1)), "bloom index must prune files")
  }
}
