package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Format/connector coverage (SURVEY.md §2.2 "file formats"): parquet,
  * csv, json sinks round-trip the same result losslessly. */
class SinksSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("parquet / csv / json sinks round-trip identically") {
    val df = SparkEntry.queries("q13_top_orders")(spark, sf)
    val base = Files.createTempDirectory("sinks").toString

    df.write.mode("overwrite").parquet(s"$base/p")
    df.write.mode("overwrite").option("header", "true").csv(s"$base/c")
    df.write.mode("overwrite").json(s"$base/j")

    val p = spark.read.parquet(s"$base/p")
    val c = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/c")
    val j = spark.read.json(s"$base/j")

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Any]("o_orderkey").toString.toLong,
        r.getAs[Any]("o_totalprice").toString.toDouble)
    val expected = df.collect().map(key).sorted.toSeq
    assert(p.collect().map(key).sorted.toSeq == expected)
    assert(c.collect().map(key).sorted.toSeq == expected)
    assert(j.collect().map(key).sorted.toSeq == expected)
    assert(expected.size == 100)
  }

  test("orc sink round-trips identically") {
    val df = SparkEntry.queries("q13_top_orders")(spark, sf)
    val dir = Files.createTempDirectory("orc").toString
    df.write.mode("overwrite").orc(s"$dir/o")
    assert(spark.read.orc(s"$dir/o").collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.head.asInstanceOf[Long])).toSeq ==
      df.collect().map(_.toSeq).sorted(
        Ordering.by((s: Seq[Any]) => s.head.asInstanceOf[Long])).toSeq)
  }

  test("graft-tsv DSV2 sink: round trip, file-per-partition, clean commit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tsv_sink").toString + "/out"
    val df = Seq(("a", "1"), ("b", "2"), ("c", "3"), ("d", null))
      .toDF("k", "v").repartition(3)
    df.write.format("graft-tsv").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    val parts = files.filter(_.startsWith("part-"))
    // reference shape + attempt tag: one part-<id>-<tag>.tsv per
    // partition, plus the _SUCCESS commit manifest listing exactly them
    assert(parts.forall(_.matches("part-\\d{5}-[0-9a-f]{8}\\.tsv")), parts.toSeq)
    assert(parts.length == 3, parts.toSeq)
    assert(files.contains("_SUCCESS"), files.toSeq)
    assert(scala.io.Source.fromFile(s"$dir/_SUCCESS").getLines().toSeq.sorted
      == parts.toSeq, "manifest lists exactly the committed parts")
    val lines = parts.flatMap(p =>
      scala.io.Source.fromFile(s"$dir/$p").getLines()).toSet
    assert(lines == Set("a\t1", "b\t2", "c\t3", "d\t"), lines)
    // no _temporary residue after a successful commit
    assert(!new java.io.File(s"$dir/_temporary").exists())
  }

  test("graft-tsv overwrite truncates previous parts; non-strings rejected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tsv_sink2").toString + "/out"
    Seq(("x", "9")).toDF("k", "v").repartition(4)
      .write.format("graft-tsv").mode("append").save(dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("part-")) == 4)
    Seq(("y", "1")).toDF("k", "v").coalesce(1)
      .write.format("graft-tsv").mode("overwrite").save(dir)
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("part-"))
    assert(parts.length == 1 && parts.head.startsWith("part-00000-"),
      parts.toSeq)
    assert(scala.io.Source.fromFile(s"$dir/${parts.head}").getLines().toSeq
      == Seq("y\t1"))
    val err = intercept[Exception] {
      Seq((1L, "a")).toDF("k", "v").write.format("graft-tsv")
        .mode("append").save(dir + "2")
    }
    assert(err.getMessage.contains("string columns only"), err.getMessage)
  }

  test("graft-tsv values with tabs/newlines survive the q158 sink->chunk-source round trip") {
    import spark.implicits._
    import graft.sources.TsvEscape
    val dir = Files.createTempDirectory("tsv_esc").toString + "/out"
    val rows = Seq(("k1", "tab\there"), ("k2", "line1\nline2"), ("k3", "plain"))
    rows.toDF("k", "v").coalesce(1)
      .write.format("graft-tsv").mode("overwrite").save(dir)
    // q158's read path: chunk source lines -> split on tab -> fields
    val got = spark.read.format("graft-chunks")
      .option("recordsPerChunk", 2).load(dir)
      .select(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("value"), "\t").as("kv"))
      .collect()
      .map(r => r.getSeq[String](0))
      .map(kv => (TsvEscape.unescape(kv(0)), TsvEscape.unescape(kv(1))))
      .toSet
    assert(got == rows.toSet, got)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("part_w").toString
    val orders = Tables(spark, sf, "orders")
    orders.write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(s"$dir/by_status")

    val re = spark.read.parquet(s"$dir/by_status")
      .where(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
    // The status filter must become a partition filter (directory pruning,
    // zero data-file reads outside o_orderstatus=F), not a row filter.
    val scan = re.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_orderstatus"), scan.take(500))
    assert(re.count() ==
      orders.where(org.apache.spark.sql.functions.col("o_orderstatus") === "F").count())
  }
}
