package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion robustness: malformed records and schema drift are data-scale
  * certainties — at 100 TB every corrupt row that kills a job costs a full
  * re-run, so the engine's posture is quarantine-and-continue (PERMISSIVE
  * + corrupt-record column) with FAILFAST available when strictness is the
  * requirement. */
class RobustnessSpec extends AnyFunSuite {
  import TestSpark.spark

  test("q168 ingest: an arrival in a cell with no history inserts as new") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ann_empty_cell").toString
    // cell = 1-based argmax of the first 4 components
    Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0.5f), 0),   // arrival -> cell 1 (EMPTY)
      (10L, Array(0f, 1f, 0f, 0f, 0.5f), 0),  // arrival -> cell 2 (dup of 1)
      (1L, Array(0f, 1f, 0f, 0f, 0.5f), 0),   // history, cell 2
      (2L, Array(0f, 0f, 1f, 0f, 0.5f), 0))   // history, cell 3
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/emb_stage")
    // the testdata layout is a single FILE named embeddings.parquet (the
    // stream harness copies it as such), not a Spark output directory
    val part = Files.list(java.nio.file.Paths.get(s"$dir/emb_stage"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part, java.nio.file.Paths.get(s"$dir/embeddings.parquet"))
    val out = graft.queries.Similarity.streamAnnIngest(spark, dir)
      .as[(Long, Long, Option[Long], Option[Double], String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(0L, 10L))
    assert(out(0L) == ((0L, 1L, None, None, "insert_new_cell")), out(0L))
    val (_, b10, n10, c10, d10) = out(10L)
    assert(b10 == 2L && n10.contains(1L) && d10 == "near_dup")
    assert(math.abs(c10.get - 1.0) < 1e-12)
  }

  test("PERMISSIVE json read quarantines corrupt rows instead of failing") {
    val dir = Files.createTempDirectory("robust_json")
    Files.write(dir.resolve("a.json"),
      """{"id": 1, "v": 10}
        |{"id": 2, "v": 20}
        |{not json at all
        |{"id": 3, "v": 30}
        |""".stripMargin.getBytes)
    val df = spark.read
      .schema("id LONG, v LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record column requires a materialized referenced plan
    assert(df.where(col("_corrupt_record").isNull).count() == 3)
    assert(df.where(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.agg(sum("v")).head.getLong(0) == 60)
  }

  test("FAILFAST json read rejects the same input loudly") {
    val dir = Files.createTempDirectory("robust_json2")
    Files.write(dir.resolve("a.json"),
      "{\"id\": 1}\n{broken\n".getBytes)
    val ex = intercept[Exception] {
      spark.read.schema("id LONG")
        .option("mode", "FAILFAST").json(dir.toString).count()
    }
    assert(ex.getMessage != null)
  }

  test("parquet mergeSchema unions evolved schemas across files") {
    val dir = Files.createTempDirectory("evolve").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "name")
      .write.mode("append").parquet(s"$dir/t")
    Seq((2L, "b", 99L)).toDF("id", "name", "score")
      .write.mode("append").parquet(s"$dir/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(merged.count() == 2)
    // old file's missing column reads as null, not an error
    assert(merged.where(col("score").isNull).count() == 1)
  }
}
