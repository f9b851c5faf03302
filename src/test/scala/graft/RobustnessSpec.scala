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
