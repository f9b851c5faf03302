package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The graft-chunks MICRO-BATCH stream: the offset is the global chunk-id
  * counter, so ingestion of newly arrived (monotonically named) files
  * continues the id sequence exactly where the last batch stopped — the
  * reference's "master splits arriving files into chunks" loop as a
  * Structured Streaming source. */
class ChunkStreamSpec extends AnyFunSuite {
  import TestSpark.spark

  test("new files stream as new chunks with continuous global ids") {
    val d = Files.createTempDirectory("chunkstream")
    // 000.txt: 5 lines, rpc=2 -> chunks 0,1,2 (no even division)
    Files.writeString(d.resolve("000.txt"),
      (1 to 5).map(i => s"a$i").mkString("\n") + "\n")
    val q = spark.readStream.format("graft-chunks")
      .option("recordsPerChunk", 2).load(d.toString)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table("chunk_stream")
        .select(col("chunk_id"), col("value")).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toSet
      assert(first == Set(0 -> "a1", 0 -> "a2", 1 -> "a3", 1 -> "a4",
        2 -> "a5"), first)

      // 001.txt arrives: 4 lines -> chunks 3,4 (+ numbered empty 5)
      Files.writeString(d.resolve("001.txt"),
        (1 to 4).map(i => s"b$i").mkString("\n") + "\n")
      q.processAllAvailable()
      val all = spark.table("chunk_stream")
        .select(col("chunk_id"), col("value")).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toSet
      assert(all == first ++ Set(3 -> "b1", 3 -> "b2", 4 -> "b3",
        4 -> "b4"), all)

      // 002.txt arrives AFTER the even-division file: starts at id 6
      Files.writeString(d.resolve("002.txt"), "c1\n")
      q.processAllAvailable()
      val ids = spark.table("chunk_stream")
        .select(col("chunk_id")).collect().map(_.getInt(0)).toSet
      assert(ids == Set(0, 1, 2, 3, 4, 6), ids)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS chunk_stream")
    }
  }

  test("an unchanged directory yields no new batches (offset is stable)") {
    val d = Files.createTempDirectory("chunkstable")
    Files.writeString(d.resolve("000.txt"), "x1\nx2\nx3\n")
    val q = spark.readStream.format("graft-chunks")
      .option("recordsPerChunk", 2).load(d.toString)
      .writeStream.format("memory").queryName("chunk_stable")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("chunk_stable").count()
      q.processAllAvailable()
      val n2 = spark.table("chunk_stable").count()
      assert(n1 == 3 && n2 == 3, (n1, n2))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS chunk_stable")
    }
  }

  test("restart from checkpoint is exactly-once: no re-emit, ids continue") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("chunkrestart")
    val cp = Files.createTempDirectory("chunkrestart_cp").toString
    val out = Files.createTempDirectory("chunkrestart_out").toString + "/sink"
    Files.writeString(d.resolve("000.txt"),
      (1 to 5).map(i => s"a$i").mkString("\n") + "\n") // chunks 0,1,2

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-chunks")
        .option("recordsPerChunk", 2).load(d.toString)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }

    runOnce() // batch 1: file 000
    // the query is STOPPED; a new file lands while nothing is running
    Files.writeString(d.resolve("001.txt"),
      (1 to 4).map(i => s"b$i").mkString("\n") + "\n") // chunks 3,4
    runOnce() // a NEW query resumes from the checkpointed global offset

    val rows = spark.read.parquet(out)
      .select(col("chunk_id"), col("value")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSeq
    // exactly-once across the restart: the first file's rows appear ONCE
    // (a lost offset would re-emit chunks 0-2; a corrupted one would
    // renumber the new file's chunks)
    assert(rows.size == rows.toSet.size, s"duplicated rows: $rows")
    assert(rows.toSet == Set(0 -> "a1", 0 -> "a2", 1 -> "a3", 1 -> "a4",
      2 -> "a5", 3 -> "b1", 3 -> "b2", 4 -> "b3", 4 -> "b4"), rows.toSet)
  }
}
