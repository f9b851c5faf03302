package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The graft-chunks DataSourceV2 connector must reproduce the reference's
  * chunk split exactly: per-file runs of recordsPerChunk lines, global
  * sequential ids, the even-division trailing empty chunk consuming an id
  * (MasterNode.java:89-127), one Spark input partition per chunk. */
class ChunkSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("chunksrc")
    // a.txt: 5 lines -> chunks 0 (l1 l2), 1 (l3 l4), 2 (l5)
    Files.writeString(d.resolve("a.txt"), (1 to 5).map(i => s"a$i").mkString("\n") + "\n")
    // b.txt: 4 lines -> chunks 3 (m1 m2), 4 (m3 m4), 5 = trailing empty
    Files.writeString(d.resolve("b.txt"), (1 to 4).map(i => s"b$i").mkString("\n") + "\n")
    d.toString
  }

  private lazy val df = spark.read.format("graft-chunks")
    .option("recordsPerChunk", 2).load(dir)

  test("a _SUCCESS manifest restricts reads; stale entries and strays are tolerated") {
    val d = Files.createTempDirectory("chunkmanifest")
    Files.writeString(d.resolve("part-a.tsv"), "x1\nx2\n")
    Files.writeString(d.resolve("part-b.tsv"), "y1\n")
    Files.writeString(d.resolve("part-stray.tsv"), "STRAY\n")
    // manifest: lists a+b (not the stray) PLUS an entry whose file is gone
    Files.writeString(d.resolve("_SUCCESS"),
      "part-a.tsv\npart-b.tsv\npart-gone.tsv\n")
    val rows = spark.read.format("graft-chunks")
      .option("recordsPerChunk", 10).load(d.toString)
      .collect().map(_.getString(1)).toSet
    assert(rows == Set("x1", "x2", "y1"), rows) // stray invisible, no crash
    // an EMPTY _SUCCESS (Hadoop's plain marker) imposes no restriction
    Files.writeString(d.resolve("_SUCCESS"), "")
    val all = spark.read.format("graft-chunks")
      .option("recordsPerChunk", 10).load(d.toString)
      .collect().map(_.getString(1)).toSet
    assert(all == Set("x1", "x2", "y1", "STRAY"), all)
  }

  test("rows match spark.read.text and chunk assignment is the reference's") {
    val got = df.collect().map(r => r.getInt(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got == Map(
      0 -> Set("a1", "a2"), 1 -> Set("a3", "a4"), 2 -> Set("a5"),
      3 -> Set("b1", "b2"), 4 -> Set("b3", "b4")), got)
    // chunk id 5 is the even-division trailing empty chunk: numbered, not
    // planned — a third file would start at id 6
    val text = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(df.select("value").collect().map(_.getString(0)).sorted
      .sameElements(text))
  }

  test("every chunk is one Spark input partition") {
    assert(df.rdd.getNumPartitions == 5) // 5 non-empty chunks
  }

  test("column pruning reaches the chunk scan") {
    import org.apache.spark.sql.functions.col
    val pruned = df.select(col("chunk_id"))
    val plan = pruned.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // the scan's output must be the single pruned column (DSV2 BatchScan
    // prints `Output [n]` instead of the V1 ReadSchema line)
    assert(plan.contains("Output [1]: [chunk_id"), plan)
    assert(pruned.collect().map(_.getInt(0)).sorted
      .sameElements(Array(0, 0, 1, 1, 2, 3, 3, 4, 4)))
  }

  test("malformed UTF-8 degrades to replacement chars like spark.read.text") {
    val d = Files.createTempDirectory("chunkbad")
    // a valid line, then one ending in a NUL byte and a lone 0xFF byte
    // (invalid UTF-8) — fixture bytes built purely from escapes so this
    // .scala source stays plain text (diffable in git)
    Files.write(d.resolve("bad.txt"),
      "good line\nbad ".getBytes("UTF-8") ++
        Array(0x00.toByte, 0xFF.toByte) ++ "\n".getBytes)
    val rows = spark.read.format("graft-chunks")
      .option("recordsPerChunk", 2).load(d.toString)
      .select("value").collect().map(_.getString(0))
    val text = spark.read.text(d.toString).collect().map(_.getString(0))
    assert(rows.sorted.sameElements(text.sorted), rows.toSeq)
    assert(rows.exists(_.contains('�'))) // degraded, not crashed
  }

  test("chunk rows flow into the standard aggregation surface") {
    import org.apache.spark.sql.functions._
    // per-chunk counts — the facade's (key, chunk)-grained shape (SURVEY
    // §1.3.3) expressed over the connector's chunk_id column
    val perChunk = df.groupBy(col("chunk_id")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perChunk == Map(0 -> 2L, 1 -> 2L, 2 -> 1L, 3 -> 2L, 4 -> 2L))
  }

  test("chunk_id filters prune partitions at planning") {
    import org.apache.spark.sql.functions.col
    // equality: exactly one chunk planned, nothing filtered post-scan
    val one = df.where(col("chunk_id") === 3)
    assert(one.rdd.getNumPartitions == 1, "equality should plan 1 partition")
    assert(one.collect().map(_.getString(1)).toSet == Set("b1", "b2"))
    // range: two chunks planned (ids 1 and 2 of a.txt)
    val range = df.where(col("chunk_id") >= 1 && col("chunk_id") < 3)
    assert(range.rdd.getNumPartitions == 2, "range should plan 2 partitions")
    assert(range.collect().map(_.getString(1)).toSet == Set("a3", "a4", "a5"))
    // the pushed filter is visible in the physical plan description
    val plan = one.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters"), plan)
  }

  test("value-pruned reader emits rows without opening the file") {
    import graft.sources.{ChunkPartition, ChunkReader}
    // a chunk_id-only projection answers from the planned line count — the
    // reader must not touch the file at all (here it cannot: none exists)
    val r = new ChunkReader(
      ChunkPartition("/nonexistent/graft_chunk_meta_only", 0L, 3L, 0L, 7),
      Array("chunk_id"))
    try {
      var n = 0
      while (r.next()) { assert(r.get().getInt(0) == 7); n += 1 }
      assert(n == 3)
    } finally r.close()
  }

  test("split layout is memoized per (path, size, mtime)") {
    import org.apache.spark.sql.functions._
    val d = Files.createTempDirectory("chunkmemo")
    val f = d.resolve("c.txt")
    Files.writeString(f, (1 to 5).map(i => s"c$i").mkString("\n") + "\n") // 15 B, 5 lines
    val cdf = spark.read.format("graft-chunks")
      .option("recordsPerChunk", 2).load(d.toString)
    cdf.select("chunk_id").collect() // warm the layout memo
    // same byte size + restored mtime = same fingerprint: planning must be
    // served from the memo, NOT re-analysis (which would see 1 line here)
    val mtime = Files.getLastModifiedTime(f)
    Files.writeString(f, "x" * 15)
    Files.setLastModifiedTime(f, mtime)
    val counts = cdf.groupBy(col("chunk_id")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(0 -> 2L, 1 -> 2L, 2 -> 1L), counts)
  }

  test("carriage-return terminators split lines like BufferedReader") {
    // \n, \r, \r\n all terminate; a final line without a terminator counts
    val d = Files.createTempDirectory("chunkcr")
    Files.write(d.resolve("m.txt"), "x1\r\nx2\rx3\nx4".getBytes("UTF-8"))
    val rows = spark.read.format("graft-chunks")
      .option("recordsPerChunk", 3).load(d.toString)
      .collect().map(r => r.getInt(0) -> r.getString(1))
    assert(rows.toSet == Set(0 -> "x1", 0 -> "x2", 0 -> "x3", 1 -> "x4"), rows.toSeq)
  }

  test("scan statistics are exact and shrink under chunk_id pruning") {
    import org.apache.spark.sql.functions.col
    def leafStats(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectLeaves().head.stats
    val full = leafStats(df)
    assert(full.rowCount.contains(BigInt(9)), full) // 5 + 4 lines
    val pruned = leafStats(df.where(col("chunk_id") === 3))
    assert(pruned.rowCount.contains(BigInt(2)), pruned) // chunk 3 = b1 b2
    assert(pruned.sizeInBytes < full.sizeInBytes, (pruned, full))
  }

  test("byte scanner matches BufferedReader.readLine on adversarial inputs") {
    // the planner's byte-level line scan must agree with the readers'
    // BufferedReader view for EVERY terminator mix, malformed byte, and
    // chunk size — line count, and chunk contents via the seek offsets
    import graft.sources.{ChunkPartition, ChunkReader, ChunkTextSource}
    val rnd = new scala.util.Random(42)
    val alphabet: Array[Byte] =
      "ab\n\r ".getBytes("UTF-8") ++ Array(0xFF.toByte, 0xC3.toByte)
    for (trial <- 0 until 60) {
      val n = rnd.nextInt(40)
      val bytes = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
      val d = Files.createTempDirectory("chunkprop")
      val f = d.resolve("t.bin")
      Files.write(f, bytes)
      // reference: BufferedReader over the same lenient decoding
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.io.ByteArrayInputStream(bytes),
        java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)))
      val expected = Iterator.continually(br.readLine()).takeWhile(_ != null).toList
      for (rec <- Seq(1, 2, 3, 7)) {
        val layout = ChunkTextSource.analyzeFile(f.toString, rec)
        assert(layout.lines == expected.size.toLong,
          s"trial=$trial rec=$rec bytes=${bytes.mkString(",")}")
        // every chunk read via its seek offset yields exactly its lines
        val got = layout.chunkStartBytes.zipWithIndex.flatMap { case (off, k) =>
          val nLines = math.min(rec.toLong, layout.lines - k.toLong * rec)
          val r = new ChunkReader(
            ChunkPartition(f.toString, off, nLines, 0L, k), Array("value"))
          try Iterator.continually(r)
            .takeWhile(_.next()).map(_.get().getString(0)).toList
          finally r.close()
        }.toList
        assert(got == expected, s"trial=$trial rec=$rec")
      }
      Files.delete(f); Files.delete(d)
    }
  }
}
