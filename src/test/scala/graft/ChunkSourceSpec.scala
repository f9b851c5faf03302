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

  test("chunk rows flow into the standard aggregation surface") {
    import org.apache.spark.sql.functions._
    // per-chunk counts — the facade's (key, chunk)-grained shape (SURVEY
    // §1.3.3) expressed over the connector's chunk_id column
    val perChunk = df.groupBy(col("chunk_id")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perChunk == Map(0 -> 2L, 1 -> 2L, 2 -> 1L, 3 -> 2L, 4 -> 2L))
  }
}
