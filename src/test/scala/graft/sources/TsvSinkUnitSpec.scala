package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The commit/abort contract at the unit level — the piece the
  * end-to-end SinksSpec round trip cannot isolate: SPECULATIVE
  * EXECUTION, where two attempts of the same partition both run and
  * exactly one may become visible. */
class TsvSinkUnitSpec extends AnyFunSuite {

  private def row(a: String, b: String): InternalRow =
    InternalRow(UTF8String.fromString(a), UTF8String.fromString(b))

  test("two attempts of one partition: the committed winner is the only visible file") {
    val dir = Files.createTempDirectory("tsvu").toString + "/out"
    val factory = TsvWriterFactory(dir, 2)
    // speculative pair: same partitionId, different taskIds
    val w1 = factory.createWriter(0, 1L)
    val w2 = factory.createWriter(0, 2L)
    w1.write(row("winner", "1"))
    w2.write(row("loser", "2"))
    val m1 = w1.commit()
    w2.abort() // the speculation loser is killed; its abort runs
    new TsvBatchWrite(dir, null, truncate = false)
      .commit(Array(m1))
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(files == Seq("part-00000.tsv"), files)
    assert(scala.io.Source.fromFile(s"$dir/part-00000.tsv").getLines().toSeq
      == Seq("winner\t1"))
    assert(!Files.exists(Paths.get(dir, "_temporary")))
  }

  test("job abort deletes every attempt's temp and leaves the target untouched") {
    val dir = Files.createTempDirectory("tsvu2").toString + "/out"
    val factory = TsvWriterFactory(dir, 2)
    val w1 = factory.createWriter(0, 1L)
    val w2 = factory.createWriter(1, 2L)
    w1.write(row("a", "1")); w2.write(row("b", "2"))
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(w1.commit(), w2.commit())
    new TsvBatchWrite(dir, null, truncate = false).abort(msgs)
    val residue = new java.io.File(dir).listFiles()
    assert(residue == null || residue.isEmpty ||
      residue.map(_.getName).toSeq == Seq(), // no part files, no temps
      residue.map(_.getName).toSeq)
    assert(!Files.exists(Paths.get(dir, "_temporary")))
  }
}
