package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The commit/abort contract at the unit level — the pieces the
  * end-to-end SinksSpec round trip cannot isolate: SPECULATIVE EXECUTION
  * (two attempts of one partition, exactly one visible) and a DRIVER
  * CRASH MID-COMMIT (renames done, manifest not yet swapped — the
  * previous committed state must stay visible). */
class TsvSinkUnitSpec extends AnyFunSuite {

  private def row(a: String, b: String): InternalRow =
    InternalRow(UTF8String.fromString(a), UTF8String.fromString(b))

  private def committedLines(dir: String): Seq[String] =
    ChunkTextSource.listFiles(dir).flatMap { p =>
      scala.io.Source.fromFile(p.toFile).getLines().toSeq
    }

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
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq.sorted
    assert(files.count(_.startsWith("part-00000-")) == 1, files)
    assert(files.contains("_SUCCESS"), files)
    assert(committedLines(dir) == Seq("winner\t1"))
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

  test("driver crash between renames and manifest swap leaves job A's state visible") {
    val dir = Files.createTempDirectory("tsvu3").toString + "/out"
    // job A commits normally
    val fa = TsvWriterFactory(dir, 2)
    val wa = fa.createWriter(0, 1L)
    wa.write(row("committed", "A"))
    new TsvBatchWrite(dir, null, truncate = true).commit(Array(wa.commit()))
    assert(committedLines(dir) == Seq("committed\tA"))
    // job B "crashes" after step 1 (temp moved to an attempt-unique final
    // name) but BEFORE the manifest swap: simulate by dropping B's
    // half-committed part file into the directory directly
    Files.write(Paths.get(dir, "part-00000-deadbeef.tsv"),
      "halfway\tB\n".getBytes("UTF-8"))
    // readers still see exactly job A's snapshot
    assert(committedLines(dir) == Seq("committed\tA"))
    // and a later successful commit (job C, truncate) garbage-collects the
    // stray file and swaps the snapshot atomically
    val fc = TsvWriterFactory(dir, 2)
    val wc = fc.createWriter(0, 9L)
    wc.write(row("committed", "C"))
    new TsvBatchWrite(dir, null, truncate = true).commit(Array(wc.commit()))
    assert(committedLines(dir) == Seq("committed\tC"))
    val names = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(!names.contains("part-00000-deadbeef.tsv"), names)
  }

  test("append-mode commit carries the previous manifest's files forward") {
    val dir = Files.createTempDirectory("tsvu4").toString + "/out"
    val f1 = TsvWriterFactory(dir, 2)
    val w1 = f1.createWriter(0, 1L)
    w1.write(row("first", "1"))
    new TsvBatchWrite(dir, null, truncate = false).commit(Array(w1.commit()))
    val f2 = TsvWriterFactory(dir, 2)
    val w2 = f2.createWriter(0, 2L)
    w2.write(row("second", "2"))
    new TsvBatchWrite(dir, null, truncate = false).commit(Array(w2.commit()))
    assert(committedLines(dir).sorted == Seq("first\t1", "second\t2"))
  }

  test("append into a committed-but-unmanifested dir keeps the existing data") {
    // A directory written by a plain Hadoop-style committer: part files
    // present, _SUCCESS an EMPTY marker (or absent). Append must seed the
    // carry-over from the files on disk — not GC them as unreferenced.
    for (marker <- Seq(false, true)) {
      val dir = Files.createTempDirectory("tsvu6").toString + "/out"
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, "part-00000-legacy.tsv"),
        "legacy\tX\n".getBytes("UTF-8"))
      if (marker) Files.write(Paths.get(dir, "_SUCCESS"), Array.empty[Byte])
      val f = TsvWriterFactory(dir, 2)
      val w = f.createWriter(0, 1L)
      w.write(row("appended", "1"))
      new TsvBatchWrite(dir, null, truncate = false).commit(Array(w.commit()))
      assert(committedLines(dir).sorted == Seq("appended\t1", "legacy\tX"),
        s"marker=$marker")
      val names = new java.io.File(dir).listFiles().map(_.getName).toSeq
      assert(names.contains("part-00000-legacy.tsv"), names)
    }
  }

  test("streaming epochs append atomically; a re-delivered epoch is a no-op") {
    val dir = Files.createTempDirectory("tsvu7").toString + "/out"
    val sw = new TsvStreamingWrite(dir, null)
    val f = TsvWriterFactory(dir, 2)
    def epochCommit(epoch: Long, k: String, v: String): Unit = {
      val w = f.createWriter(0, epoch * 10, epoch)
      w.write(row(k, v))
      sw.commit(epoch, Array(w.commit()))
    }
    epochCommit(0, "epoch0", "a")
    epochCommit(1, "epoch1", "b")
    assert(committedLines(dir).sorted == Seq("epoch0\ta", "epoch1\tb"))
    // RE-DELIVERY of epoch 1 (recovery replays the batch after a crash
    // post-commit): the ledger already records it — the duplicate attempt's
    // rows must NOT appear, and its temp must be cleaned up
    val wDup = f.createWriter(0, 99L, 1L)
    wDup.write(row("epoch1", "duplicate"))
    sw.commit(1L, Array(wDup.commit()))
    assert(committedLines(dir).sorted == Seq("epoch0\ta", "epoch1\tb"))
    assert(!Files.exists(Paths.get(dir, "_temporary")))
    // the ledger itself is invisible to readers but present in the manifest
    val manifest = TsvCommitProtocol.readManifest(Paths.get(dir, "_SUCCESS"))
    assert(manifest.epochs == Set(0L, 1L), manifest)
  }

  test("crash mid-epoch: unswapped files invisible, recovery commits exactly once") {
    val dir = Files.createTempDirectory("tsvu8").toString + "/out"
    val sw = new TsvStreamingWrite(dir, null)
    val f = TsvWriterFactory(dir, 2)
    val w0 = f.createWriter(0, 1L, 0L)
    w0.write(row("epoch0", "a"))
    sw.commit(0L, Array(w0.commit()))
    // epoch 1 CRASHES between the task-file renames and the manifest swap:
    // simulate the half-committed state by dropping an epoch-tagged part
    // file in directly (what step 1 of the commit leaves behind)
    Files.write(Paths.get(dir, "part-00000-e1-deadbeef.tsv"),
      "epoch1\tcrashed-attempt\n".getBytes("UTF-8"))
    // readers see only the committed snapshot — the crashed attempt's file
    // is unreferenced by the manifest
    assert(committedLines(dir) == Seq("epoch0\ta"))
    // recovery RE-DELIVERS epoch 1 (not in the ledger -> it commits), and
    // the commit's GC removes the crashed attempt's unreferenced file
    val w1 = f.createWriter(0, 2L, 1L)
    w1.write(row("epoch1", "recovered"))
    sw.commit(1L, Array(w1.commit()))
    assert(committedLines(dir).sorted == Seq("epoch0\ta", "epoch1\trecovered"))
    val names = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(!names.contains("part-00000-e1-deadbeef.tsv"), names)
    assert(TsvCommitProtocol.readManifest(Paths.get(dir, "_SUCCESS")).epochs
      == Set(0L, 1L))
  }

  test("streaming abort drops the epoch's temps and leaves the snapshot intact") {
    val dir = Files.createTempDirectory("tsvu9").toString + "/out"
    val sw = new TsvStreamingWrite(dir, null)
    val f = TsvWriterFactory(dir, 2)
    val w0 = f.createWriter(0, 1L, 0L)
    w0.write(row("epoch0", "a"))
    sw.commit(0L, Array(w0.commit()))
    val wBad = f.createWriter(0, 2L, 1L)
    wBad.write(row("epoch1", "failed"))
    sw.abort(1L, Array(wBad.commit()))
    assert(committedLines(dir) == Seq("epoch0\ta"))
    assert(!Files.exists(Paths.get(dir, "_temporary")))
  }

  test("escape/unescape round-trips hostile values and is identity on clean ones") {
    val hostile = Seq("a\tb", "line1\nline2", "cr\rhere", "back\\slash",
      "\\t literal", "mix\\\t\n\r", "", "plain")
    hostile.foreach { s =>
      assert(TsvEscape.unescape(TsvEscape.escape(s)) == s, s"round trip of $s")
      assert(!TsvEscape.escape(s).exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"escaped form of $s must be tab/newline-free")
    }
    assert(TsvEscape.escape("clean value") == "clean value")
  }

  test("a written row with tabs and newlines in values re-reads to the original") {
    val dir = Files.createTempDirectory("tsvu5").toString + "/out"
    val f = TsvWriterFactory(dir, 2)
    val w = f.createWriter(0, 1L)
    w.write(row("key with\ttab", "value\nwith newline"))
    new TsvBatchWrite(dir, null, truncate = false).commit(Array(w.commit()))
    val lines = committedLines(dir)
    assert(lines.size == 1, lines) // newline in a value must NOT split rows
    val fields = lines.head.split('\t') // tab in a value must NOT split fields
    assert(fields.length == 2, fields.toSeq)
    assert(fields.map(TsvEscape.unescape).toSeq ==
      Seq("key with\ttab", "value\nwith newline"))
  }
}
