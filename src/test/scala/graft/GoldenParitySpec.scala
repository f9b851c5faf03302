package graft

import graft.operators.MRJob
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture parity with the reference's shipped inputs.
  *
  * The reference's only "tests" are WordCount/WordLength runs over
  * `inputdir/` (two single-token-per-line files), `inputdir2/wordlengthtest`
  * and `inputdir3/small.txt` (project_report.pdf p.6). Those input files are
  * replicated byte-for-byte under `src/test/resources/reference-fixtures/`,
  * and the goldens were computed with the reference's exact semantics:
  *
  *  - tokenization = Java `StringTokenizer` defaults (split on any run of
  *    space/tab/newline/CR/FF) — `wordcount-src/WordCount.java:13-21`,
  *    `wordlength-src/WordLength.java:13-26`;
  *  - WordCount: per-token count, integer sum merge across chunks
  *    (`WordCount.java:25-35`, merge per `framework-src/ReduceRunner.java:
  *    154-172` + `IntWritable.add`);
  *  - WordLength: key = token length, value = number of tokens of that
  *    length (`WordLength.java:28-41`).
  */
private[graft] object GoldenParitySpec {
  /** StringTokenizer-equivalent tokenization (kept outside the suite so
    * closures don't capture the non-serializable scalatest engine). */
  def toks(line: String): Iterator[String] =
    line.split("[ \t\n\r\f]+").iterator.filter(_.nonEmpty)
}

class GoldenParitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def fixture(name: String): String = {
    val url = getClass.getResource(s"/reference-fixtures/$name")
    assert(url != null, s"missing fixture $name")
    url.getPath
  }

  private def golden(name: String): Map[String, Long] =
    scala.io.Source.fromInputStream(
        getClass.getResourceAsStream(s"/reference-fixtures/golden/$name.tsv"))
      .getLines().filter(_.nonEmpty)
      .map { l => val Array(k, v) = l.split("\t"); k -> v.toLong }.toMap

  import GoldenParitySpec.toks

  private def wordCount(dir: String): Map[String, Long] =
    MRJob.textDir(spark, dir)
      .mapToPairs(l => toks(l).map(_ -> 1L))
      .reduceByKey(_ + _)
      .pairs.collect().toMap

  private def wordLength(dir: String): Map[String, Long] =
    MRJob.textDir(spark, dir)
      .mapToPairs(l => toks(l).map(t => t.length.toLong -> 1L))
      .reduceByKey(_ + _)
      .pairs.collect().map { case (k, v) => k.toString -> v }.toMap

  test("WordCount over inputdir matches the reference golden") {
    assert(wordCount(fixture("inputdir")) == golden("wordcount-inputdir"))
  }

  test("WordCount over inputdir3/small.txt matches the reference golden") {
    assert(wordCount(fixture("inputdir3")) == golden("wordcount-inputdir3"))
  }

  test("WordLength over inputdir2/wordlengthtest matches the reference golden") {
    assert(wordLength(fixture("inputdir2")) == golden("wordlength-inputdir2"))
  }

  test("WordLength over inputdir3 matches the reference golden") {
    assert(wordLength(fixture("inputdir3")) == golden("wordlength-inputdir3"))
  }

  test("golden counts are chunk-distribution invariant (sum merge)") {
    // The reference merges per-chunk reducer outputs with IntWritable.add;
    // re-running with different reducer counts must not change results.
    val dir = fixture("inputdir3")
    val runs = Seq(1, 3, 8).map { n =>
      MRJob.textDir(spark, dir)
        .mapToPairs(l => toks(l).map(_ -> 1L))
        .partitionBy(n)
        .reduceByKey(_ + _)
        .pairs.collect().toMap
    }
    assert(runs.distinct.size == 1)
    assert(runs.head == golden("wordcount-inputdir3"))
  }
}
