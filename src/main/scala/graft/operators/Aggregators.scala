package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom monoid aggregators — the reference's `AddInterface.add` merge
  * model (`framework-src/AddInterface.java:10-12`) as first-class Spark
  * `Aggregator`s: partial aggregation per partition (the reference's
  * per-chunk reduce, `ReduceRunner.java:78-110`) + `merge` across
  * partitions (its "mini-reduce" add-merge, `ReduceRunner.java:154-172`).
  */
object Aggregators {

  /** The reference's `Text.add` string-concat merge (`Text.java:29-32`)
    * in the deterministic sorted form (SURVEY.md §7.5): concat order under
    * parallelism is nondeterministic, so values are sorted at `finish` —
    * the buffer stays a cheap unordered list through reduce/merge. */
  object SortedConcat extends Aggregator[String, Seq[String], String] {
    override def zero: Seq[String] = Vector.empty
    override def reduce(b: Seq[String], a: String): Seq[String] = b :+ a
    override def merge(x: Seq[String], y: Seq[String]): Seq[String] = x ++ y
    override def finish(b: Seq[String]): String = b.sorted.mkString(",")
    override def bufferEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
