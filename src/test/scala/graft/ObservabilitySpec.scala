package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability: `observe` attaches metric aggregates to a plan
  * so every run reports row counts / quality tallies with ZERO extra passes
  * — at 100 TB a separate count() for monitoring doubles the scan cost, an
  * observation is free. */
class ObservabilitySpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("observe reports pipeline metrics without a second scan") {
    val obs = Observation("gate_metrics")
    val gated = Tables(spark, sf, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .observe(obs,
        count(lit(1)).as("rows_in"),
        count_if(col("n_tokens").between(20, 200)).as("rows_kept"),
        sum(col("n_tokens")).as("tokens_in"))
      .where(col("n_tokens").between(20, 200))
    val kept = gated.count()
    val m = obs.get
    assert(m("rows_kept") == kept)
    assert(m("rows_in").asInstanceOf[Long] >= kept)
    assert(m("tokens_in").asInstanceOf[Long] > 0)
  }
}
