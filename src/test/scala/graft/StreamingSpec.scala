package graft

import graft.streaming.EventStreams
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The `readStream` forms must agree with their batch equivalents on a
  * finite input (same aggregation semantics, complete output mode). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  /** FileStreamSource wants a directory of files — stage the events table
    * the way a production stream would land it. */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"), d.resolve("events.parquet"))
    d.toString
  }

  private def runToMemory(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming tumbling window agg matches batch") {
    val streamed = runToMemory(EventStreams.tumblingStream(spark, eventsDir), "tumb")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.tumblingBatch(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("mapGroupsWithState running counts match batch groupBy count") {
    val q = EventStreams.runningUserCounts(spark, eventsDir)
      .writeStream.format("memory").queryName("ruc")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ruc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables(spark, sf, "events")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming sessionization produces the same session count as batch") {
    val streamed = runToMemory(EventStreams.sessionStream(spark, eventsDir), "sess")
    // Same number of (user, session) rows and same total event count; the
    // batch form reports ordinal ids instead of window bounds, so compare
    // the session partitioning, not the id columns.
    val batch = EventStreams.sessionBatch(spark, sf)
    assert(streamed.count() == batch.count())
    val sTotal = streamed.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    val bTotal = batch.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    assert(sTotal == bTotal && sTotal > 0)
  }
}
