package graft.queries

import graft.QueryDef
import graft.operators.Multimodal
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal + streaming query registrations.
  *
  * `q81_media_features` deliberately has NO oracle: its per-partition
  * batched decode stub (`Multimodal.extractFeatures`) is the one op in the
  * engine SQL can't express — the driver records a rows-only check for it.
  * The streaming queries are registered through their batch equivalents
  * (identical aggregation semantics on a finite input; the `readStream`
  * forms are exercised by the scalatest suite).
  */
object Extensions {

  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaMeta(spark, dir)

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(spark, dir)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q80_media_meta", mediaMeta, Some(
      """SELECT doc_id, 'text/plain' AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(floor((octet_length(encode(text)) + 15) / 16) AS BIGINT) AS n_frames,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_code
        |FROM documents""".stripMargin)),
    QueryDef("q81_media_features", mediaFeatures, None),
    QueryDef("q90_stream_tumbling",
      (s, d) => EventStreams.tumblingBatch(s, d), Some(EventStreams.tumblingSql)),
    QueryDef("q91_sessionize",
      (s, d) => EventStreams.sessionBatch(s, d), Some(EventStreams.sessionSql)))
}
