package graft.queries

import graft.QueryDef
import graft.operators.Multimodal
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** q81 registration projects the Array[Float] feature vector to scalars
    * (dim + md5 of its JSON form): the driver's pandas row sorter cannot
    * hash array cells. The typed `Dataset[MediaFeatures]` API keeps the
    * full vector; `MultimodalSpec` tests it directly. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(spark, dir)
      .select(col("doc_id"), col("n_frames"),
        size(col("feature")).cast("long").as("feature_dim"),
        md5(to_json(col("feature"))).as("feature_md5"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q80_media_meta", mediaMeta, Some(
      """SELECT doc_id, 'text/plain' AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(floor((octet_length(encode(text)) + 15) / 16) AS BIGINT) AS n_frames,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_code
        |FROM documents""".stripMargin)),
    QueryDef("q81_media_features", mediaFeatures, None),
    QueryDef("q82_frame_sample",
      (s, d) => Multimodal.sampleFrames(s, d), Some(
        """WITH f AS (
          |  SELECT doc_id, text,
          |    unnest(range(0, (octet_length(encode(text)) + 15) // 16)) AS k
          |  FROM documents)
          |SELECT doc_id, k AS frame_idx,
          |  md5(substring(text, CAST(k * 16 + 1 AS INT), 16)) AS frame_md5
          |FROM f WHERE k % 4 = 0""".stripMargin)),
    QueryDef("q83_media_resize",
      (s, d) => Multimodal.resizeMedia(Multimodal.mediaTable(s, d), 64)
        .toDF().select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("byte_len")), None),
    // The REAL ImageIO path in the driver gate: generated deterministic PNG
    // payloads, decode + feature-extract + bounded resize on executors, with
    // every output column a constant of the construction -> full hash check.
    QueryDef("q84_image_decode",
      (s, _) => Multimodal.imageDecodeCheck(s), Some(Multimodal.imageDecodeCheckSql)),
    QueryDef("q90_stream_tumbling",
      (s, d) => EventStreams.tumblingBatch(s, d), Some(EventStreams.tumblingSql)),
    // Same aggregation executed as a REAL bounded micro-batch streaming run
    // (readStream -> AvailableNow -> foreachBatch parquet -> read back):
    // the driver gate thereby checks MicroBatchExecution output, not just
    // the batch DAG. Same oracle as q90 by construction.
    QueryDef("q97_stream_microbatch",
      (s, d) => EventStreams.tumblingStreamRun(s, d), Some(EventStreams.tumblingSql)),
    // Stateful streaming dedup as a real micro-batch run (append mode —
    // dropDuplicates state store emits each key on first arrival); the
    // emitted key set is exactly the batch DISTINCT.
    QueryDef("q98_stream_dedup",
      (s, d) => EventStreams.dedupStreamRun(s, d),
      Some("SELECT DISTINCT user_id FROM events")),
    QueryDef("q94_stream_sliding",
      (s, d) => EventStreams.slidingBatch(s, d), Some(EventStreams.slidingSql)),
    QueryDef("q95_funnel",
      (s, d) => EventStreams.funnel(s, d), Some(EventStreams.funnelSql)),
    QueryDef("q96_retention",
      (s, d) => EventStreams.retention(s, d), Some(EventStreams.retentionSql)),
    QueryDef("q91_sessionize",
      (s, d) => EventStreams.sessionBatch(s, d), Some(EventStreams.sessionSql)),
    // Session windows as a real micro-batch run: drives the session-window
    // state store (merge/extend on arrival) end-to-end; complete mode on a
    // finite input converges to the batch gaps-and-islands session set.
    QueryDef("q106_stream_session",
      (s, d) => EventStreams.sessionStreamRun(s, d),
      Some(EventStreams.sessionStreamSql)),
    // Stream-stream interval self-join as a real micro-batch run: the
    // symmetric hash join's per-side state stores, driven end-to-end;
    // inner-join emission is eager, so the finite run equals the batch join.
    QueryDef("q108_stream_join",
      (s, d) => EventStreams.streamStreamJoinRun(s, d),
      Some(EventStreams.streamStreamSql)),
    // Arbitrary-state streaming (mapGroupsWithState) in UPDATE mode with a
    // last-writer-wins compacting sink read — the final compacted state of
    // a finite run is the batch per-key count.
    QueryDef("q111_stream_state",
      (s, d) => EventStreams.runningCountsStreamRun(s, d),
      Some(EventStreams.runningCountsSql)),
    // HLL sketch buffers held in the streaming state store across
    // micro-batches (the incremental sketch-ingest shape), union-merged
    // and bound-gated batch-side — q145's oracle grades the whole path.
    QueryDef("q148_stream_sketch",
      (s, d) => EventStreams.sketchStreamRun(s, d),
      Some(Scalars.sketchRollupSql)))
}
