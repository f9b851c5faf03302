package graft.queries

import graft.QueryDef
import graft.operators.Multimodal
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal + streaming query registrations.
  *
  * The streaming queries are registered through their batch equivalents
  * (identical aggregation semantics on a finite input; the `readStream`
  * forms are exercised by the scalatest suite).
  */
object Extensions {

  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaMeta(spark, dir)

  /** q81 registration explodes the Array[Float] feature vector to one row
    * per frame (the driver's pandas row sorter cannot hash array cells;
    * the typed `Dataset[MediaFeatures]` API keeps the full vector —
    * `MultimodalSpec` tests it directly). On the ASCII text payloads of
    * `documents` the byte-path feature is the per-frame mean byte value,
    * a FLOAT whose division the oracle reproduces bit-exactly (DuckDB
    * FLOAT/FLOAT is the same IEEE-754 single division), so the frame
    * means hash-compare exactly — the mapPartitions operator output is
    * fully oracle-graded, not rows-only. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(spark, dir)
      .select(col("doc_id"), col("n_frames"),
        posexplode(col("feature")).as(Seq("frame_idx", "mean_byte")))
      .select(col("doc_id"), col("n_frames"),
        col("frame_idx").cast("int").as("frame_idx"), col("mean_byte"))

  /** DuckDB twin of the byte-path feature extraction: 16-byte frames, up
    * to 8, mean byte value per frame in single-precision. `documents.text`
    * is ASCII (pinned by `n_frames` re-derivation from octet_length), so
    * `ord` per char IS the byte value. */
  private val mediaFeaturesSql =
    """WITH d AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS blen,
      |    CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, n_frames, blen, text,
      |    unnest(range(0, least(n_frames, 8))) AS k FROM d)
      |SELECT doc_id, n_frames, CAST(k AS INT) AS frame_idx,
      |  CAST(list_sum(list_transform(
      |      range(1, CAST(least(16, blen - k * 16) AS BIGINT) + 1),
      |      i -> ord(substr(text, CAST(k * 16 + i AS INT), 1)))) AS FLOAT)
      |    / CAST(least(16, blen - k * 16) AS FLOAT) AS mean_byte
      |FROM f""".stripMargin

  /** q83 registration: the resize operator's OUTPUT BYTES are graded, not
    * just their length — md5 of the resampled blob, which the oracle
    * recomputes by the same nearest-neighbor index arithmetic
    * (`src[(i*len)/target]`, exact integer division in both engines). */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeMedia(Multimodal.mediaTable(spark, dir), 64).toDF()
      .select(col("doc_id"), col("byte_len"),
        md5(col("blob")).as("blob_md5"), col("media_type"))

  private val mediaResizeSql =
    """WITH d AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents)
      |SELECT doc_id, CAST(least(len, 64) AS BIGINT) AS byte_len,
      |  md5(CASE WHEN len <= 64 THEN text
      |    ELSE array_to_string(list_transform(range(0, 64),
      |      i -> substr(text, CAST((i * len) // 64 AS INT) + 1, 1)), '')
      |    END) AS blob_md5,
      |  'text/plain' AS media_type
      |FROM d""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q80_media_meta", mediaMeta, Some(
      """SELECT doc_id, 'text/plain' AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(floor((octet_length(encode(text)) + 15) / 16) AS BIGINT) AS n_frames,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_code
        |FROM documents""".stripMargin)),
    QueryDef("q81_media_features", mediaFeatures, Some(mediaFeaturesSql)),
    QueryDef("q82_frame_sample",
      (s, d) => Multimodal.sampleFrames(s, d), Some(
        """WITH f AS (
          |  SELECT doc_id, text,
          |    unnest(range(0, (octet_length(encode(text)) + 15) // 16)) AS k
          |  FROM documents)
          |SELECT doc_id, k AS frame_idx,
          |  md5(substring(text, CAST(k * 16 + 1 AS INT), 16)) AS frame_md5
          |FROM f WHERE k % 4 = 0""".stripMargin)),
    QueryDef("q83_media_resize", mediaResize, Some(mediaResizeSql)),
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
      Some(Scalars.sketchRollupSql)),
    // q190's decayed-count monitor as a real micro-batch run: daily counts
    // accumulate in the streaming agg state store, the shared power-of-two
    // decay arithmetic runs on the final state — graded by q190's oracle.
    QueryDef("q191_stream_decayed",
      (s, d) => EventStreams.decayedCountsStreamRun(s, d),
      Some(TimeSeries.decayedCountsSql)),
    QueryDef("q253_stream_benford",
      (s, d) => EventStreams.benfordStreamRun(s, d),
      Some(Quality.benfordSqlFor("value", "events"))),
    // q280's replica-drift audit as a CONTINUOUS monitor: per-bucket
    // (count, sum-of-row-hash) summaries accumulate in the streaming agg
    // state store (256 rows — checksum addition commutes, so arrival
    // order can't matter); same shared hash helper as the batch audit,
    // graded by the batch base-side summary oracle.
    QueryDef("q286_stream_drift",
      (s, d) => EventStreams.driftStreamRun(s, d),
      Some(Temporal.driftBaseSummarySql)),
    // Event-time-timeout state EVICTION (flatMapGroupsWithState) as a real
    // micro-batch run: a staged watermark-flush sentinel closes every real
    // session, so the emitted set equals batch gaps-and-islands
    // sessionization — the timeout/eviction lifecycle is hash-graded.
    QueryDef("q163_idle_session_evict",
      (s, d) => EventStreams.idleSessionStreamRun(s, d),
      Some(EventStreams.idleSessionSql)),
    // transformWithState (Spark 4's typed-state-variable API) on the
    // RocksDB provider: ValueState + MapState per user, update-mode with
    // batchId compaction; final state = batch GROUP BY (user, type).
    QueryDef("q164_typed_state",
      (s, d) => EventStreams.typedStateCountsRun(s, d),
      Some(EventStreams.typedStateSql)),
    // transformWithState EVENT-TIME TIMERS (the API half q164 doesn't
    // touch): q163's idle-session eviction re-expressed with
    // registerTimer/deleteTimer + handleExpiredTimer; same oracle as q163
    // hash-grades the whole timer lifecycle.
    QueryDef("q173_tws_timers",
      (s, d) => EventStreams.timerSessionStreamRun(s, d),
      Some(EventStreams.idleSessionSql)),
    // transformWithState ListState (the third typed state variable):
    // bounded last-k event buffer per user — O(k) state per entity on an
    // unbounded stream; oracle = batch top-k-recent per user.
    QueryDef("q174_list_state_lastk",
      (s, d) => EventStreams.lastKStreamRun(s, d),
      Some(EventStreams.lastKSql)),
    // q195's count-min sketch as a streaming ingest: the counter matrix
    // keyed by (row, cell) lives distributed in the streaming agg state
    // store; the finite run's final state must reproduce the batch
    // sketch bit-for-bit — q195's identical oracle grades it.
    QueryDef("q196_stream_cms",
      (s, d) => EventStreams.cmsStreamRun(s, d),
      Some(TextAnalysis.cmsFrequenciesSql)),
    // the theta member of the streaming-sketch family: per-week theta
    // buffers in the streaming agg state store, graded by q207's
    // exact-companion churn oracle on the final state.
    QueryDef("q212_stream_theta",
      (s, d) => EventStreams.thetaChurnStreamRun(s, d),
      Some(Scalars.thetaChurnOracleSql)))
}
