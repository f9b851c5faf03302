package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batched per-partition
  * decode / frame-sample / feature-extract.
  *
  * The Spark-side shape is real and tested: schema (binary + struct
  * metadata), partition-preserving batched processing via `mapPartitions`
  * (the JVM analogue of `mapInPandas` — one iterator per partition, so a
  * real decoder amortizes codec init per partition, not per row), and
  * columnar-friendly fixed-size feature output.
  *
  * The decode step itself is a clearly-marked DETERMINISTIC STUB — this
  * container has no image/audio codecs. `decodeStub` stands in for
  * "decode media, sample frames, embed each frame": it frame-samples the
  * byte stream at a fixed stride and emits one scalar per frame window,
  * which exercises exactly the data movement a real decoder would.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      blob: Array[Byte],
      byte_len: Long)

  final case class MediaFeatures(
      doc_id: Long,
      n_frames: Long,
      feature: Array[Float])

  /** Stand-in media table: documents' text bytes as the opaque payload.
    * (A real pipeline reads `binaryFile` sources or parquet binary columns —
    * same schema, same plan.) */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("blob"),
        octet_length(col("text")).cast("long").as("byte_len"))
      .as[MediaRecord]
  }

  /** STUB decode+embed: deterministic fake of a codec. Frame = `stride`
    * bytes; per-frame "embedding" = mean byte value. Batched per partition
    * like a real decoder would be. */
  def extractFeatures(ds: Dataset[MediaRecord], stride: Int = 16,
      maxFrames: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { records =>
      // real impl: initialize codec once per partition here
      records.map { r =>
        val frames = r.blob.grouped(stride).toArray
        val feat = frames.take(maxFrames)
          .map(f => f.map(_.toInt & 0xff).sum.toFloat / f.length)
        MediaFeatures(r.doc_id, frames.length.toLong, feat)
      }
    }
  }

  /** STUB resize: nearest-neighbor downsample of the payload to
    * `targetBytes` (stand-in for image resize — same contract: bounded
    * output size, deterministic, per-record, batched per partition).
    * Payloads already under the target pass through untouched. */
  def resizeStub(ds: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { records =>
      records.map { r =>
        val src = r.blob
        val out =
          if (src.length <= targetBytes) src
          else Array.tabulate(targetBytes)(i =>
            src((i.toLong * src.length / targetBytes).toInt))
        r.copy(blob = out, byte_len = out.length.toLong)
      }
    }
  }

  /** Frame sampling as a row-multiplying column op (the video shape: one
    * input row -> one row per sampled frame). Pure built-ins — the frame
    * slicing is `substring` on the binary column inside codegen, so this
    * stays SQL-expressible and oracle-checked, unlike the decode stub. */
  def sampleFrames(spark: SparkSession, dir: String, stride: Int = 16,
      everyNth: Int = 4): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("doc_id"), col("blob"),
        expr("(byte_len + 15) div 16").as("nf"))
      .select(col("doc_id"), col("blob"),
        explode(expr("sequence(0L, nf - 1)")).as("frame_idx"))
      .where(col("frame_idx") % everyNth === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(blob, cast(frame_idx * $stride + 1 as int), $stride)"))
          .as("frame_md5"))

  /** Metadata-only pass (no decode): the always-cheap path — pure column
    * arithmetic on lengths, fully SQL-expressible (oracle-checked). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("doc_id"), col("media_type"), col("byte_len"),
        ((col("byte_len") + 15) / 16).cast("long").as("n_frames"),
        ascii(substring(col("blob").cast("string"), 1, 1)).cast("long").as("first_code"))

  /** Feature extraction as a DataFrame (for the rows-only query check). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).toDF()
}
