package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the `binaryFile` source (the real ingestion path
  * for media blobs), schema shape, and the batched per-partition
  * feature-extract stub. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  test("binaryFile source feeds the media pipeline") {
    val dir = Files.createTempDirectory("media")
    Files.write(dir.resolve("a.bin"), Array.fill[Byte](40)(7))
    Files.write(dir.resolve("b.bin"), Array.tabulate[Byte](100)(_.toByte))

    val media = spark.read.format("binaryFile").load(dir.toString)
      .select(
        abs(hash(col("path"))).cast("long").as("doc_id"),
        lit("application/octet-stream").as("media_type"),
        col("content").as("blob"),
        col("length").as("byte_len"))
      .as[MediaRecord]

    val feats = Multimodal.extractFeatures(media, stride = 16, maxFrames = 8)
      .collect().sortBy(_.n_frames)
    assert(feats.length == 2)
    assert(feats(0).n_frames == 3)  // 40 bytes / 16-byte frames
    assert(feats(1).n_frames == 7)  // 100 bytes
    assert(feats(0).feature.forall(_ == 7.0f)) // constant payload
  }

  test("resize stub bounds payload size and is a no-op under the target") {
    val resized = Multimodal.resizeStub(Multimodal.mediaTable(spark, sf), 64)
      .collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.blob.length <= 64))
    assert(resized.forall(r => r.byte_len == r.blob.length))
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeStub(Multimodal.mediaTable(spark, sf), 64)
      .collect()
    assert(resized.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => java.util.Arrays.equals(a.blob, b.blob) })
  }

  test("frame sampling emits every 4th frame with correct count") {
    val frames = Multimodal.sampleFrames(spark, sf)
    val perDoc = frames.groupBy("doc_id").count()
    val expected = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        expr("((octet_length(text) + 15) div 16 + 3) div 4").as("want"))
    val joined = perDoc.join(expected, "doc_id")
      .where(col("count") =!= col("want"))
    assert(joined.count() == 0)
  }

  test("feature extraction preserves rows and bounds frame count") {
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf), stride = 16, maxFrames = 8)
    val n = Tables(spark, sf, "documents").count()
    assert(feats.count() == n)
    assert(feats.filter(f => f.feature.length > 8).count() == 0)
  }
}
