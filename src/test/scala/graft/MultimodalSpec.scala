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

  test("byte-path resize bounds payload size and is a no-op under the target") {
    val resized = Multimodal.resizeMedia(Multimodal.mediaTable(spark, sf), 64)
      .collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.blob.length <= 64))
    assert(resized.forall(r => r.byte_len == r.blob.length))
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeMedia(Multimodal.mediaTable(spark, sf), 64)
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

  // -- real image decode (javax.imageio) ----------------------------------

  /** 64x32 deterministic gradient: R = x*4, G = y*8, B = (x+y) mod 256. */
  private def gradientImage(w: Int = 64, h: Int = 32): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 4) << 16) | ((y * 8) << 8) | ((x + y) % 256))
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def pixelHash(img: java.awt.image.BufferedImage): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      md.update(Array[Byte]((p >> 16).toByte, (p >> 8).toByte, p.toByte))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def mediaDs(blobs: Seq[(Long, Array[Byte])]) =
    blobs.map { case (id, b) =>
      MediaRecord(id, "image", b, b.length.toLong) }.toDS()

  test("PNG and BMP payloads are really decoded; features = exact band luminance") {
    val img = gradientImage()
    // Expected band means from the same pixel definition, independent math:
    // luma(x,y) = .299*(x*4) + .587*(y*8) + .114*((x+y)%256); 32 rows in
    // 8 bands of 4 rows; mean over x of x*4 terms and (x+y)%256 exact since
    // x*4 <= 252, x+y <= 94 < 256 (no wraparound in this image).
    val expected = (0 until 8).map { b =>
      val rows = (b * 4) until ((b + 1) * 4)
      val vals = for (y <- rows; x <- 0 until 64)
        yield 0.299f * (x * 4) + 0.587f * (y * 8) + 0.114f * ((x + y) % 256)
      (vals.map(_.toDouble).sum / vals.size).toFloat
    }
    for (fmt <- Seq("png", "bmp")) {
      val feats = Multimodal.extractFeatures(
          mediaDs(Seq(1L -> encode(img, fmt))), maxFrames = 8)
        .collect().head
      assert(feats.n_frames == 8, fmt)
      // PNG/BMP are lossless: decoded pixels are the gradient exactly, so
      // band means match the independent computation to float tolerance.
      feats.feature.zip(expected).foreach { case (got, want) =>
        assert(math.abs(got - want) < 0.01f, s"$fmt: $got vs $want")
      }
    }
  }

  test("non-image payloads keep the deterministic byte path") {
    val feats = Multimodal.extractFeatures(
        mediaDs(Seq(1L -> Array.fill[Byte](40)(7))), stride = 16, maxFrames = 8)
      .collect().head
    assert(feats.n_frames == 3 && feats.feature.forall(_ == 7.0f))
  }

  test("image resize is true nearest-neighbor with golden pixel hash") {
    val img = gradientImage() // 64x32 = 2048 px > 341 px target
    val resized = Multimodal.resizeMedia(
        mediaDs(Seq(1L -> encode(img, "png"))), targetBytes = 1024)
      .collect().head
    // target 1024 bytes / 3 -> scale sqrt(1024/(3*2048)) = 0.408: 26x13
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.blob))
    assert(out.getWidth == 26 && out.getHeight == 13)
    // nearest-neighbor: out(x,y) == in(x*64/26, y*32/13), spot-checked
    for ((x, y) <- Seq((0, 0), (13, 6), (25, 12)))
      assert(out.getRGB(x, y) == img.getRGB(x * 64 / 26, y * 32 / 13))
    // PNG round-trips pixels losslessly -> the pixel hash is golden across
    // JVMs (the ENCODED bytes may differ by encoder; the pixels may not)
    assert(pixelHash(out) == pixelHash(
      Multimodal.resizeImage(img, 26, 13)))
    // determinism across runs
    val again = Multimodal.resizeMedia(
        mediaDs(Seq(1L -> encode(img, "png"))), targetBytes = 1024)
      .collect().head
    assert(java.util.Arrays.equals(resized.blob, again.blob))
  }

  test("resize flags truncated image payloads instead of masking them") {
    val img = gradientImage()
    // A target below any decodable PNG's container overhead forces the
    // byte-truncation fallback: the bound holds AND the record says so.
    val truncated = Multimodal.resizeMedia(
        mediaDs(Seq(1L -> encode(img, "png"))), targetBytes = 64)
      .collect().head
    assert(truncated.blob.length <= 64)
    assert(truncated.media_type == "application/octet-stream")
    // A comfortable target yields a decodable PNG and declares it.
    val ok = Multimodal.resizeMedia(
        mediaDs(Seq(1L -> encode(img, "png"))), targetBytes = 1024)
      .collect().head
    assert(ok.media_type == "image/png")
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ok.blob)) != null)
    // Non-image payloads keep their declared type: they were never
    // decodable, so truncation does not change what the type promises.
    val bytes = Multimodal.resizeMedia(
        mediaDs(Seq(2L -> Array.fill[Byte](200)(3))), targetBytes = 64)
      .collect().head
    assert(bytes.blob.length <= 64 && bytes.media_type == "image")
  }

  test("feature extraction preserves rows and bounds frame count") {
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf), stride = 16, maxFrames = 8)
    val n = Tables(spark, sf, "documents").count()
    assert(feats.count() == n)
    assert(feats.filter(f => f.feature.length > 8).count() == 0)
  }
}
