package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "imgdata-aaaaaaaaaaaaaaaa".getBytes("UTF-8"), "image/png"),
    (2L, "x".getBytes("UTF-8"), "image/jpeg"),
    (3L, ("v" * 100).getBytes("UTF-8"), "video/mp4"),
  ).toDF("media_id", "media", "mime")

  test("withImageMeta attaches a typed struct, deterministic across runs") {
    val out = Multimodal.withImageMeta(media, "media")
    assert(out.schema("image_meta").dataType == Multimodal.imageMetaType)
    val metas = out.select($"media_id", $"image_meta.width", $"image_meta.height",
                           $"image_meta.channels", $"image_meta.size_bytes")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(_._1)
    val again = Multimodal.withImageMeta(media, "media")
      .select($"media_id", $"image_meta.width", $"image_meta.height",
              $"image_meta.channels", $"image_meta.size_bytes")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(_._1)
    assert(metas.toSeq == again.toSeq)
    assert(metas.forall { case (_, w, h, c, sz) => w >= 64 && h >= 64 && c == 3 && sz > 0 })
    assert(metas.find(_._1 == 1L).get._5 == 24L)   // size_bytes = payload length
  }

  test("metadata-only queries prune the binary column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select($"media_id", $"mime")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("media:binary"), s"binary column not pruned:\n$plan")
  }

  test("resized replaces payload, keeps provenance") {
    val out = Multimodal.resized(media, "media", 64, 64)
    assert(out.columns.contains("thumb") && out.columns.contains("media_id"))
    val sizes = out.select($"media_id", octet_length($"thumb"))
      .as[(Long, Int)].collect().toMap
    assert(sizes.values.forall(_ > 0))
  }

  test("frameSampled yields n frames per video row, partition-local") {
    val out = Multimodal.frameSampled(media.filter($"mime" === "video/mp4"),
      "media", "media_id", n = 4)
    val frames = out.as[(Long, Int, Array[Byte])].collect()
    assert(frames.length == 4)
    assert(frames.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(frames.forall(_._3.nonEmpty))
  }

  // ---- real codec: javax.imageio over a checked-in fixture ----

  private def fixtureBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/fixtures/gradient_8x5.png")
    try in.readAllBytes() finally in.close()
  }

  test("ImageIoDecoder reads real PNG metadata from the checked-in fixture") {
    val (w, h, c) = Multimodal.ImageIoDecoder.imageMeta(fixtureBytes)
    assert((w, h, c) == (8, 5, 3))
  }

  test("ImageIoDecoder resize re-encodes at the target dimensions") {
    val thumb = Multimodal.ImageIoDecoder.resize(fixtureBytes, 4, 3)
    val (w, h, _) = Multimodal.ImageIoDecoder.imageMeta(thumb)
    assert((w, h) == (4, 3))
    // PNG magic: lossless re-encode, not a raw buffer
    assert((thumb(0) & 0xff) == 0x89 && thumb(1) == 'P'.toByte)
  }

  test("ImageIoDecoder frameSample: single-frame image yields itself once") {
    val frames = Multimodal.ImageIoDecoder.frameSample(fixtureBytes, 3)
    assert(frames.length == 1)
    assert(Multimodal.ImageIoDecoder.imageMeta(frames.head)._1 == 8)
  }

  test("ImageIoDecoder frameSample: animated GIF sampled evenly") {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO}
    // build a 4-frame animated GIF in-memory with the JDK's own writer
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 4).foreach { i =>
      val img = new BufferedImage(6, 6, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(i * 60, 0, 0)); g.fillRect(0, 0, 6, 6) }
      finally g.dispose()
      writer.writeToSequence(new IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bos.toByteArray
    assert(Multimodal.ImageIoDecoder.frameSample(gif, 2).length == 2)
    assert(Multimodal.ImageIoDecoder.frameSample(gif, 8).length == 4)
    val all = Multimodal.ImageIoDecoder.frameSample(gif, 4)
    assert(all.forall(f => Multimodal.ImageIoDecoder.imageMeta(f) == (6, 6, 3)))
  }

  test("FailSoft maps corrupt payloads to sentinels instead of failing the task") {
    val soft = Multimodal.FailSoft(Multimodal.ImageIoDecoder)
    assert(soft.imageMeta("not an image".getBytes) == (-1, -1, -1))
    assert(soft.resize("junk".getBytes, 4, 4).isEmpty)
    assert(soft.frameSample("junk".getBytes, 2).isEmpty)
    assert(soft.imageMeta(fixtureBytes) == (8, 5, 3)) // delegation intact
  }

  test("withImageMeta with FailSoft(ImageIoDecoder): real dims, quarantine-able garbage") {
    val df = Seq((1L, fixtureBytes), (2L, "garbage".getBytes("UTF-8")))
      .toDF("media_id", "media")
    val out = Multimodal.withImageMeta(df, "media",
        decoder = Multimodal.FailSoft(Multimodal.ImageIoDecoder))
      .select($"media_id", $"image_meta.width", $"image_meta.height", $"image_meta.channels")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 8, 5, 3)))
    assert(out(1) == ((2L, -1, -1, -1)))
  }

  // ---- perceptual hashing (the production image-dedup path) ----

  /** Programmatic PNG: pixel (x,y) luma from `f`, so test images are
    * deterministic and self-describing. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dhash64: deterministic, scale-invariant, discriminative") {
    val grad = png(64, 64)((x, _) => x * 4)             // left-to-right ramp
    val gradBig = png(128, 128)((x, _) => x * 2)        // same image, 2x size
    val inverse = png(64, 64)((x, _) => 255 - x * 4)    // reversed ramp
    val h1 = Multimodal.dhash64(grad)
    assert(h1 == Multimodal.dhash64(grad), "hash must be deterministic")
    // dHash normalizes through the 9x8 grid: a rescale of the same
    // picture lands on (nearly) the same hash
    assert(hamming(h1, Multimodal.dhash64(gradBig)) <= 2,
      "rescaled copy must be a near-dup")
    // monotone ramp: every left cell < right cell -> no bits; reversed
    // ramp -> all 64 comparison bits
    assert(h1 == 0L)
    assert(Multimodal.dhash64(inverse) == -1L)          // all 64 bits set
    assert(hamming(h1, Multimodal.dhash64(inverse)) == 64)
  }

  test("withPerceptualHash: real hash per decodable row, null quarantine for garbage") {
    val grad = png(64, 64)((x, y) => x * 2 + y)
    val df = Seq((1L, grad), (2L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "media")
    val out = Multimodal.withPerceptualHash(df, "media")
      .select($"media_id", $"phash64").collect().sortBy(_.getLong(0))
    assert(!out(0).isNullAt(1) && out(0).getLong(1) == Multimodal.dhash64(grad))
    assert(out(1).isNullAt(1), "undecodable payload must quarantine as null")
  }

  test("hashNearDup: rescaled image pairs with its original, unrelated stays clean") {
    // smooth (non-aliasing) diagonal ramp and its half-size rescale;
    // "other" reverses the ramp, flipping every dHash comparison
    val base = png(96, 96)((x, y) => x + y)
    val rescaled = png(48, 48)((x, y) => 2 * (x + y))
    val other = png(96, 96)((x, y) => 255 - (x + y))
    val hashes = Seq(
      (1L, Multimodal.dhash64(base)),
      (2L, Multimodal.dhash64(rescaled)),
      (3L, Multimodal.dhash64(other))).toDF("doc_id", "phash")
    val out = Multimodal.hashNearDup(hashes, "doc_id", "phash",
        bands = 8, bandBits = 8, maxHamming = 6)
      .select($"doc_id", $"dup_of", $"is_dup")
      .collect().sortBy(_.getLong(0))
    assert(!out(0).getBoolean(2), "first copy is the keeper")
    assert(out(1).getBoolean(2) && out(1).getLong(1) == 1L,
      s"rescale must dup to the original (hamming ${hamming(
        Multimodal.dhash64(base), Multimodal.dhash64(rescaled))})")
    assert(!out(2).getBoolean(2), "unrelated image must not pair")
  }

  test("hashNearDup rejects a bandization without the pigeonhole guarantee") {
    val df = Seq((1L, 0L)).toDF("doc_id", "phash")
    intercept[IllegalArgumentException] {
      Multimodal.hashNearDup(df, "doc_id", "phash", bands = 4, bandBits = 14, maxHamming = 4)
    }
  }
}
