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
}
