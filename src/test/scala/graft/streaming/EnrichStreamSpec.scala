package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class EnrichStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def dimV(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
    rows.toDF("user_id", "segment")

  test("enriched: broadcast left join keeps unmatched events with an audit flag") {
    val events = Seq((1L, 10L, "click"), (2L, 20L, "view"), (3L, 99L, "click"))
      .toDF("event_id", "user_id", "event_type")
    val out = EventStreams.enriched(events, dimV(10L -> "gold", 20L -> "trial"), "user_id")
      .select($"event_id", $"segment", $"dim_matched")
      .as[(Long, Option[String], Boolean)].collect().toSet
    assert(out === Set((1L, Some("gold"), true), (2L, Some("trial"), true), (3L, None, false)))
  }

  test("enriched: a matched dim row whose attribute is NULL still reads matched") {
    val events = Seq((1L, 10L), (2L, 99L)).toDF("event_id", "user_id")
    val dim = Seq((10L, Option.empty[String])).toDF("user_id", "segment")
    val out = EventStreams.enriched(events, dim, "user_id")
      .select($"event_id", $"segment", $"dim_matched")
      .as[(Long, Option[String], Boolean)].collect().toSet
    assert(out === Set((1L, None, true), (2L, None, false)),
      "dim_matched must come from row presence, not attribute null-ness")
  }

  test("enriched: a dimension with only the key column is rejected loudly") {
    val events = Seq((1L, 10L)).toDF("event_id", "user_id")
    intercept[IllegalArgumentException] {
      EventStreams.enriched(events, Seq(Tuple1(10L)).toDF("user_id"), "user_id")
    }
  }

  test("enrichStream picks up a mid-stream dimension refresh without restart") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("enrich").toString
    val dimPath = s"$dir/dim"
    val outDir = s"$dir/out"
    dimV(10L -> "gold", 20L -> "trial").write.mode("overwrite").parquet(dimPath)

    val mem = MemoryStream[(Long, Long, String)]
    val q = EventStreams.enrichStream(
        mem.toDF.toDF("event_id", "user_id", "event_type"), dimPath, "user_id", outDir)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((1L, 10L, "click"), (2L, 99L, "view"))
      q.processAllAvailable()
      // dimension refreshed by an independent job mid-stream: 99 appears,
      // 10 changes segment
      dimV(10L -> "platinum", 99L -> "new").write.mode("overwrite").parquet(dimPath)
      mem.addData((3L, 10L, "click"), (4L, 99L, "view"), (5L, 20L, "click"))
      q.processAllAvailable()

      val out = spark.read.parquet(outDir)
        .select($"event_id", $"segment", $"dim_matched", $"batch_id")
        .as[(Long, Option[String], Boolean, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(out(1L) === ((Some("gold"), true, 0L)))
      assert(out(2L) === ((None, false, 0L)), "unmatched event must survive batch 1")
      assert(out(3L) === ((Some("platinum"), true, 1L)), "batch 2 must see the refreshed dim")
      assert(out(4L) === ((Some("new"), true, 1L)), "newly-added dim row must match in batch 2")
      assert(out(5L) === ((None, false, 1L)), "removed dim row must stop matching")
    } finally q.stop()
  }
}
