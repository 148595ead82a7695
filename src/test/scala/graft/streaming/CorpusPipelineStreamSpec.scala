package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The composed streaming corpus pipeline (gate → near-dup store →
  * line census as ONE foreachBatch pass) over a two-wave MemoryStream:
  * per-stage outcomes land as one decisions row per doc, later waves
  * see earlier waves' store state, and a checkpoint loss replays to
  * bit-identical decisions without growing either store — exactly-once
  * composes stage-wise. */
class CorpusPipelineStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog today again"
  private val textB = "totally new words never stored before anywhere at all today"
  private val textC = "f f\nbrand new unique line content here today"

  test("two waves: gate rejects, dedup against growing store, census scrubs hot lines") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-cps").toString
    val dedupStore = s"$base/dedup"; val censusStore = s"$base/census"
    val out = s"$base/decisions"
    graft.operators.IncrementalDedup.initStore(
      Seq((0L, textA)).toDF("doc_id", "text"), dedupStore)
    // "f f" enters the census at df=2: one more occurrence crosses
    // maxDocFreq=2 and scrubs
    graft.operators.IncrementalLineCensus.initStore(
      Seq((90L, "f f\nx1 y1"), (91L, "f f\nx2 y2")).toDF("doc_id", "text"),
      censusStore, lineTokens = 2)

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.corpusPipelineStream(
      mem.toDF.toDF("doc_id", "text"), dedupStore, censusStore, out,
      threshold = 0.9, minTokens = 5, lineTokens = 2, maxDocFreq = 2)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      mem.addData((10L, textA), (11L, textB), (12L, "hi"))
      q.processAllAvailable()
      mem.addData((20L, textB), (21L, textC))
      q.processAllAvailable()
    } finally q.stop()

    val d = spark.read.parquet(out)
      .select($"doc_id", $"gate_passed", $"dup_of", $"kept", $"n_lines", $"n_kept")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
         r.getBoolean(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
         Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap

    assert(d(12L) == ((false, None, false, None, None)), s"gate-fail leaked: ${d(12L)}")
    assert(d(10L)._2.contains(0L) && !d(10L)._3, "wave-1 dup of the seeded store doc")
    // textB = 10 tokens -> 5 two-token line chunks, all census-fresh
    assert(d(11L) == ((true, None, true, Some(5L), Some(5L))), s"unique survivor: ${d(11L)}")
    assert(d(20L)._2.contains(11L), "wave-2 dup of the doc wave 1 appended")
    // doc 21: survives dedup; its "f f" chunk hits census df 3 >= 2 ->
    // scrubbed, the other 4 chunks kept
    assert(d(21L) == ((true, None, true, Some(5L), Some(4L))), s"census scrub: ${d(21L)}")

    // stores grew by exactly the unique survivors
    assert(spark.read.parquet(dedupStore).select("id").as[Long].collect().toSet ==
      Set(0L, 11L, 21L))
    val census = spark.read.parquet(censusStore).as[(String, Long)].collect().toMap
    assert(census.values.max == 3L, s"'f f' must reach df=3: $census")

    // ---- checkpoint loss: a fresh query re-delivers wave 1 as its
    // batch 0 — markers + replay guards keep decisions identical and
    // stores untouched
    val before = spark.read.parquet(out).drop("jaccard").collect().toSet
    val dedupRows = spark.read.parquet(dedupStore).count()
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.corpusPipelineStream(
      mem2.toDF.toDF("doc_id", "text"), dedupStore, censusStore, out,
      threshold = 0.9, minTokens = 5, lineTokens = 2, maxDocFreq = 2)
      .option("checkpointLocation", s"$base/ckpt2")
      .start()
    try {
      mem2.addData((10L, textA), (11L, textB), (12L, "hi"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(out).drop("jaccard").collect().toSet == before,
      "replay after checkpoint loss must reproduce decisions exactly-once")
    assert(spark.read.parquet(dedupStore).count() == dedupRows,
      "replay must not re-append unique signatures")
    assert(spark.read.parquet(censusStore).as[(String, Long)].collect().toMap == census,
      "replay must not double-count the line census")
  }
}
