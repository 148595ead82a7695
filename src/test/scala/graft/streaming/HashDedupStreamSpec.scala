package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming perceptual-hash dedup: waves against a growing store,
  * then a checkpoint-loss replay that must be exactly-once. */
class HashDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("two waves; later wave dups to earlier append; replay is exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-hds").toString
    val store = s"$base/store"; val out = s"$base/decisions"
    graft.operators.IncrementalHashDedup.initStore(
      Seq((1L, 0x00L)).toDF("doc_id", "phash"), store)

    def run(ckpt: String, waves: Seq[Seq[(Long, Long)]]): Unit = {
      val mem = MemoryStream[(Long, Long)]
      val q = EventStreams.hashDedupStream(
        mem.toDF.toDF("doc_id", "phash"), store, out)
        .option("checkpointLocation", s"$base/$ckpt").start()
      try waves.foreach { w => mem.addData(w: _*); q.processAllAvailable() }
      finally q.stop()
    }
    run("ckpt1", Seq(
      Seq((10L, 0x01L), (11L, 0xF0F0F0L)),
      Seq((20L, 0xF0F0F0L), (21L, 0x0FF00000000L))))

    def dec() = spark.read.parquet(out)
      .select($"doc_id", $"dup_of", $"hamming")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    val d = dec()
    assert(d(10L) == ((Some(1L), Some(1L))), s"wave-1 dup of the seed: ${d(10L)}")
    assert(d(11L) == ((None, None)))
    assert(d(20L) == ((Some(11L), Some(0L))), s"wave-2 dup of wave-1's append: ${d(20L)}")
    assert(d(21L) == ((None, None)))
    val storedIds = spark.read.parquet(store).select("id").as[Long].collect().toSet
    assert(storedIds == Set(1L, 11L, 21L), s"uniques only: $storedIds")

    // checkpoint loss: wave 1 re-delivers as batch 0 of a fresh query —
    // markers skip the append, the self-match guard keeps decisions equal
    val before = dec()
    run("ckpt2", Seq(Seq((10L, 0x01L), (11L, 0xF0F0F0L))))
    assert(dec() == before, "replay must reproduce decisions exactly-once")
    assert(spark.read.parquet(store).select("id").as[Long].collect().toSet ==
      Set(1L, 11L, 21L), "replay must not grow the store")
  }
}
