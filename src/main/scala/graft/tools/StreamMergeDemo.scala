package graft.tools

import graft.GraftSession
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Live drive of the streaming→MERGE ingest path: two micro-batches
  * with overlapping keys upserted into a parquet target.
  * `runMain graft.tools.StreamMergeDemo` */
object StreamMergeDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(appName = "stream-merge-demo")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sm").toString + "/repos"
    val mem = MemoryStream[(String, Int)]
    val q = EventStreams.upsertStream(
      mem.toDF().toDF("id", "likes"), Seq("id"), dir).start()
    mem.addData(("r1", 1), ("r2", 2))
    q.processAllAvailable()
    println(s"[stream] after batch 0: " +
      spark.read.parquet(dir).orderBy("id").as[(String, Int)].collect().toSeq)
    mem.addData(("r2", 20), ("r3", 3))
    q.processAllAvailable()
    println(s"[stream] after batch 1: " +
      spark.read.parquet(dir).orderBy("id").as[(String, Int)].collect().toSeq)
    q.stop()
    spark.stop()
  }
}
