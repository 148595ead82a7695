package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicReference
import scala.collection.mutable.ListBuffer

/** The listing table as a STREAM: each AvailableNow run polls the
  * endpoint once; a batch is emitted only when the listing content
  * hash changes, and the checkpoint carries the hash so change
  * detection survives restarts — the reference's periodic re-crawl as
  * a Structured Streaming source. */
class HfhStreamingSpec extends SparkTestBase {

  private val listingBody = new AtomicReference[String](
    """[{"id":"o/m1","author":"o","sha":"s1","lastModified":"2024-03-01T00:00:00Z",
      |  "private":false,"gated":false,"likes":1},
      | {"id":"o/m2","author":"o","sha":"s2","lastModified":"2024-02-01T00:00:00Z",
      |  "private":false,"gated":false,"likes":2}]""".stripMargin)

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) { val os = x.getResponseBody; os.write(b); os.close() }
    x.close()
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/api/models",
      (x: HttpExchange) => respond(x, 200, listingBody.get()))
    s.start(); s
  }

  override def afterAll(): Unit = { try server.stop(0) finally super.afterAll() }

  test("poll stream: snapshot on change, silence on no-change, resume-safe across runs") {
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hfh-stream").toString

    def runOnce(): Seq[Row] = {
      val got = ListBuffer[Row]()
      val fn: (Dataset[Row], Long) => Unit = (df, _) => { got ++= df.collect(); () }
      val q = spark.readStream.format("hfh")
        .option("baseUrl", base).option("type", "model").option("limit", "5")
        .load()
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not drain in time")
      got.toSeq
    }

    // run 1: fresh checkpoint → one snapshot batch with both repos
    val r1 = runOnce()
    assert(r1.map(_.getAs[String]("repo_id")).sorted ==
      Seq("models/o/m1", "models/o/m2"))

    // run 2: content unchanged → the hash matches the checkpointed
    // offset, NO batch (this is the change-detection contract)
    assert(runOnce().isEmpty)

    // run 3: listing changes → exactly one new snapshot batch
    listingBody.set(
      """[{"id":"o/m9","author":"o","sha":"s9","lastModified":"2024-05-01T00:00:00Z",
        |  "private":false,"gated":false,"likes":9}]""".stripMargin)
    val r3 = runOnce()
    assert(r3.map(_.getAs[String]("repo_id")) == Seq("models/o/m9"))
    assert(r3.head.getAs[Long]("likes") == 9L)
  }

  test("listing stream → silver repository MERGE: the E1 refresh loop, continuous") {
    import graft.hfc.Transforms
    import org.apache.spark.sql.functions._
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hfh-merge-ck").toString
    val target = java.nio.file.Files.createTempDirectory("graft-hfh-merge").toString + "/repository"

    listingBody.set(
      """[{"id":"o/r1","author":"o","sha":"a1","lastModified":"2024-03-01T00:00:00Z",
        |  "private":false,"gated":"manual","likes":1},
        | {"id":"o/r2","author":"o","sha":"a2","lastModified":"2024-02-01T00:00:00Z",
        |  "private":false,"gated":false,"likes":2}]""".stripMargin)

    def refreshOnce(): Unit = {
      val stream = spark.readStream.format("hfh")
        .option("baseUrl", base).option("type", "model").option("limit", "10").load()
      // the P4/P10/P6 silver projection, applied to the stream itself
      // (pure Column transforms — no batch/stream divide)
      val silver = stream.select(
        Transforms.repoId(lit("model"), col("name")).as("id"),
        col("name"), lit("model").as("type"), col("author"), col("sha"),
        col("last_modified"), col("private"),
        Transforms.cleanText(col("card_data")).as("card_data"),
        Transforms.normalizeGated(col("gated")).as("gated"),
        col("disabled"), col("likes"))
      val q = graft.streaming.EventStreams.upsertStream(silver, Seq("id"), target)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "refresh did not drain")
    }

    refreshOnce()
    val v1 = spark.read.parquet(target).collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(v1.keySet == Set("models/o/r1", "models/o/r2"))
    assert(v1("models/o/r1").getAs[String]("gated") == null) // P10 applied in-stream
    assert(v1("models/o/r2").getAs[Long]("likes") == 2L)

    // upstream changes: r2's metadata moves, r3 appears, r1 unchanged
    listingBody.set(
      """[{"id":"o/r3","author":"o","sha":"a3","lastModified":"2024-05-01T00:00:00Z",
        |  "private":false,"gated":false,"likes":30},
        | {"id":"o/r1","author":"o","sha":"a1","lastModified":"2024-03-01T00:00:00Z",
        |  "private":false,"gated":"manual","likes":1},
        | {"id":"o/r2","author":"o","sha":"a2b","lastModified":"2024-04-01T00:00:00Z",
        |  "private":false,"gated":false,"likes":7}]""".stripMargin)
    refreshOnce()
    val v2 = spark.read.parquet(target).collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(v2.keySet == Set("models/o/r1", "models/o/r2", "models/o/r3")) // K2: insert + update
    assert(v2("models/o/r2").getAs[String]("sha") == "a2b")               // updated in place
    assert(v2("models/o/r2").getAs[Long]("likes") == 7L)
    assert(v2("models/o/r1").getAs[String]("sha") == "a1")                // untouched survives
    assert(v2("models/o/r3").getAs[Long]("likes") == 30L)                 // new key inserted
  }
}
