package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Crawl → curation COMPOSED: the WARC reader's output run through the
  * qx01 corpus-build funnel (quality gate → exact dedup → temperature
  * mix), batch and streaming — the production shape a continuous crawl
  * feeds. Pins: error rows quarantined without poisoning the funnel,
  * non-document records filtered at the bridge, funnel counts
  * reconciled stage by stage, and the streaming leg (streamIngest →
  * parquet → same funnel) lands byte-identical to the batch leg over
  * the same segments. */
class WarcCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private def record(tpe: String, uri: String, payload: Array[Byte],
                     contentType: String): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    if (uri.nonEmpty) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2026-01-01T00:00:00Z\r\n"
    h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes
  }

  private def http200(contentType: String, body: String): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n\r\n" + body).getBytes("UTF-8")

  private def response(uri: String, contentType: String, body: String): Array[Byte] =
    record("response", uri, http200(contentType, body), "application/http; msgtype=response")

  /** 25 five-char words: passes the qx01 gate (wc >= 20, 3 <= chars/
    * token <= 12) deterministically. */
  private def goodText(tag: String): String =
    (0 until 25).map(i => s"$tag${i % 10}xx").mkString(" ")

  private def writeSegments(dir: String): Unit = {
    val d = new java.io.File(dir); d.mkdirs()
    // seg1: two duplicate-text docs + a quality-fail + non-text + 404
    val seg1 =
      response("http://site-a.example/a1", "text/plain", goodText("aa")) ++
      response("http://site-a.example/a2", "text/plain", goodText("aa")) ++
      response("http://site-a.example/bad", "text/plain", "way too short") ++
      response("http://site-a.example/img.png", "image/png", "PNGDATA") ++
      record("response", "http://site-a.example/gone",
        ("HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\nnope").getBytes("UTF-8"),
        "application/http; msgtype=response")
    java.nio.file.Files.write(new java.io.File(d, "seg1.warc").toPath, seg1)
    // seg2: one distinct good doc on a second host
    java.nio.file.Files.write(new java.io.File(d, "seg2.warc").toPath,
      response("http://site-b.example/b1", "text/plain", goodText("bb")))
    // seg3: corrupt gzip — must quarantine as ONE _error row
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(response("http://site-c.example/c1", "text/plain", goodText("cc"))); g.finish()
    val corrupted = bos.toByteArray
    for (i <- 20 until math.min(48, corrupted.length)) corrupted(i) = 0x55
    java.nio.file.Files.write(new java.io.File(d, "seg3.warc.gz").toPath, corrupted)
  }

  private def funnel(docs: org.apache.spark.sql.DataFrame) =
    graft.queries.CurationQueries.corpusBuildFrom(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("batch: crawl -> asDocuments -> corpus funnel, counts reconciled, errors quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("warc-corpus").toString + "/landing"
    writeSegments(dir)
    val warc = WarcSource.read(spark, s"$dir/*")
    // quarantine: the corrupt segment is exactly one _error row and
    // never surfaces as a document
    assert(warc.filter($"recordType" === "_error").count() == 1)
    val docs = WarcSource.asDocuments(warc)
    // bridge filter: 200 + text/* only -> a1, a2, bad, b1
    assert(docs.count() == 4)
    assert(docs.filter($"url".contains("img") || $"url".contains("gone")).count() == 0)
    // funnel reconciliation per source: raw -> quality -> unique -> sampled
    val f = funnel(docs)
    assert(f == Set(
      ("site-a.example", 3L, 2L, 1L, 1L),   // dup collapsed, short doc gated
      ("site-b.example", 1L, 1L, 1L, 1L)), s"funnel drifted: $f")
    // n_raw total equals the bridged doc count: nothing lost between stages
    assert(f.toSeq.map(_._2).sum == docs.count())
  }

  test("streaming: streamIngest waves -> same funnel result as the batch leg") {
    val base = java.nio.file.Files.createTempDirectory("warc-corpus-stream").toString
    val landing = s"$base/landing"
    writeSegments(landing)
    // wave 1: only seg1 present
    val hold = Seq("seg2.warc", "seg3.warc.gz").map { n =>
      val f = new java.io.File(landing, n)
      val h = new java.io.File(base, n)
      require(f.renameTo(h)); (h, f)
    }
    def runOnce(): Unit = {
      val q = WarcSource.streamIngest(spark, landing, s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    // wave 2: the rest arrives
    hold.foreach { case (h, f) => require(h.renameTo(f)) }
    runOnce()
    val streamed = spark.read.parquet(s"$base/out")
    // replay-idempotent landing: same record set as the batch read,
    // including the quarantined _error row
    val batch = WarcSource.read(spark, s"$landing/*")
    assert(streamed.select($"url", $"recordType").collect().toSet ==
      batch.select($"url", $"recordType").collect().toSet)
    // identical curation outcome through the SAME funnel operator
    assert(funnel(WarcSource.asDocuments(streamed)) ==
      funnel(WarcSource.asDocuments(batch)))
  }
}
