package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** WARC reader over byte-assembled ISO 28500 fixtures (the decoders
  * never see their own output): warcinfo + request + response +
  * metadata records, plain and per-record-gzipped (the Common Crawl
  * layout: each record its own gzip member, concatenated). */
class WarcSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def record(tpe: String, uri: String, payload: Array[Byte],
                     contentType: String): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    if (uri.nonEmpty) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2024-03-01T12:00:00Z\r\n"
    h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes
  }

  private def httpResponse(status: Int, contentType: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\nServer: x\r\n\r\n" + body)
      .getBytes("UTF-8")

  private def fixture: Array[Byte] =
    record("warcinfo", "", "software: graft-test\r\n".getBytes, "application/warc-fields") ++
    record("request", "http://example.com/a", "GET /a HTTP/1.1\r\n\r\n".getBytes,
      "application/http; msgtype=request") ++
    record("response", "http://example.com/a",
      httpResponse(200, "text/html; charset=utf-8", "<html>hello warc</html>"),
      "application/http; msgtype=response") ++
    record("response", "http://example.com/img.png",
      httpResponse(200, "image/png", "PNGDATA"),
      "application/http; msgtype=response") ++
    record("response", "http://example.com/gone",
      httpResponse(404, "text/html", "nope"),
      "application/http; msgtype=response") ++
    record("metadata", "http://example.com/a", "fetchTimeMs: 12\r\n".getBytes,
      "application/warc-fields")

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = java.nio.file.Files.createTempDirectory("warc").toFile
    val f = new java.io.File(dir, name)
    java.nio.file.Files.write(f.toPath, bytes)
    f.getAbsolutePath
  }

  /** each record its own gzip member, concatenated — the CC layout */
  private def gzipPerRecord(records: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(r); g.finish()
    }
    bos.toByteArray
  }

  test("plain WARC: all record types parsed, HTTP responses split") {
    val path = writeTmp("f.warc", fixture)
    val rows = WarcSource.read(spark, path).orderBy($"url", $"recordType").collect()
    assert(rows.length == 6, rows.mkString("\n"))
    val types = rows.map(_.getAs[String]("recordType")).sorted.toSeq
    assert(types == Seq("metadata", "request", "response", "response", "response", "warcinfo"))
    val ok = rows.filter(r => r.getAs[String]("url") == "http://example.com/a" &&
      r.getAs[String]("recordType") == "response").head
    assert(ok.getAs[Int]("httpStatus") == 200)
    assert(ok.getAs[String]("httpContentType") == "text/html; charset=utf-8")
    assert(new String(ok.getAs[Array[Byte]]("body"), "UTF-8") == "<html>hello warc</html>")
    val gone = rows.find(_.getAs[String]("url") == "http://example.com/gone").get
    assert(gone.getAs[Int]("httpStatus") == 404)
  }

  test("per-record-gzipped archive (the Common Crawl layout) reads identically") {
    val recs = Seq(
      record("warcinfo", "", "software: graft-test\r\n".getBytes, "application/warc-fields"),
      record("response", "http://example.com/a",
        httpResponse(200, "text/plain", "body a"), "application/http; msgtype=response"),
      record("response", "http://example.com/b",
        httpResponse(200, "text/plain", "body b"), "application/http; msgtype=response"))
    val path = writeTmp("f.warc.gz", gzipPerRecord(recs))
    val rows = WarcSource.read(spark, path).filter($"recordType" === "response")
      .orderBy($"url").collect()
    assert(rows.length == 2)
    assert(new String(rows(0).getAs[Array[Byte]]("body"), "UTF-8") == "body a")
    assert(new String(rows(1).getAs[Array[Byte]]("body"), "UTF-8") == "body b")
  }

  test("malformed record quarantines as one _error row, keeping earlier records") {
    val bytes = record("response", "http://ok.example/x",
        httpResponse(200, "text/plain", "fine"), "application/http; msgtype=response") ++
      "GARBAGE NOT A VERSION LINE\r\n".getBytes
    val path = writeTmp("bad.warc", bytes)
    val rows = WarcSource.read(spark, path).orderBy($"recordType").collect()
    assert(rows.length == 2, rows.mkString("\n"))
    assert(rows(0).getAs[String]("recordType") == "_error")
    assert(rows(0).getAs[String]("contentType").contains("bad version line"))
    assert(rows(1).getAs[String]("recordType") == "response")
  }

  test("truncated payload quarantines instead of failing the task") {
    val full = record("response", "http://ok.example/x",
      httpResponse(200, "text/plain", "fine"), "application/http; msgtype=response")
    val path = writeTmp("trunc.warc", full.dropRight(12))
    val rows = WarcSource.read(spark, path).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("recordType") == "_error")
    assert(rows(0).getAs[String]("contentType").contains("EOF"))
  }

  test("records is lazy: parses one record per next(), never buffers the archive") {
    // a stream that counts how far it has been read: after pulling the
    // FIRST record off a 3-record archive, the reader must not have
    // consumed the rest of the stream (the one-record-in-memory claim)
    val recs = Seq(
      record("response", "http://example.com/a",
        httpResponse(200, "text/plain", "body a"), "application/http; msgtype=response"),
      record("response", "http://example.com/b",
        httpResponse(200, "text/plain", "b" * 4096), "application/http; msgtype=response"),
      record("response", "http://example.com/c",
        httpResponse(200, "text/plain", "c" * 4096), "application/http; msgtype=response"))
    val all = recs.reduce(_ ++ _)
    var pos = 0
    val counting = new java.io.InputStream {
      override def read(): Int =
        if (pos >= all.length) -1 else { val b = all(pos) & 0xff; pos += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (pos >= all.length) return -1
        val n = math.min(len, all.length - pos)
        System.arraycopy(all, pos, b, off, n); pos += n; n
      }
    }
    val it = WarcSource.records("lazy.warc", () => counting)
    val first = it.next() // iterator pre-fetches one record ahead
    assert(first.url == "http://example.com/a")
    assert(pos < recs(0).length + recs(1).length + 64,
      s"reader consumed $pos of ${all.length} bytes after one next() — not streaming")
    assert(it.toSeq.map(_.url) ===
      Seq("http://example.com/b", "http://example.com/c"))
    assert(pos == all.length)
  }

  test("oversize record is skipped in chunks, framing preserved, later records kept") {
    val big = record("response", "http://example.com/huge",
      httpResponse(200, "text/plain", "x" * 50000), "application/http; msgtype=response")
    val after = record("response", "http://example.com/ok",
      httpResponse(200, "text/plain", "still here"), "application/http; msgtype=response")
    val path = writeTmp("big.warc", big ++ after)
    val rows = WarcSource.read(spark, path, maxBodyBytes = 1024)
      .orderBy($"recordType").collect()
    assert(rows.length == 2, rows.mkString("\n"))
    assert(rows(0).getAs[String]("recordType") == "_error")
    assert(rows(0).getAs[String]("contentType").contains("oversize"))
    assert(rows(0).getAs[String]("url") == "http://example.com/huge")
    assert(rows(1).getAs[String]("url") == "http://example.com/ok",
      "parsing must continue past a skipped oversize record")
  }

  test("a >2 GiB Content-Length parses as Long and quarantines, not _error-by-int-overflow") {
    val h = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://example.com/big\r\n" +
      "WARC-Date: 2024-03-01T12:00:00Z\r\nContent-Type: application/http\r\n" +
      s"Content-Length: ${3L * 1024 * 1024 * 1024}\r\n\r\n").getBytes("ISO-8859-1")
    val path = writeTmp("huge.warc", h) // payload absent: EOF inside the skip
    val rows = WarcSource.read(spark, path).collect()
    assert(rows.length == 1)
    val ct = rows(0).getAs[String]("contentType")
    assert(ct.contains("oversize") || ct.contains("EOF inside oversize"),
      s"3 GiB length must reach the oversize path, got: $ct")
  }

  test("a cap raised past Int.MaxValue still routes a >2 GiB body through the oversize skip") {
    // Content-Length 3 GiB, cap 4 GiB: materializing would need
    // n.toInt (negative) — the record must take the skip path and
    // surface the truncation as the oversize EOF, never as a
    // NegativeArraySizeException masquerading as a decoder failure
    val h = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://example.com/big\r\n" +
      "WARC-Date: 2024-03-01T12:00:00Z\r\nContent-Type: application/http\r\n" +
      s"Content-Length: ${3L * 1024 * 1024 * 1024}\r\n\r\n").getBytes("ISO-8859-1")
    val rows = WarcSource.records("big4g",
      () => new java.io.ByteArrayInputStream(h),
      maxBodyBytes = 4L * 1024 * 1024 * 1024).toSeq
    assert(rows.length == 1)
    assert(rows.head.recordType == "_error")
    assert(rows.head.contentType.contains("oversize"),
      s"must take the oversize path under a >2 GiB cap, got: ${rows.head.contentType}")
    assert(!rows.head.contentType.contains("decoder failure"))
  }

  test("readPaths: comma-containing filenames read verbatim, unlisted files excluded") {
    val dir = java.nio.file.Files.createTempDirectory("warc-paths").toFile
    def put(name: String, uri: String): String = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.write(f.toPath,
        record("response", uri, httpResponse(200, "text/plain", "x"),
          "application/http; msgtype=response"))
      f.getAbsolutePath
    }
    val a = put("seg,one.warc", "http://example.com/comma")
    val b = put("plain.warc", "http://example.com/plain")
    put("unlisted.warc", "http://example.com/unlisted")
    val urls = WarcSource.readPaths(spark, Seq(a, b))
      .select($"url").as[String].collect().toSet
    assert(urls == Set("http://example.com/comma", "http://example.com/plain"),
      s"comma path mis-split or batch mis-scoped: $urls")
    assert(WarcSource.readPaths(spark, Seq.empty).count() == 0L)
  }

  test("corrupt gzip quarantines as _error instead of failing the task") {
    val good = record("response", "http://example.com/a",
      httpResponse(200, "text/plain", "body a"), "application/http; msgtype=response")
    val gz = gzipPerRecord(Seq(good))
    // flip bytes inside the deflate stream of the only member
    val corrupted = gz.clone()
    for (i <- 20 until math.min(40, corrupted.length)) corrupted(i) = 0x55
    val path = writeTmp("corrupt.warc.gz", corrupted)
    val rows = WarcSource.read(spark, path).collect()
    assert(rows.nonEmpty)
    assert(rows.last.getAs[String]("recordType") == "_error",
      rows.mkString("\n"))
  }

  test("fuzz: random byte garbage never throws — at most one fatal _error row per archive") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val bytes = Array.fill(4096)(rnd.nextInt(256).toByte)
      val rows = WarcSource.parseAll(s"fuzz-$seed",
        new java.io.ByteArrayInputStream(bytes))
      assert(rows.count(_.recordType == "_error") <= 1, s"seed $seed: $rows")
      assert(rows.lastOption.forall(_.recordType == "_error") || rows.isEmpty)
    }
    // and garbage that happens to START like a record but lies about
    // its length quarantines too
    val liar = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999\r\n\r\nshort")
      .getBytes("ISO-8859-1")
    val rows = WarcSource.parseAll("liar", new java.io.ByteArrayInputStream(liar))
    assert(rows.length == 1 && rows.head.recordType == "_error")
  }

  test("streamIngest: arriving segments land in batch_id partitions, replay-idempotent shape") {
    val dir = java.nio.file.Files.createTempDirectory("warc-stream").toString
    val landing = s"$dir/landing"
    val out = s"$dir/out"
    new java.io.File(landing).mkdirs()
    // segment 1 on disk before the stream starts
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$landing/seg1.warc"),
      record("response", "http://example.com/a",
        httpResponse(200, "text/plain", "body a"), "application/http; msgtype=response"))
    val q = WarcSource.streamIngest(spark, landing, out)
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // segment 2 arrives later; a second AvailableNow run picks up ONLY it
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$landing/seg2.warc"),
      record("response", "http://example.com/b",
        httpResponse(200, "text/plain", "body b"), "application/http; msgtype=response"))
    val q2 = WarcSource.streamIngest(spark, landing, out)
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val rows = spark.read.parquet(out)
      .select($"url", $"batch_id").collect()
      // partition-dir inference narrows batch_id to int — read numerically
      .map(r => r.getString(0) -> r.getAs[Number](1).longValue()).toMap
    assert(rows.keySet == Set("http://example.com/a", "http://example.com/b"))
    assert(rows("http://example.com/a") != rows("http://example.com/b"),
      "each arrival wave must land in its own batch partition")
  }

  test("asDocuments bridges 200 text responses into the documents shape") {
    val path = writeTmp("f.warc", fixture)
    val docs = WarcSource.asDocuments(WarcSource.read(spark, path))
      .orderBy($"url").collect()
    // only the 200 text/html record qualifies (png and 404 are dropped)
    assert(docs.length == 1, docs.mkString("\n"))
    val d = docs.head
    assert(d.getAs[String]("url") == "http://example.com/a")
    assert(d.getAs[String]("source") == "example.com")
    // text/html payloads run the tag-strip extraction
    assert(d.getAs[String]("text") == "hello warc")
    assert(d.getAs[Long]("doc_id") > 0)
    // deterministic id: re-read gives the same id
    val again = WarcSource.asDocuments(WarcSource.read(spark, path)).collect().head
    assert(again.getAs[Long]("doc_id") == d.getAs[Long]("doc_id"))
  }

  test("asWetDocuments consumes WET conversion records (pre-extracted text)") {
    val wet =
      record("warcinfo", "", "software: wet-test\r\n".getBytes, "application/warc-fields") ++
      record("conversion", "http://example.com/a",
        "Already extracted page text.".getBytes("UTF-8"), "text/plain") ++
      record("conversion", "http://example.org/b",
        "Second page.".getBytes("UTF-8"), "text/plain")
    val path = writeTmp("f.warc.wet", wet)
    val docs = WarcSource.asWetDocuments(WarcSource.read(spark, path))
      .orderBy($"url").collect()
    assert(docs.length == 2)
    assert(docs(0).getAs[String]("text") == "Already extracted page text.")
    assert(docs(0).getAs[String]("source") == "example.com")
    assert(docs(1).getAs[String]("source") == "example.org")
  }
}
