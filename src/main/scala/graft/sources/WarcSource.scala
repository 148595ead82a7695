package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) reader — the Common Crawl container,
  * i.e. THE 100 TB training-data source format. Reference scope: the
  * HFCommunity extractor ingests hub metadata over HTTP
  * (databaseImport.py:577-661); a training-data engine additionally
  * needs the web-corpus ingestion plane, which is WARC.
  *
  * Scale shape: `sparkContext.binaryFiles` hands each task a
  * [[org.apache.spark.input.PortableDataStream]] — records are parsed
  * STREAMING off the open InputStream (memory = one record, never the
  * file; Common Crawl segments are ~1 GB each), embarrassingly
  * parallel across files. Gzipped archives (`.gz`) decode through
  * `GZIPInputStream`, which consumes the per-record concatenated gzip
  * members Common Crawl writes. Per-record work is executor-side
  * imperative parsing — the genuine per-partition-imperative case the
  * brief reserves RDD usage for (the GitHistorySource precedent).
  *
  * Fail-soft: a malformed record aborts THAT FILE's remaining parse
  * (framing is unrecoverable without a sync marker) and emits one
  * `_error` sentinel row carrying the reason — the quarantine row
  * pattern (F8), never a task failure.
  */
object WarcSource {

  final case class WarcRow(
      file: String,
      recordType: String,     // warcinfo | request | response | metadata | _error
      url: String,            // WARC-Target-URI ("" when absent)
      warcDate: String,       // WARC-Date as written
      contentType: String,    // the record's Content-Type header
      httpStatus: Int,        // response records: HTTP status; else -1
      httpContentType: String,// response records: payload Content-Type; else ""
      body: Array[Byte])      // response: HTTP body; others: raw payload

  /** Read `pathGlob` (.warc or .warc.gz) into a WarcRow frame. */
  def read(spark: SparkSession, pathGlob: String,
           minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (minPartitions > 0) minPartitions
                else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(pathGlob, parts)
      .flatMap { case (path, pds) =>
        val raw = pds.open()
        val in = new java.io.BufferedInputStream(
          if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw) else raw)
        try parseAll(path, in)
        finally in.close()
      }
      .toDF()
  }

  /** Streaming parse of every record in one archive. */
  private[sources] def parseAll(path: String,
                                in: java.io.InputStream): Seq[WarcRow] = {
    val out = Seq.newBuilder[WarcRow]
    var done = false
    while (!done) {
      parseRecord(path, in) match {
        case Some(r) =>
          out += r
          if (r.recordType == "_error") done = true
        case None => done = true
      }
    }
    out.result()
  }

  /** Read one CRLF-terminated header line; None at clean EOF. */
  private def readLine(in: java.io.InputStream): Option[String] = {
    val sb = new StringBuilder
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    Some(sb.toString)
  }

  private def readFully(in: java.io.InputStream, n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) return None
      off += k
    }
    Some(buf)
  }

  /** One WARC record: version line, headers, Content-Length payload,
    * trailing CRLF CRLF. None = clean end of archive. */
  private def parseRecord(path: String,
                          in: java.io.InputStream): Option[WarcRow] = {
    def err(why: String) =
      Some(WarcRow(path, "_error", "", "", why, -1, "", Array.emptyByteArray))
    // skip inter-record blank lines, find the version line
    var line = readLine(in)
    while (line.exists(_.isEmpty)) line = readLine(in)
    line match {
      case None => None // clean EOF
      case Some(v) if !v.startsWith("WARC/") => err(s"bad version line: '${v.take(40)}'")
      case Some(_) =>
        // headers until the empty line
        val h = scala.collection.mutable.Map[String, String]()
        var l = readLine(in)
        while (l.exists(_.nonEmpty)) {
          val s = l.get
          val i = s.indexOf(':')
          if (i > 0) h(s.substring(0, i).trim.toLowerCase) = s.substring(i + 1).trim
          l = readLine(in)
        }
        if (l.isEmpty) return err("EOF inside record headers")
        h.get("content-length").flatMap(_.toIntOption) match {
          case None => err("missing/invalid Content-Length")
          case Some(n) =>
            readFully(in, n) match {
              case None => err("EOF inside record payload")
              case Some(payload) =>
                val rType = h.getOrElse("warc-type", "")
                val (status, httpCt, body) =
                  if (rType == "response") parseHttp(payload)
                  else (-1, "", payload)
                Some(WarcRow(path, rType,
                  h.getOrElse("warc-target-uri", ""),
                  h.getOrElse("warc-date", ""),
                  h.getOrElse("content-type", ""),
                  status, httpCt, body))
            }
        }
    }
  }

  /** Split an HTTP response payload into (status, Content-Type, body);
    * non-HTTP payloads come back whole with status -1. */
  private def parseHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val sep = indexOfHeaderEnd(payload)
    if (sep < 0) return (-1, "", payload)
    val head = new String(payload, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption.filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption).getOrElse(-1)
    if (status < 0) return (-1, "", payload)
    val ct = lines.drop(1).find(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim).getOrElse("")
    (status, ct, payload.drop(sep + 4))
  }

  private def indexOfHeaderEnd(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Project successful text responses into the engine's `documents`
    * shape (doc_id = stable sha-derived long of the URL, source =
    * host) — the bridge from raw crawl to every qt/qd/qp operator.
    * HTML payloads run through
    * [[graft.functions.TextFunctions.htmlToText]] (tag soup →
    * tokenizable text); other text types pass through. Scan-local,
    * zero shuffle. */
  def asDocuments(warc: DataFrame): DataFrame = {
    val raw = decode(col("body"), "UTF-8")
    warc.filter(col("recordType") === "response" &&
        col("httpStatus") === 200 &&
        col("httpContentType").startsWith("text/"))
      .select(
        conv(substring(sha2(col("url"), 256), 1, 15), 16, 10).cast("long").as("doc_id"),
        col("url"),
        regexp_extract(col("url"), "^https?://([^/]+)", 1).as("source"),
        when(col("httpContentType").startsWith("text/html"),
          graft.functions.TextFunctions.htmlToText(raw)).otherwise(raw).as("text"),
        col("warcDate").as("fetched_at"))
  }

  /** WET variant: Common Crawl's extracted-text sibling stores one
    * `conversion` record per page (payload = already-extracted plain
    * text) — the distribution most corpus builds actually consume.
    * Same documents shape as [[asDocuments]]; no HTTP envelope, no
    * tag stripping needed. */
  def asWetDocuments(warc: DataFrame): DataFrame =
    warc.filter(col("recordType") === "conversion")
      .select(
        conv(substring(sha2(col("url"), 256), 1, 15), 16, 10).cast("long").as("doc_id"),
        col("url"),
        regexp_extract(col("url"), "^https?://([^/]+)", 1).as("source"),
        decode(col("body"), "UTF-8").as("text"),
        col("warcDate").as("fetched_at"))
}
