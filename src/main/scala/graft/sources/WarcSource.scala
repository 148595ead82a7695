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

  /** Bodies above this are quarantined (payload skipped in chunks,
    * framing preserved) rather than materialized — one row must fit
    * in task memory, a >1 GiB single record never should. */
  val DefaultMaxBodyBytes: Long = 1L << 30

  /** Hard per-record materialization bound: the largest payload a JVM
    * byte array can hold. Bodies above min(maxBodyBytes, this) are
    * skipped-with-quarantine-row even when a caller configures a cap
    * above Int.MaxValue. */
  private val MaxJvmArrayBytes: Long = Int.MaxValue.toLong - 8

  /** Read `pathGlob` (.warc or .warc.gz) into a WarcRow frame. */
  def read(spark: SparkSession, pathGlob: String,
           minPartitions: Int = 0,
           maxBodyBytes: Long = DefaultMaxBodyBytes): DataFrame = {
    import spark.implicits._
    val parts = if (minPartitions > 0) minPartitions
                else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(pathGlob, parts)
      .flatMap { case (path, pds) =>
        records(path, { () =>
          // buffer the RAW stream before GZIPInputStream: its multi-member
          // trailer heuristic treats available()==0 as end-of-stream, which
          // on unbuffered network/HDFS streams can silently truncate
          // per-record-gzipped archives between members
          val raw = new java.io.BufferedInputStream(pds.open(), 1 << 16)
          if (path.endsWith(".gz"))
            new java.io.BufferedInputStream(
              new java.util.zip.GZIPInputStream(raw, 1 << 16), 1 << 16)
          else raw
        }, maxBodyBytes)
      }
      .toDF()
  }

  /** Hadoop Configuration is not java-serializable; carry it to tasks
    * via its Writable form (the standard wrapper pattern). */
  private final class SerializableHadoopConf(
      @transient var conf: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  /** Read an explicit list of segment paths. `binaryFiles` would route
    * the list through Hadoop's comma-separated glob parser — a path
    * containing a comma or glob metacharacter (`,{}[]*?`) mis-splits
    * or mis-scopes the batch — so this bypasses globbing entirely:
    * the path LIST is parallelized (one task per segment, the same
    * per-file granularity `binaryFiles` gives un-splittable gzip) and
    * each task opens its file verbatim through the FileSystem API.
    * Parse behavior matches [[read]] (lazy [[records]] iterator,
    * quarantine rows, gzip layering). */
  def readPaths(spark: SparkSession, paths: Seq[String],
                maxBodyBytes: Long = DefaultMaxBodyBytes): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    if (paths.isEmpty) return spark.emptyDataset[WarcRow].toDF()
    val hconf = new SerializableHadoopConf(sc.hadoopConfiguration)
    sc.parallelize(paths, paths.size)
      .flatMap { p =>
        records(p, { () =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(hconf.conf)
          val raw = new java.io.BufferedInputStream(fs.open(hp), 1 << 16)
          if (p.endsWith(".gz"))
            new java.io.BufferedInputStream(
              new java.util.zip.GZIPInputStream(raw, 1 << 16), 1 << 16)
          else raw
        }, maxBodyBytes)
      }
      .toDF()
  }

  /** Lazy per-record iterator over one archive: parses ONE record per
    * `next()` (memory = one record, never the file), closes the stream
    * on exhaustion, on a fatal framing error (emitted as the final
    * `_error` row), or at task completion if the iterator is abandoned
    * early (e.g. under a `limit`). Decoder exceptions (corrupt gzip)
    * become the `_error` quarantine row, never a task failure. */
  private[sources] def records(path: String,
                               openIn: () => java.io.InputStream,
                               maxBodyBytes: Long = DefaultMaxBodyBytes): Iterator[WarcRow] =
    new scala.collection.AbstractIterator[WarcRow] {
      private var in: java.io.InputStream =
        try openIn()
        catch { case scala.util.control.NonFatal(_) => null }
      private var opened = in != null
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeNow()))
      private def closeNow(): Unit =
        if (in != null) { try in.close() catch { case _: Exception => () }; in = null }
      private var pending: Option[WarcRow] =
        if (opened) fetch()
        else Some(WarcRow(path, "_error", "", "", "failed to open archive",
          -1, "", Array.emptyByteArray))
      private def fetch(): Option[WarcRow] =
        if (in == null) None
        else try parseRecord(path, in, maxBodyBytes) match {
          case Eof        => closeNow(); None
          case Rec(r)     => Some(r)
          case Fatal(r)   => closeNow(); Some(r)
        } catch {
          case scala.util.control.NonFatal(e) =>
            closeNow()
            Some(WarcRow(path, "_error", "", "",
              s"decoder failure: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}",
              -1, "", Array.emptyByteArray))
        }
      override def hasNext: Boolean = pending.isDefined
      override def next(): WarcRow = {
        val r = pending.getOrElse(throw new NoSuchElementException("next on empty WARC iterator"))
        pending = fetch()
        r
      }
    }

  /** Eager convenience for specs: drains [[records]]. */
  private[sources] def parseAll(path: String,
                                in: java.io.InputStream): Seq[WarcRow] =
    records(path, () => in).toSeq

  private sealed trait Parsed
  private case object Eof extends Parsed                     // clean end of archive
  private final case class Rec(row: WarcRow) extends Parsed  // keep parsing
  private final case class Fatal(row: WarcRow) extends Parsed // framing lost: emit, stop

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

  /** Skip exactly `n` payload bytes in bounded chunks (InputStream.skip
    * may return short, and gzip streams only honor it partially). */
  private def skipFully(in: java.io.InputStream, n: Long): Boolean = {
    val scratch = new Array[Byte](1 << 16)
    var left = n
    while (left > 0) {
      val k = in.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
      if (k < 0) return false
      left -= k
    }
    true
  }

  /** One WARC record: version line, headers, Content-Length payload,
    * trailing CRLF CRLF. Content-Length is a Long (ISO 28500 places no
    * 2 GiB bound); bodies over `maxBodyBytes` are skipped in chunks —
    * framing survives, so parsing continues with a recoverable `_error`
    * quarantine row for the oversize record. */
  private def parseRecord(path: String,
                          in: java.io.InputStream,
                          maxBodyBytes: Long): Parsed = {
    def fatal(why: String) =
      Fatal(WarcRow(path, "_error", "", "", why, -1, "", Array.emptyByteArray))
    // skip inter-record blank lines, find the version line
    var line = readLine(in)
    while (line.exists(_.isEmpty)) line = readLine(in)
    line match {
      case None => Eof // clean EOF
      case Some(v) if !v.startsWith("WARC/") => fatal(s"bad version line: '${v.take(40)}'")
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
        if (l.isEmpty) return fatal("EOF inside record headers")
        h.get("content-length").flatMap(_.toLongOption).filter(_ >= 0) match {
          case None => fatal("missing/invalid Content-Length")
          // A body over the configured cap — OR over what a JVM byte
          // array can hold, if a caller raised maxBodyBytes past
          // Int.MaxValue — takes the skip path: n.toInt on a ~3 GiB
          // length would go negative and kill the rest of the archive
          // as a spurious "decoder failure".
          case Some(n) if n > math.min(maxBodyBytes, MaxJvmArrayBytes) =>
            val cap = math.min(maxBodyBytes, MaxJvmArrayBytes)
            if (!skipFully(in, n)) fatal("EOF inside oversize record payload")
            else Rec(WarcRow(path, "_error",
              h.getOrElse("warc-target-uri", ""),
              h.getOrElse("warc-date", ""),
              s"oversize record skipped: $n bytes > $cap cap",
              -1, "", Array.emptyByteArray))
          case Some(n) =>
            readFully(in, n.toInt) match {
              case None => fatal("EOF inside record payload")
              case Some(payload) =>
                val rType = h.getOrElse("warc-type", "")
                val (status, httpCt, body) =
                  if (rType == "response") parseHttp(payload)
                  else (-1, "", payload)
                Rec(WarcRow(path, rType,
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

  /** Continuous crawl ingestion — segments stream in (a crawler drops
    * `.warc.gz` files into a landing dir), Structured Streaming tracks
    * ARRIVAL (the `binaryFile` source with only `path` selected —
    * column pruning keeps the payload bytes out of the stream; the
    * file-listing log is the exactly-once state), and each micro-batch
    * parses its newly-arrived segments through the same lazy
    * [[records]] iterator the batch reader uses. Output lands in
    * batch_id partitions via dynamic overwrite, so a crash-replayed
    * batch overwrites itself (replay-idempotent — the
    * [[graft.streaming.EventStreams.enrichStream]] discipline).
    *
    * The per-batch `collect()` is the FILE LIST (metadata-sized, the
    * justified-collect class) — segment bytes never touch the driver.
    * At 100 TB this is the ingestion-frontier shape: arrival tracking
    * is tiny streaming state, the heavy parse is the same
    * embarrassingly-parallel `binaryFiles` scan as the batch path. */
  def streamIngest(spark: SparkSession, landingGlob: String, outDir: String,
                   maxBodyBytes: Long = DefaultMaxBodyBytes)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // binaryFile's fixed schema, stated explicitly (streaming file
    // sources refuse inference); only `path` is ever selected, so the
    // source prunes `content` and never reads segment bytes here
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val arrivals = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .load(landingGlob)
      .select(col("path"))
    arrivals.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val paths = batch.collect().map(_.getString(0)).toSeq
        if (paths.nonEmpty) {
          // per-path union, not mkString(",") — a landing file whose
          // name contains a comma or glob metachar must not mis-split
          // or mis-scope the batch
          readPaths(batch.sparkSession, paths, maxBodyBytes = maxBodyBytes)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
        ()
      }
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
