package graft.tools

import graft.GraftSession
import graft.sources.WarcSource
import org.apache.spark.sql.functions._

/** Realistic-segment-scale evidence for the WARC reader's claims: the
  * spec fixtures are byte-assembled miniatures; this drives a
  * generated multi-hundred-MB per-record-gzipped archive set (the
  * Common Crawl layout) through read → asDocuments → a qt01-style
  * token census and reports records/sec + bytes/sec. The
  * one-record-in-memory claim is pinned by WarcSourceSpec's
  * counting-stream test; this tool supplies the throughput row for
  * NOTES_r{N}.
  *
  * Generation is deterministic (content derived from record index),
  * lands in /tmp, and is profiling-only data — never a gate input.
  *
  * `runMain graft.tools.ProfileWarc [nFiles] [recordsPerFile] [bodyKb]` */
object ProfileWarc {

  private def body(i: Int, bodyKb: Int): Array[Byte] = {
    val sb = new StringBuilder(bodyKb * 1024 + 256)
    sb ++= s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
    var j = 0
    // pseudo-sentences: hashed-int words, ~10 words each, deterministic
    while (sb.length < bodyKb * 1024) {
      val w = Integer.toHexString((i * 1103515245 + j * 12345) | 0x10000)
      sb ++= w
      sb += (if (j % 10 == 9) '.' else ' ')
      j += 1
    }
    sb.toString.getBytes("UTF-8")
  }

  private def record(i: Int, bodyKb: Int): Array[Byte] = {
    val p = body(i, bodyKb)
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://synth.example/doc/$i\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      p ++ "\r\n\r\n".getBytes
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(4)
    val perFile = args.lift(1).map(_.toInt).getOrElse(2500)
    val bodyKb = args.lift(2).map(_.toInt).getOrElse(40)
    val dir = java.nio.file.Files.createTempDirectory("warc-profile").toString

    var rawBytes = 0L
    val t0 = System.nanoTime()
    for (f <- 0 until nFiles) {
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(s"$dir/seg$f.warc.gz"), 1 << 20)
      for (r <- 0 until perFile) {
        val g = new java.util.zip.GZIPOutputStream(out) // per-record member (CC layout)
        val rec = record(f * perFile + r, bodyKb)
        rawBytes += rec.length
        g.write(rec); g.finish()
      }
      out.close()
    }
    val gzBytes = (0 until nFiles)
      .map(f => new java.io.File(s"$dir/seg$f.warc.gz").length()).sum
    println(f"[warc-gen] files=$nFiles records=${nFiles * perFile} " +
      f"raw=${rawBytes / 1e6}%.0fMB gz=${gzBytes / 1e6}%.0fMB " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    val spark = GraftSession.local(appName = "warc-profile")
    // leg 1: full parse
    var t = System.nanoTime()
    val n = WarcSource.read(spark, s"$dir/*.warc.gz").count()
    val parseWall = (System.nanoTime() - t) / 1e9
    println(f"[warc-read] records=$n wall=$parseWall%.1fs " +
      f"rec_per_s=${n / parseWall}%.0f raw_MB_per_s=${rawBytes / 1e6 / parseWall}%.0f")

    // leg 2: the pipeline bridge — asDocuments → token census (qt01's read)
    t = System.nanoTime()
    val docs = WarcSource.asDocuments(WarcSource.read(spark, s"$dir/*.warc.gz"))
    val toks = docs.select(size(graft.functions.TextFunctions.tokens(lower(col("text")))).as("nt"))
      .agg(count(lit(1)).as("docs"), sum(col("nt")).as("tokens")).head()
    val docWall = (System.nanoTime() - t) / 1e9
    println(f"[warc-docs] docs=${toks.getLong(0)} tokens=${toks.getLong(1)} " +
      f"wall=$docWall%.1fs raw_MB_per_s=${rawBytes / 1e6 / docWall}%.0f")

    // leg 3: the FULL production funnel — land once (crawl →
    // asDocuments → parquet, what streamIngest's batches do), then
    // curate from columnar (the qx01 composition: quality gate →
    // exact dedup → temperature mix → report). The funnel's report
    // stage reads its input three times (raw/quality/unique counts);
    // over landed parquet those are cheap pruned scans — over raw
    // gzip they would be three full re-parses, which is why ingest
    // and curation separate at 100 TB.
    t = System.nanoTime()
    WarcSource.asDocuments(WarcSource.read(spark, s"$dir/*.warc.gz"))
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val landWall = (System.nanoTime() - t) / 1e9
    t = System.nanoTime()
    val funnel = graft.queries.CurationQueries.corpusBuildFrom(
      spark.read.parquet(s"$dir/docs.parquet"),
      budget = (nFiles.toLong * perFile) / 4).collect()
    val funnelWall = (System.nanoTime() - t) / 1e9
    val (raw, kept) = (funnel.map(_.getLong(1)).sum, funnel.map(_.getLong(4)).sum)
    println(f"[warc-funnel] land=$landWall%.1fs (${rawBytes / 1e6 / landWall}%.0f MB/s) " +
      f"curate=$funnelWall%.1fs raw=$raw kept=$kept " +
      f"end_to_end_MB_per_s=${rawBytes / 1e6 / (landWall + funnelWall)}%.0f")

    // cleanup the generated segments
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
  }
}
