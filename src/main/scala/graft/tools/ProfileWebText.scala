package graft.tools

import graft.GraftSession
import graft.operators.WebText
import graft.tools.ProfileScaleFamily.ShuffleMeter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fleet-scale evidence for the web-text plane (qt44/qt45/qx03): the
  * per-plane measurement discipline (ProfileImagePlane → audio → video)
  * applied to HTML extraction and URL canonicalization.
  *
  * The 100 TB questions, answered empirically at 3 corpus sizes:
  *  - is extraction throughput FLAT per byte (pure scan projection —
  *    the wall must scale with MB read, nothing else)?
  *  - does extraction shuffle ZERO bytes (the plan claim, metered)?
  *  - does the composed qx03-shaped funnel's shuffle stay ~100 B/doc
  *    (metadata only — page bytes never enter an exchange)?
  *  - does the non-URL quarantine count exactly match the planted mass?
  *
  * Corpora are synthesized (seeded, deterministic) under /tmp: each doc
  * wraps a generated body in the qt44 markup (title/style/script/
  * comment/entities/nav) and carries a qt45-style messy URL; 25% of
  * URLs are planted garbage (the quarantine class). Corpora land in
  * parquet first, so the measured wall includes the scan but not the
  * generation. `runMain graft.tools.ProfileWebText [outBase]`. */
object ProfileWebText {

  private def buildCorpus(spark: SparkSession, n: Long, out: String): Unit = {
    if (new java.io.File(out).exists()) return // deterministic — reuse
    // body: ~40 seeded pseudo-words from a BODY SEED (md5-derived,
    // cheap, incompressible enough to be an honest regex workload);
    // the seed folds the top decile of ids onto earlier ones, planting
    // ~10% exact body duplicates so the content-dedup stage has real
    // work (URL keys stay id-unique — only the content stage sees them)
    val bodySeed = col("id") % lit(math.max(1L, n * 9 / 10))
    val body = array_join(transform(sequence(lit(0), lit(39)), i =>
      substring(md5(concat(bodySeed.cast("string"), lit(":"), i.cast("string"))),
        1, 7)), " ")
    val html = concat(
      lit("<html><head><title>Doc "), col("id").cast("string"),
      lit("</title><style>p { color: red; }</style><script>var id = \""),
      col("id").cast("string"),
      lit("\"; if (id > 0) { go(); }</script></head><body><!-- boilerplate --><h1>Entry "),
      col("id").cast("string"),
      lit("</h1><p>"), body,
      lit(" &amp; more &lt;escaped&gt;</p><div><a href=\"/home\">Home</a> <a href=\"/next\">Next</a> <a"),
      lit("\n"), lit("href=\"/x\">X</a></div></body></html>"))
    val url =
      when(col("id") % 4 === 0, concat(
        lit("HTTPS://WWW.Site"), (col("id") % 97).cast("string"),
        lit(".COM:443/Page/"), col("id").cast("string"),
        lit("?utm_source=feed&b=2&a=1#top")))
      .when(col("id") % 4 === 1, concat(
        lit("https://www.site"), ((col("id") - 1) % 97).cast("string"),
        lit(".com/Page/"), (col("id") - 1).cast("string"),
        lit("?a=1&b=2&fbclid=X"), col("id").cast("string")))
      .when(col("id") % 4 === 2, concat(
        lit("http://site"), (col("id") % 97).cast("string"),
        lit(".com:80/Item/"), col("id").cast("string")))
      .otherwise(concat(lit("not a url "), col("id").cast("string")))
    spark.range(n).select(col("id").as("doc_id"), html.as("html"), url.as("url"))
      .write.mode("overwrite").parquet(out)
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val outBase = args.headOption.getOrElse("/tmp/graft-webtext")
    val spark = GraftSession.local(appName = "profile-webtext")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    import spark.implicits._

    for (n <- Seq(50000L, 200000L, 800000L)) {
      val dir = s"$outBase/v2-n$n"
      buildCorpus(spark, n, dir)
      val corpus = spark.read.parquet(dir)
      val mb = corpus.agg(sum(length($"html") + length($"url"))).as[Long].head / 1e6

      // stage A: extraction only — a census that forces every byte
      // through the regex chain without collecting text
      meter.reset()
      val (_, tExtract) = timed {
        corpus.select(
            length(WebText.htmlToText($"html")).as("cl"),
            WebText.anchorCount($"html").as("na"),
            WebText.urlCanonicalize($"url").as("cu"))
          .agg(sum($"cl"), sum($"na"), count($"cu"), count(lit(1)))
          .collect()
      }
      val exShuf = (meter.read.get + meter.write.get) / 1e6

      // stage B: the composed qx03-shaped funnel (gate -> url dedup ->
      // content dedup -> verdict census)
      meter.reset()
      val (verdict, tFunnel) = timed {
        val raw = corpus.select($"doc_id",
            WebText.urlCanonicalize($"url").as("canon_url"),
            // the boilerplate-free body key (the qx03 discipline): the
            // generated body sits between <p> and the entity run
            md5(regexp_extract($"html", "<p>(.*?) &amp;", 1)).as("ck"),
            WebText.anchorCount($"html").as("n_anchors"),
            when(length(WebText.htmlToText($"html")) === 0, 0L)
              .otherwise(size(split(WebText.htmlToText($"html"), " ")).cast("long"))
              .as("n_words"))
          .withColumn("gate_passed",
            $"canon_url".isNotNull && $"n_words" >= 10 && $"n_anchors" * 5 <= $"n_words")
          .localCheckpoint()
        val passed = raw.filter($"gate_passed")
        val u = passed.select($"doc_id", $"ck",
            min($"doc_id").over(org.apache.spark.sql.expressions.Window
              .partitionBy($"canon_url")).as("uk"))
          .select($"doc_id", $"ck",
            when($"uk" =!= $"doc_id", $"uk").as("url_dup_of"))
          .localCheckpoint()
        val c = u.filter($"url_dup_of".isNull)
          .select($"doc_id", min($"doc_id").over(
            org.apache.spark.sql.expressions.Window.partitionBy($"ck")).as("ckp"))
          .select($"doc_id", when($"ckp" =!= $"doc_id", $"ckp").as("content_dup_of"))
        raw.select($"doc_id", $"gate_passed")
          .join(u.select($"doc_id", $"url_dup_of"), Seq("doc_id"), "left")
          .join(c, Seq("doc_id"), "left")
          .agg(count(lit(1)).as("n"),
            sum($"gate_passed".cast("long")).as("gated"),
            sum($"url_dup_of".isNotNull.cast("long")).as("url_dups"),
            sum($"content_dup_of".isNotNull.cast("long")).as("content_dups"))
          .as[(Long, Long, Long, Long)].head()
      }
      val fnShuf = (meter.read.get + meter.write.get) / 1e6

      val (nAll, gated, urlDups, contentDups) = verdict
      val quarantined = nAll - corpus.filter(WebText.urlCanonicalize($"url").isNotNull).count()
      assert(quarantined == (n + 3) / 4, // ids ≡ 3 (mod 4) are the planted non-URLs
        s"quarantine must equal the planted non-URL mass: $quarantined vs ${(n + 3) / 4}")
      println(f"[webtext] n=$n%7d  ${mb}%8.1f MB  extract ${tExtract}%6.2f s " +
        f"(${mb / tExtract}%6.1f MB/s, shuf ${exShuf}%6.2f MB)  " +
        f"funnel ${tFunnel}%6.2f s (shuf ${fnShuf}%7.2f MB = ${fnShuf * 1e6 / nAll}%5.1f B/doc)  " +
        f"gated $gated%7d urlDups $urlDups%7d contentDups $contentDups%3d")
    }
    spark.stop()
  }
}
