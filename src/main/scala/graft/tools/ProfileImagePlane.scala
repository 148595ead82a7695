package graft.tools

import graft.GraftSession
import graft.operators.{IncrementalHashDedup, Multimodal}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fleet-scale drive of the PRODUCTION image pipeline — the multimodal
  * twin of [[ProfileE1]] (round-11 verdict item #1). The gate's qm
  * queries run the oracle-replayable stub hashes by necessity (DuckDB
  * cannot decode JPEG); this main measures the real-codec path the
  * stubs stand in for:
  *
  *   parquet binary column → [[Multimodal.withPerceptualHash]]
  *   (ImageIO decode + [[Multimodal.dhash64]], FailSoft nulls) →
  *   [[Multimodal.hashNearDup]] (batch funnel) →
  *   [[IncrementalHashDedup.dedupBatch]] (wave-ingested store)
  *
  * over a GENERATED corpus of real PNGs/JPEGs with planted ground
  * truth: ~70% unique base images (seeded smooth cosine fields —
  * photo-like, hash-diverse; see [[drawBase]]), ~25% planted
  * near-duplicates (the base redrawn, rescaled bilinear to a different
  * resolution and re-encoded with the other codec / JPEG quality),
  * ~2% JPEG re-encodes of the base at a lower quality, ~3% corrupted
  * payloads (truncated PNG, random bytes, empty — the FailSoft
  * quarantine class).
  *
  * Measured per size (default sweep 5k → 20k → 100k): generation wall
  * (excluded from pipeline throughput), decode-meta wall, decode+hash
  * wall (images/s — THE decode throughput number), quarantine rate,
  * batch funnel wall, batch precision/recall against the planted
  * clusters, and the 4-wave incremental ingest (per-wave wall, store
  * growth, incremental precision/recall with wave-aware expectations:
  * the first-arriving cluster member must NOT flag).
  *
  * Honesty box: corpus lives on local disk; at 100 TB the binary
  * column arrives from object storage, so the measured number is the
  * ENGINE-side ceiling (decode+hash CPU), which is the knee this
  * pipeline is expected to sit on — hashing is ~100% CPU once bytes
  * arrive, and the funnel moves only 8-byte hashes.
  *
  * `runMain graft.tools.ProfileImagePlane [sizes] [workDir]`
  * sizes = comma list, default `5000,20000,100000`.
  */
object ProfileImagePlane {

  import java.awt.image.BufferedImage
  import java.awt.RenderingHints
  import java.io.ByteArrayOutputStream
  import javax.imageio.ImageIO

  final case class GenImage(img_id: Long, kind: String,
                            dup_of_truth: Option[Long], bytes: Array[Byte])

  /** Deterministic structurally-diverse base image: a smooth random
    * luma field (sum of 10 seeded low-frequency 2-D cosines) with a
    * seeded color tint. Smoothness is deliberate and matters twice:
    * flat-color synthetic shapes make adjacent dHash grid cells tie
    * EXACTLY, so any rescale/JPEG jitter flips the comparison
    * (measured: rectangles-on-gradient corpora put only ~60% of
    * rescaled copies within hamming 6), while a low-frequency field —
    * like a natural photo — separates adjacent cell means by tens of
    * luma units, far above resampling noise. Random phases/frequencies
    * make distinct bases' delta-sign patterns independent (measured
    * min cross-pair hamming >> threshold). */
  private def drawBase(baseId: Long, w: Int, h: Int): BufferedImage = {
    val rnd = new java.util.Random(baseId * 0x9e3779b97f4a7c15L + 13)
    val k = 10
    val fx = Array.fill(k)(0.5 + 4.0 * rnd.nextDouble())
    val fy = Array.fill(k)(0.5 + 4.0 * rnd.nextDouble())
    val ph = Array.fill(k)(2 * math.Pi * rnd.nextDouble())
    val amp = Array.fill(k)(10.0 + 20.0 * rnd.nextDouble())
    val (tr, tg, tb) = (0.7 + 0.6 * rnd.nextDouble(), 0.7 + 0.6 * rnd.nextDouble(),
      0.7 + 0.6 * rnd.nextDouble())
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = 128.0
        var j = 0
        while (j < k) {
          v += amp(j) * math.cos(2 * math.Pi * (fx(j) * x / w + fy(j) * y / h) + ph(j))
          j += 1
        }
        def clamp(d: Double) = math.max(0, math.min(255, math.rint(d).toInt))
        img.setRGB(x, y, (clamp(v * tr) << 16) | (clamp(v * tg) << 8) | clamp(v * tb))
        x += 1
      }
      y += 1
    }
    img
  }

  private def rescale(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageWriteParam}
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private val BaseW = 96
  private val BaseH = 64

  // DiagHash hooks: the exact payloads the corpus plants, one image at a time
  private[graft] def debugPng(i: Long): Array[Byte] = encodePng(drawBase(i, BaseW, BaseH))
  private[graft] def debugVariant(i: Long): Array[Byte] = {
    val scale = Seq((64, 43), (128, 85), (192, 128), (48, 32))((i % 4).toInt)
    val v = rescale(drawBase(i, BaseW, BaseH), scale._1, scale._2)
    if (i % 2 == 0) encodePng(v) else encodeJpeg(v, 0.85f)
  }
  private[graft] def debugReenc(i: Long): Array[Byte] = encodeJpeg(drawBase(i, BaseW, BaseH), 0.7f)

  /** id → payload. Split: [0, nBases) bases; [nBases, nBases+nDups)
    * rescaled+re-encoded variants; then JPEG re-encodes; last slice
    * corrupted. Every variant redraws its base deterministically, so
    * generation is row-independent (no cross-row reads). */
  private def payloadFor(id: Long, n: Long): GenImage = {
    val nBases = (n * 70) / 100
    val nDups = (n * 25) / 100
    val nReenc = (n * 2) / 100
    if (id < nBases) {
      val img = drawBase(id, BaseW, BaseH)
      val bytes = if (id % 5 == 0) encodeJpeg(img, 0.9f) else encodePng(img)
      GenImage(id, "base", None, bytes)
    } else if (id < nBases + nDups) {
      val base = (id - nBases) % nBases
      val img = drawBase(base, BaseW, BaseH)
      // rescale to one of several resolutions, flip the codec
      val scale = Seq((64, 43), (128, 85), (192, 128), (48, 32))((id % 4).toInt)
      val v = rescale(img, scale._1, scale._2)
      val bytes = if (id % 2 == 0) encodePng(v) else encodeJpeg(v, 0.85f)
      GenImage(id, "dup", Some(base), bytes)
    } else if (id < nBases + nDups + nReenc) {
      val base = (id - nBases - nDups) % nBases
      GenImage(id, "reenc", Some(base), encodeJpeg(drawBase(base, BaseW, BaseH), 0.7f))
    } else {
      val rnd = new java.util.Random(id)
      val bytes = (id % 3) match {
        case 0 => Array.emptyByteArray
        case 1 => val b = new Array[Byte](512); rnd.nextBytes(b); b
        case _ => // torn PNG: valid magic, truncated body
          val whole = encodePng(drawBase(id, BaseW, BaseH))
          java.util.Arrays.copyOf(whole, 120)
      }
      GenImage(id, "corrupt", None, bytes)
    }
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("5000,20000,100000")
      .split(",").map(_.trim.toLong).toSeq
    val work = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("profile-imageplane").toString)
    val spark = GraftSession.local(appName = "profile-imageplane")
    import spark.implicits._

    val summary = scala.collection.mutable.ArrayBuffer.empty[String]

    sizes.foreach { n =>
      println(s"\n[img] ===== corpus size $n =====")
      val walls = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def timed[T](stage: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        val s = (System.nanoTime() - t0) / 1e9
        walls(stage) = s
        println(f"[img] $stage%-16s ${s}%8.2f s  (${n / s}%9.1f img/s, ${s * 1e6 / n}%8.1f us/img)")
        r
      }

      val corpusDir = s"$work/corpus_$n"
      // ---- generation (excluded from pipeline throughput) ----
      timed("generate") {
        spark.range(n).repartition(64)
          .mapPartitions(_.map(id => payloadFor(id, n)))
          .write.mode("overwrite").parquet(corpusDir)
      }
      val corpus = spark.read.parquet(corpusDir)

      // ---- decode meta (pure ImageIO decode, FailSoft) ----
      val quarantined = timed("decode-meta") {
        val meta = Multimodal.withImageMeta(corpus, "bytes",
          Multimodal.FailSoft(Multimodal.ImageIoDecoder))
        meta.filter($"image_meta.width" < 0).count()
      }
      val nCorrupt = corpus.filter($"kind" === "corrupt").count()
      println(s"[img] quarantined=$quarantined planted-corrupt=$nCorrupt " +
        s"(rate ${"%.2f".format(100.0 * quarantined / n)}%)")

      // ---- decode + perceptual hash (the production hashing scan) ----
      val hashes = timed("decode+hash") {
        val h = Multimodal.withPerceptualHash(corpus, "bytes")
          .select($"img_id", $"kind", $"dup_of_truth", $"phash64")
          .localCheckpoint(true)
        h.count()
        h
      }
      val nullHashes = hashes.filter($"phash64".isNull).count()
      require(nullHashes == quarantined,
        s"null-hash count $nullHashes != quarantine count $quarantined")

      // truth clusters over decodable images
      val truth = hashes.filter($"phash64".isNotNull)
        .select($"img_id", coalesce($"dup_of_truth", $"img_id").as("cluster"))
        .localCheckpoint(true)

      // ---- batch funnel ----
      val decisions = timed("batch-funnel") {
        val d = Multimodal.hashNearDup(
          hashes.filter($"phash64".isNotNull).select($"img_id", $"phash64"),
          "img_id", "phash64", bands = 8, bandBits = 8, maxHamming = 6)
          .localCheckpoint(true)
        d.count()
        d
      }

      def evalDecisions(dec: DataFrame, expected: DataFrame, label: String): Unit = {
        // expected: (img_id, should_flag) over decodable images
        val t = truth
        val joined = dec.select($"img_id", $"dup_of")
          .join(t, "img_id")
          .join(t.select($"img_id".as("dup_of"), $"cluster".as("dup_cluster")),
            Seq("dup_of"), "left")
          .join(expected, "img_id")
        val agg = joined.agg(
          count(when($"dup_of".isNotNull, 1)).as("flagged"),
          count(when($"dup_of".isNotNull && $"cluster" === $"dup_cluster", 1)).as("tp"),
          count(when($"dup_of".isNotNull && $"cluster" =!= $"dup_cluster", 1)).as("fp"),
          count(when($"should_flag", 1)).as("expected")).head()
        val (flagged, tp, fp, exp) =
          (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
        val prec = if (flagged == 0) 1.0 else tp.toDouble / flagged
        val rec = if (exp == 0) 1.0 else tp.toDouble / exp
        println(f"[img] $label: flagged=$flagged tp=$tp fp=$fp expected=$exp " +
          f"precision=$prec%.4f recall=$rec%.4f")
        summary += f"""{"n":$n,"mode":"$label","flagged":$flagged,"tp":$tp,"fp":$fp,"expected":$exp,"precision":$prec%.4f,"recall":$rec%.4f}"""
      }

      // batch expectation: any decodable image whose cluster has a
      // smaller decodable id must flag (hashNearDup's dup_of points to
      // a smaller id)
      val wMin = org.apache.spark.sql.expressions.Window.partitionBy($"cluster")
      val batchExpected = truth
        .withColumn("should_flag", $"img_id" > min($"img_id").over(wMin))
        .select($"img_id", $"should_flag")
      evalDecisions(decisions, batchExpected, "batch")

      // ---- MIH wide-band funnel: 4 x 16-bit bands, hamming <= 7 ----
      // (hashNearDupMih) — wider buckets AND a larger guaranteed
      // radius than the 8x8 narrow split; the dHash tail measured at
      // hamming 7-8 comes back into reach
      val decisionsMih = timed("funnel-mih") {
        val d = Multimodal.hashNearDupMih(
          hashes.filter($"phash64".isNotNull).select($"img_id", $"phash64"),
          "img_id", "phash64", bands = 4, bandBits = 16, maxHamming = 7)
          .localCheckpoint(true)
        d.count()
        d
      }
      evalDecisions(decisionsMih, batchExpected, "batch-mih")

      // ---- incremental: 4 waves through the hamming store ----
      val store = s"$work/store_$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      IncrementalHashDedup.initStore(
        hashes.filter($"phash64".isNotNull).limit(0), store,
        idCol = "img_id", hashCol = "phash64")
      val nWaves = 4
      val waveDecisions = (0 until nWaves).map { wv =>
        val wave = hashes.filter($"phash64".isNotNull && $"img_id" % nWaves === wv)
        val d = timed(s"incr-wave$wv") {
          val dd = IncrementalHashDedup.dedupBatch(wave, store,
            bands = 8, bandBits = 8, maxHamming = 6,
            idCol = "img_id", hashCol = "phash64")
          dd.count()
          dd
        }
        d.withColumn("wave", lit(wv))
      }.reduce(_ unionByName _)
      val storeRows = spark.read.parquet(store).count()
      println(s"[img] store rows after $nWaves waves: $storeRows (8 B/hash + id)")

      // incremental expectation: flag iff some cluster mate precedes in
      // (wave, id) order — the first-arriving member must stay unique
      val wvOf = truth.withColumn("wave", ($"img_id" % nWaves).cast("int"))
      val wMinArr = org.apache.spark.sql.expressions.Window.partitionBy($"cluster")
      val expectedIncr = wvOf.withColumn("arr", struct($"wave", $"img_id"))
        .withColumn("should_flag", $"arr" =!= min($"arr").over(wMinArr))
        .select($"img_id", $"should_flag")
      evalDecisions(waveDecisions.select($"img_id", $"dup_of"), expectedIncr, "incremental")

      val pipeline = walls.filter(_._1 != "generate").values.sum
      println(f"[img] PIPELINE TOTAL (decode-meta+hash+funnel+incr): $pipeline%8.2f s = ${n / pipeline}%9.1f img/s")
      summary += s"""{"n":$n,""" +
        walls.map { case (k, v) => s""""$k":${math.rint(v * 100) / 100}""" }.mkString(",") +
        s""","us_per_img_hash":${math.rint(walls("decode+hash") * 1e8 / n) / 100}}"""
    }

    println("\n[img] ==== summary ====")
    summary.foreach(println)
    spark.stop()
  }
}
