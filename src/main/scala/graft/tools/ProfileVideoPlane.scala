package graft.tools

import graft.GraftSession
import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fleet-scale drive of the PRODUCTION video pipeline — the last
  * modality's twin of [[ProfileImagePlane]] (image, 100k) and
  * [[ProfileAudioPlane]] (audio, 100k): real YUV4MPEG2 payloads through
  *
  *   [[Multimodal.withVideoMeta]] (Y4M parse, FailSoftVideo) →
  *   [[Multimodal.videoFrames]] (frame sample, partition-local
  *   explode) → per-frame [[Multimodal.dhash64]]
  *   ([[Multimodal.withPerceptualHash]]) →
  *   [[Multimodal.frameVoteNearDup]] (all-pairs hamming funnel +
  *   distinct-frame vote), narrow AND MIH band regimes →
  *   a 4-wave incremental ingest over a frame-hash store
  *   ([[Multimodal.frameHashPairs]] probing batch frames against the
  *   stored history — the store side never fans out, the qm09 shape).
  *
  * Corpus with planted ground truth: ~70% unique bases (24-frame
  * 64×48 clips of seeded temporally-drifting cosine luma fields — the
  * image plane's smoothness lesson extended in time: adjacent frames
  * hash within a couple of bits, frames far apart diverge), ~10%
  * RESCALED copies (same field rendered at 80×56 or 48×32 — dHash's
  * scale robustness), ~10% RE-ENCODED copies (luma quantized to even
  * values — the lossy-codec stand-in), ~5% TRUNCATED copies (first
  * half of the frames — the vote threshold's boundary case: when the
  * full-length base arrives after its truncated twin, exactly half the
  * base's sampled frames can match, and voteFrac = 0.5 must still
  * flag), ~5% corrupted payloads (empty, random bytes, torn mid-frame
  * — the FailSoftVideo quarantine class).
  *
  * Measured per size: generation wall (excluded), meta-parse wall,
  * frames+hash wall (per clip AND per sampled frame — THE decode
  * knee), quarantine exactness, both batch funnels' wall + SHUFFLE
  * read/write (the frame-explosion shuffle mass: only ids + 8-byte
  * hashes may ride — media bytes never shuffle), batch P/R against
  * planted clusters, and the 4-wave incremental P/R with wave-aware
  * expectations (first-arriving cluster member must stay unique).
  *
  * `runMain graft.tools.ProfileVideoPlane [sizes] [workDir]`
  * sizes default `2000,10000,30000`.
  */
object ProfileVideoPlane {

  final case class GenClip(clip_id: Long, kind: String,
                           dup_of_truth: Option[Long], bytes: Array[Byte])

  private val BaseW = 64
  private val BaseH = 48
  private val BaseFrames = 24
  private val SampleFrames = 8

  /** Seeded temporally-smooth luma field: 10 low-frequency 2-D cosines
    * whose phases drift ≤ π/3 over the 24-frame clip (≤ π/72 per
    * frame), in NORMALIZED spatial coordinates so a rescaled render
    * shows the same content. The time axis is the absolute frame index
    * over the BASE length, so a truncated copy's frame t is
    * bit-identical in content to the base's frame t. */
  private final case class Field(fx: Array[Double], fy: Array[Double],
                                 ph: Array[Double], dr: Array[Double],
                                 amp: Array[Double]) {
    def luma(x: Int, y: Int, t: Int, w: Int, h: Int, quantize: Boolean): Int = {
      var v = 128.0
      var j = 0
      while (j < fx.length) {
        v += amp(j) * math.cos(2 * math.Pi * (fx(j) * x / w + fy(j) * y / h) +
          ph(j) + dr(j) * t / BaseFrames.toDouble)
        j += 1
      }
      val c = math.max(0, math.min(255, math.rint(v).toInt))
      if (quantize) c & ~1 else c
    }
  }

  private def fieldFor(baseId: Long): Field = {
    val rnd = new java.util.Random(baseId * 0x9e3779b97f4a7c15L + 29)
    val k = 10
    Field(
      fx = Array.fill(k)(0.5 + 4.0 * rnd.nextDouble()),
      fy = Array.fill(k)(0.5 + 4.0 * rnd.nextDouble()),
      ph = Array.fill(k)(2 * math.Pi * rnd.nextDouble()),
      dr = Array.fill(k)((2 * rnd.nextDouble() - 1) * math.Pi / 3),
      amp = Array.fill(k)(10.0 + 20.0 * rnd.nextDouble()))
  }

  /** Real Y4M payload of the base field: header + FRAME markers +
    * planar C420 (neutral chroma — BT.601 inversion reproduces the
    * luma exactly, as MultimodalAvSpec pins). */
  private[graft] def y4mClip(baseId: Long, w: Int = BaseW, h: Int = BaseH,
                             nFrames: Int = BaseFrames,
                             quantize: Boolean = false): Array[Byte] = {
    val f = fieldFor(baseId)
    val bos = new java.io.ByteArrayOutputStream(
      nFrames * (w * h * 3 / 2 + 6) + 64)
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    val chroma = new Array[Byte]((w / 2) * (h / 2))
    java.util.Arrays.fill(chroma, 128.toByte)
    var t = 0
    while (t < nFrames) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          bos.write(f.luma(x, y, t, w, h, quantize))
          x += 1
        }
        y += 1
      }
      bos.write(chroma); bos.write(chroma)
      t += 1
    }
    bos.toByteArray
  }

  /** id → payload. Split: 70% bases, 10% rescaled, 10% re-encoded
    * (luma-quantized), 5% truncated (first half of the frames), 5%
    * corrupted. Row-independent generation. */
  private def payloadFor(id: Long, n: Long): GenClip = {
    val nBases = (n * 70) / 100
    val nRescale = (n * 10) / 100
    val nReenc = (n * 10) / 100
    val nTrunc = (n * 5) / 100
    if (id < nBases) GenClip(id, "base", None, y4mClip(id))
    else if (id < nBases + nRescale) {
      val base = (id - nBases) % nBases
      val (w, h) = if (id % 2 == 0) (80, 56) else (48, 32)
      GenClip(id, "rescale", Some(base), y4mClip(base, w, h))
    } else if (id < nBases + nRescale + nReenc) {
      val base = (id - nBases - nRescale) % nBases
      GenClip(id, "reenc", Some(base), y4mClip(base, quantize = true))
    } else if (id < nBases + nRescale + nReenc + nTrunc) {
      val base = (id - nBases - nRescale - nReenc) % nBases
      GenClip(id, "trunc", Some(base), y4mClip(base, nFrames = BaseFrames / 2))
    } else {
      val rnd = new java.util.Random(id)
      val bytes = (id % 3) match {
        case 0 => Array.emptyByteArray
        case 1 => val b = new Array[Byte](512); rnd.nextBytes(b); b
        case _ => // torn Y4M: valid header, truncated mid-frame
          java.util.Arrays.copyOf(y4mClip(id, nFrames = 2), 700)
      }
      GenClip(id, "corrupt", None, bytes)
    }
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("2000,10000,30000")
      .split(",").map(_.trim.toLong).toSeq
    val work = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("profile-videoplane").toString)
    val spark = GraftSession.local(appName = "profile-videoplane")
    import spark.implicits._
    val meter = new ProfileScaleFamily.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val summary = scala.collection.mutable.ArrayBuffer.empty[String]

    sizes.foreach { n =>
      println(s"\n[vid] ===== corpus size $n =====")
      val walls = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def timed[T](stage: String)(f: => T): T = {
        meter.reset()
        val t0 = System.nanoTime(); val r = f
        val s = (System.nanoTime() - t0) / 1e9
        walls(stage) = s
        println(f"[vid] $stage%-16s ${s}%8.2f s  (${n / s}%9.1f clip/s, " +
          f"${s * 1e6 / n}%8.1f us/clip, shuf rd/wr ${meter.read.get / 1e6}%.1f/${meter.write.get / 1e6}%.1f MB)")
        r
      }

      val corpusDir = s"$work/corpus_$n"
      timed("generate") {
        spark.range(n).repartition(64)
          .mapPartitions(_.map(id => payloadFor(id, n)))
          .write.mode("overwrite").parquet(corpusDir)
      }
      val corpus = spark.read.parquet(corpusDir)

      // ---- meta parse (Y4M header + frame offsets, FailSoft) ----
      val quarantined = timed("meta-parse") {
        Multimodal.withVideoMeta(corpus, "bytes")
          .filter($"video_meta.width" < 0).count()
      }
      val nCorrupt = corpus.filter($"kind" === "corrupt").count()
      println(s"[vid] quarantined=$quarantined planted-corrupt=$nCorrupt " +
        s"(${"%.2f".format(100.0 * quarantined / n)}%)")
      require(quarantined == nCorrupt, s"quarantine $quarantined != planted $nCorrupt")

      // ---- frame sample + per-frame perceptual hash (the decode knee) ----
      val hashed = timed("frames+hash") {
        val frames = Multimodal.videoFrames(corpus, "bytes", "clip_id",
          n = SampleFrames)
        val h = Multimodal.withPerceptualHash(frames, "frame", "fhash")
          .select($"media_id".as("clip_id"), $"frame_idx", $"fhash")
          .filter($"fhash".isNotNull)
          .localCheckpoint(true)
        h.count()
        h
      }
      val nFramesTotal = hashed.count()
      println(f"[vid] hashed frames: $nFramesTotal (${walls("frames+hash") * 1e6 / nFramesTotal}%6.1f us/frame)")

      val truth = corpus.select($"clip_id",
          coalesce($"dup_of_truth", $"clip_id").as("cluster"))
        .join(hashed.select($"clip_id").distinct(), "clip_id")
        .localCheckpoint(true)

      def evalDecisions(dec: DataFrame, expected: DataFrame, label: String): Unit = {
        val joined = dec.select($"clip_id", $"dup_of")
          .join(truth, "clip_id")
          .join(truth.select($"clip_id".as("dup_of"), $"cluster".as("dup_cluster")),
            Seq("dup_of"), "left")
          .join(expected, "clip_id")
        val agg = joined.agg(
          count(when($"dup_of".isNotNull, 1)).as("flagged"),
          count(when($"dup_of".isNotNull && $"cluster" === $"dup_cluster", 1)).as("tp"),
          count(when($"should_flag", 1)).as("expected")).head()
        val (flagged, tp, exp) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
        val prec = if (flagged == 0) 1.0 else tp.toDouble / flagged
        val rec = if (exp == 0) 1.0 else tp.toDouble / exp
        println(f"[vid] $label: flagged=$flagged tp=$tp expected=$exp " +
          f"precision=$prec%.4f recall=$rec%.4f")
        summary += f"""{"n":$n,"mode":"$label","flagged":$flagged,"tp":$tp,"expected":$exp,"precision":$prec%.4f,"recall":$rec%.4f}"""
      }

      val wMin = org.apache.spark.sql.expressions.Window.partitionBy($"cluster")
      val batchExpected = truth
        .withColumn("should_flag", $"clip_id" > min($"clip_id").over(wMin))
        .select($"clip_id", $"should_flag")

      // ---- batch vote funnel, narrow 8x8 regime (hamming <= 6) ----
      val decisions = timed("vote-narrow") {
        val d = Multimodal.frameVoteNearDup(hashed, "clip_id", "frame_idx",
          "fhash", bands = 8, bandBits = 8, maxHamming = 6, voteFrac = 0.5)
          .localCheckpoint(true)
        d.count()
        d
      }
      evalDecisions(decisions, batchExpected, "batch-narrow")

      // ---- batch vote funnel, MIH 4x16 regime (hamming <= 7) ----
      val decisionsMih = timed("vote-mih") {
        val d = Multimodal.frameVoteNearDup(hashed, "clip_id", "frame_idx",
          "fhash", bands = 4, bandBits = 16, maxHamming = 7, voteFrac = 0.5,
          probeTolerance = 1)
          .localCheckpoint(true)
        d.count()
        d
      }
      evalDecisions(decisionsMih, batchExpected, "batch-mih")

      // ---- cannot-judge sentinel: corrupt clips report n_frames=0 ----
      val full = Multimodal.videoNearDup(corpus, "bytes", "clip_id",
        nFrames = SampleFrames, bands = 8, bandBits = 8, maxHamming = 6)
      val sentinels = full.filter($"n_frames" === 0).count()
      require(sentinels == nCorrupt,
        s"cannot-judge sentinel rows $sentinels != planted corrupt $nCorrupt")

      // ---- incremental: 4 waves through the PRODUCTION frame store ----
      // IncrementalFrameDedup: each wave's frames probe the stored
      // history (store side exact-banded — the side that grows forever
      // never fans out) plus the wave's own smaller-clip frames, then
      // the same distinct-frame vote decides; unique clips' frames
      // append.
      val store = s"$work/framestore_$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      graft.operators.IncrementalFrameDedup.initStore(hashed.limit(0), store)
      val nWaves = 4
      val waveDecisions = (0 until nWaves).map { wv =>
        val wave = hashed.filter($"clip_id" % nWaves === wv)
        val d = timed(s"incr-wave$wv") {
          val dd = graft.operators.IncrementalFrameDedup.dedupBatch(
            wave, store, bands = 8, bandBits = 8, maxHamming = 6,
            voteFrac = 0.5)
          dd.count()
          dd
        }
        d.withColumn("wave", lit(wv))
      }.reduce(_ unionByName _)
      val storeRows = spark.read.parquet(store).count()
      println(s"[vid] frame store rows after $nWaves waves: $storeRows")

      val wvOf = truth.withColumn("wave", ($"clip_id" % nWaves).cast("int"))
      val expectedIncr = wvOf.withColumn("arr", struct($"wave", $"clip_id"))
        .withColumn("should_flag", $"arr" =!= min($"arr").over(wMin))
        .select($"clip_id", $"should_flag")
      evalDecisions(waveDecisions.select($"clip_id", $"dup_of"),
        expectedIncr, "incremental")

      // ---- incremental, MIH store mode (4 x 16-bit, hamming <= 6) ----
      // The regime CONTRAST, not a presumed fix: on uniform hashes
      // (ProfileMihStore, xxhash64 draws) wide buckets win at multi-M
      // stores; on REAL perceptual hashes band keys are highly
      // non-uniform (smooth fields concentrate few key values), so
      // candidate volume follows the key-occupancy second moment and
      // the MIH probe fan-out (x17/band) multiplies into the same hot
      // buckets — measured at 100k clips: MIH waves ~2.6x the narrow
      // walls, same decisions. Both regimes grow ~linearly with the
      // store's resident near-dup mass (the verify-bound price of
      // recall 1.0); pick the regime by measured band-key occupancy.
      val storeMih = s"$work/framestore_mih_$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(storeMih))
      graft.operators.IncrementalFrameDedup.initStore(hashed.limit(0), storeMih)
      val waveDecisionsMih = (0 until nWaves).map { wv =>
        val wave = hashed.filter($"clip_id" % nWaves === wv)
        val d = timed(s"incr-mih-wave$wv") {
          val dd = graft.operators.IncrementalFrameDedup.dedupBatch(
            wave, storeMih, bands = 4, bandBits = 16, maxHamming = 6,
            voteFrac = 0.5, probeTolerance = 1)
          dd.count()
          dd
        }
        d.withColumn("wave", lit(wv))
      }.reduce(_ unionByName _)
      evalDecisions(waveDecisionsMih.select($"clip_id", $"dup_of"),
        expectedIncr, "incremental-mih")

      val pipeline = walls.filter(_._1 != "generate").values.sum
      println(f"[vid] PIPELINE TOTAL (meta+hash+funnels+incr): $pipeline%8.2f s = ${n / pipeline}%9.1f clip/s")
      summary += s"""{"n":$n,""" +
        walls.map { case (k, v) => s""""$k":${math.rint(v * 100) / 100}""" }.mkString(",") +
        s""","us_per_clip_hash":${math.rint(walls("frames+hash") * 1e8 / n) / 100}}"""
      // release this size's pinned localCheckpoint blocks before the
      // next size measures: the checkpointed frames/decisions become
      // unreachable here, but ContextCleaner only drops their blocks
      // after a GC cycle — without this, block pressure from earlier
      // sizes distorted later incremental-wave walls by up to 10x
      // (measured: 30k wave3 at 31.9 s inside a 4-size sweep vs 2.4 s
      // isolated, identical shuffle volumes)
      System.gc()
      Thread.sleep(2000)
      System.gc()
    }

    println("\n[vid] ==== summary ====")
    summary.foreach(println)
    spark.stop()
  }
}
