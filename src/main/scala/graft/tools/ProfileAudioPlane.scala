package graft.tools

import graft.GraftSession
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Fleet-scale drive of the PRODUCTION audio pipeline — the audio twin
  * of [[ProfileImagePlane]]: real WAV payloads through
  * `JvmAudioDecoder`/`FailSoftAudio` → [[Multimodal.audioFingerprint]]
  * (decode + windowed RMS + delta-sign chain) →
  * [[Multimodal.hashNearDup]] over the 32-bit fingerprint.
  *
  * Corpus with planted ground truth: ~70% unique bases
  * (amplitude-modulated sines, seeded envelope+carrier per id — window
  * RMS deltas far above 16-bit quantization noise), ~20% GAIN-SCALED
  * copies (fingerprint-identical by the operator's invariance —
  * planted hamming 0), ~5% noised copies (±2% envelope white noise —
  * near-dup, small hamming), ~5% corrupted payloads (garbage bytes,
  * empty, truncated WAV — the FailSoftAudio quarantine class).
  *
  * Measured per size: generation wall (excluded), decode+fingerprint
  * wall (clips/s — the decode knee), quarantine rate vs planted,
  * funnel wall, precision/recall vs the planted clusters. windowSize
  * 512 keeps clips at 34 windows ≈ 17.4k samples (2.2 s at 8 kHz) so
  * the corpus stays disk-friendly; the per-clip cost scales with
  * samples decoded, reported per-sample too.
  *
  * `runMain graft.tools.ProfileAudioPlane [sizes] [workDir]`
  * sizes default `5000,20000,100000`.
  */
object ProfileAudioPlane {

  final case class GenClip(clip_id: Long, kind: String,
                           dup_of_truth: Option[Long], bytes: Array[Byte])

  private val SampleRate = 8000
  private val WindowSize = 512
  private val NSamples = 66 * WindowSize // enough windows for the 64-bit width

  /** 16-bit mono WAV: seeded multi-sinusoid AM envelope × seeded
    * carrier, optional gain and white noise. The envelope is a sum of
    * FIVE seeded sinusoids (1–16 periods per clip): a single smooth
    * envelope gives only ~2·envF delta-sign changes across 33 windows,
    * collapsing the 32-bit fingerprint space onto a few up/down-run
    * patterns (measured: precision 0.02 at 14k bases) — the audio twin
    * of the flat-rectangles image-corpus lesson. Rich envelopes make
    * distinct bases' sign patterns independent. */
  private def amWav(seed: Long, gain: Double, noise: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val rnd = new java.util.Random(seed * 0x9e3779b97f4a7c15L + 5)
    val k = 5
    val fs = Array.fill(k)(1.0 + 15.0 * rnd.nextDouble())
    val as = Array.fill(k)(0.3 + rnd.nextDouble())
    val phs = Array.fill(k)(2 * math.Pi * rnd.nextDouble())
    val norm = as.sum
    val carrier = 200 + rnd.nextInt(1800)
    val nrnd = new java.util.Random(seed ^ 0x5DEECE66DL)
    val buf = new Array[Byte](NSamples * 2)
    var i = 0
    while (i < NSamples) {
      var s = 0.0
      var j = 0
      while (j < k) {
        s += as(j) * math.sin(2 * math.Pi * fs(j) * i / NSamples + phs(j))
        j += 1
      }
      val env = 0.15 + 0.8 * (s / norm + 1) / 2
      val n = if (noise > 0) noise * (2 * nrnd.nextDouble() - 1) else 0.0
      val v = ((gain * env + n) * math.sin(2 * math.Pi * carrier * i / SampleRate) * 32767).toInt
      val c = math.max(-32768, math.min(32767, v))
      buf(i * 2) = (c & 0xff).toByte
      buf(i * 2 + 1) = ((c >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(buf), fmt, NSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def payloadFor(id: Long, n: Long): GenClip = {
    val nBases = (n * 70) / 100
    val nGain = (n * 20) / 100
    val nNoise = (n * 5) / 100
    if (id < nBases) GenClip(id, "base", None, amWav(id, 1.0, 0.0))
    else if (id < nBases + nGain) {
      val base = (id - nBases) % nBases
      GenClip(id, "gain", Some(base), amWav(base, 0.3 + 0.05 * (id % 8), 0.0))
    } else if (id < nBases + nGain + nNoise) {
      val base = (id - nBases - nGain) % nBases
      GenClip(id, "noise", Some(base), amWav(base, 1.0, 0.02))
    } else {
      val rnd = new java.util.Random(id)
      val bytes = (id % 3) match {
        case 0 => Array.emptyByteArray
        case 1 => val b = new Array[Byte](256); rnd.nextBytes(b); b
        case _ => java.util.Arrays.copyOf(amWav(id, 1.0, 0.0), 60) // torn WAV header
      }
      GenClip(id, "corrupt", None, bytes)
    }
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("5000,20000,100000")
      .split(",").map(_.trim.toLong).toSeq
    val work = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("profile-audioplane").toString)
    val spark = GraftSession.local(appName = "profile-audioplane")
    import spark.implicits._

    sizes.foreach { n =>
      println(s"\n[aud] ===== corpus size $n =====")
      val walls = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def timed[T](stage: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        val s = (System.nanoTime() - t0) / 1e9
        walls(stage) = s
        println(f"[aud] $stage%-16s ${s}%8.2f s  (${n / s}%9.1f clip/s, ${s * 1e6 / n}%8.1f us/clip)")
        r
      }

      val corpusDir = s"$work/corpus_$n"
      timed("generate") {
        spark.range(n).repartition(64)
          .mapPartitions(_.map(id => payloadFor(id, n)))
          .write.mode("overwrite").parquet(corpusDir)
      }
      val corpus = spark.read.parquet(corpusDir)

      val fps = timed("decode+fp") {
        val f = Multimodal.audioFingerprint(corpus, "bytes", "clip_id",
            windowSize = WindowSize, bits = 32)
          .localCheckpoint(true)
        f.count()
        f
      }
      val fps64 = timed("decode+fp64") {
        val f = Multimodal.audioFingerprint(corpus, "bytes", "clip_id",
            windowSize = WindowSize)
          .localCheckpoint(true)
        f.count()
        f
      }
      val nullFps = fps.filter($"fp".isNull).count()
      val nCorrupt = corpus.filter($"kind" === "corrupt").count()
      println(s"[aud] quarantined=$nullFps planted-corrupt=$nCorrupt " +
        s"(${"%.2f".format(100.0 * nullFps / n)}%)")
      require(nullFps == nCorrupt, s"quarantine $nullFps != planted $nCorrupt")

      val truth = corpus.select($"clip_id".as("media_id"),
          coalesce($"dup_of_truth", $"clip_id").as("cluster"))
        .join(fps.filter($"fp".isNotNull).select($"media_id"), "media_id")
        .localCheckpoint(true)

      val wMin = org.apache.spark.sql.expressions.Window.partitionBy($"cluster")
      val expected = truth
        .withColumn("should_flag", $"media_id" > min($"media_id").over(wMin))
        .select($"media_id", $"should_flag")
      def evalFunnel(label: String, src: org.apache.spark.sql.DataFrame,
                     bandBits: Int): Unit = {
        val decisions = timed(label) {
          val d = Multimodal.hashNearDup(src.filter($"fp".isNotNull),
            "media_id", "fp", bands = 4, bandBits = bandBits, maxHamming = 2)
            .localCheckpoint(true)
          d.count()
          d
        }
        val joined = decisions.select($"media_id", $"dup_of")
          .join(truth, "media_id")
          .join(truth.select($"media_id".as("dup_of"), $"cluster".as("dup_cluster")),
            Seq("dup_of"), "left")
          .join(expected, "media_id")
        val agg = joined.agg(
          count(when($"dup_of".isNotNull, 1)).as("flagged"),
          count(when($"dup_of".isNotNull && $"cluster" === $"dup_cluster", 1)).as("tp"),
          count(when($"should_flag", 1)).as("expected")).head()
        val (flagged, tp, exp) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
        println(f"[aud] $label: flagged=$flagged tp=$tp expected=$exp " +
          f"precision=${tp.toDouble / math.max(1, flagged)}%.4f recall=${tp.toDouble / math.max(1, exp)}%.4f")
      }
      evalFunnel("funnel-fp32", fps, bandBits = 8)
      evalFunnel("funnel-fp64", fps64, bandBits = 16)

      // ---- incremental: 4 waves through the hamming store (fp64) ----
      // the audio twin of the image/video incremental legs: the same
      // 8-byte-per-clip IncrementalHashDedup store serves the 64-bit
      // audio fingerprint; wave-aware expectations (the first-arriving
      // cluster member must stay unique)
      val store = s"$work/store_$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      graft.operators.IncrementalHashDedup.initStore(
        fps64.filter($"fp".isNotNull).limit(0), store,
        idCol = "media_id", hashCol = "fp")
      val nWaves = 4
      val waveDecisions = (0 until nWaves).map { wv =>
        val wave = fps64.filter($"fp".isNotNull && $"media_id" % nWaves === wv)
        timed(s"incr-wave$wv") {
          val dd = graft.operators.IncrementalHashDedup.dedupBatch(wave, store,
            bands = 4, bandBits = 16, maxHamming = 2,
            idCol = "media_id", hashCol = "fp")
          dd.count()
          dd
        }
      }.reduce(_ unionByName _)
      val wvOf = truth.withColumn("wave", ($"media_id" % nWaves).cast("int"))
      val expectedIncr = wvOf
        .withColumn("arr", struct($"wave", $"media_id"))
        .withColumn("should_flag", $"arr" =!= min($"arr").over(wMin))
        .select($"media_id", $"should_flag")
      val incrJoined = waveDecisions.select($"media_id", $"dup_of")
        .join(truth, "media_id")
        .join(truth.select($"media_id".as("dup_of"), $"cluster".as("dup_cluster")),
          Seq("dup_of"), "left")
        .join(expectedIncr, "media_id")
      val iagg = incrJoined.agg(
        count(when($"dup_of".isNotNull, 1)).as("flagged"),
        count(when($"dup_of".isNotNull && $"cluster" === $"dup_cluster", 1)).as("tp"),
        count(when($"should_flag", 1)).as("expected")).head()
      val (iflag, itp, iexp) = (iagg.getLong(0), iagg.getLong(1), iagg.getLong(2))
      println(f"[aud] incremental-fp64: flagged=$iflag tp=$itp expected=$iexp " +
        f"precision=${itp.toDouble / math.max(1, iflag)}%.4f recall=${itp.toDouble / math.max(1, iexp)}%.4f")
      println(f"[aud] per-sample decode+fp: ${walls("decode+fp") * 1e9 / (n * NSamples)}%6.1f ns/sample")
    }
    spark.stop()
  }
}
