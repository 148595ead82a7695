package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Audio (WAV via javax.sound.sampled) and video (YUV4MPEG2) codecs +
  * their DataFrame plumbing. Fixtures are REAL format payloads built
  * with independent writers: the WAV container comes from the JDK's
  * own AudioSystem encoder, the Y4M stream is assembled byte-for-byte
  * from the published format spec — the decoders never see their own
  * output. */
class MultimodalAvSpec extends SparkTestBase {
  import spark.implicits._

  // ---- fixtures ----

  /** 16-bit mono PCM WAV of a sine wave: amplitude a, freq hz, dur s. */
  private def sineWav(sampleRate: Int, hz: Double, a: Double, seconds: Double,
                      channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val n = (sampleRate * seconds).toInt
    val buf = new Array[Byte](n * 2 * channels)
    for (i <- 0 until n) {
      val v = (a * math.sin(2 * math.Pi * hz * i / sampleRate) * 32767).toInt
      for (c <- 0 until channels) {
        val base = (i * channels + c) * 2
        buf(base) = (v & 0xff).toByte
        buf(base + 1) = ((v >> 8) & 0xff).toByte
      }
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(buf), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Y4M stream: 4x4 C420, one gray frame per luma value. */
  private def grayY4m(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    lumas.foreach { l =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      (0 until w * h).foreach(_ => bos.write(l))
      (0 until 2 * (w / 2) * (h / 2)).foreach(_ => bos.write(128))
    }
    bos.toByteArray
  }

  // ---- audio ----

  test("JvmAudioDecoder reads WAV metadata") {
    val m = Multimodal.JvmAudioDecoder.audioMeta(sineWav(8000, 440, 0.5, 0.25))
    assert(m == Multimodal.AudioMeta(8000, 1, 16, 2000L, 250L))
  }

  test("PCM decode: sine RMS ~ a/sqrt(2), peak ~ a; stereo mixes to mono") {
    val pcm = Multimodal.JvmAudioDecoder.pcm(sineWav(8000, 440, 0.5, 0.25), 1 << 20)
    assert(pcm.length == 2000)
    val rms = math.sqrt(pcm.map(v => v.toDouble * v).sum / pcm.length)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=$rms")
    assert(math.abs(pcm.map(math.abs(_)).max - 0.5) < 0.01)
    // identical signal in both channels mixes back to the mono signal
    val st = Multimodal.JvmAudioDecoder.pcm(sineWav(8000, 440, 0.5, 0.25, channels = 2), 1 << 20)
    assert(st.length == 2000)
    assert((pcm zip st).forall { case (a, b) => math.abs(a - b) < 1e-4 })
  }

  test("pcm maxSamples head-truncates") {
    val pcm = Multimodal.JvmAudioDecoder.pcm(sineWav(8000, 440, 0.5, 1.0), 100)
    assert(pcm.length == 100)
  }

  test("pcm decodes streams whose length is unknown (AU dataSize 0xffffffff)") {
    // AU permits an unknown data size (all-ones marker); the JDK reader
    // then reports getFrameLength = NOT_SPECIFIED (-1). Hand-craft one:
    // ".snd" magic, 24-byte header, size -1, encoding 3 (16-bit BE PCM),
    // 8 kHz mono, followed by 100 big-endian samples of a constant.
    val bos = new java.io.ByteArrayOutputStream()
    val hdr = java.nio.ByteBuffer.allocate(24)
    hdr.putInt(0x2e736e64).putInt(24).putInt(0xffffffff).putInt(3).putInt(8000).putInt(1)
    bos.write(hdr.array())
    (0 until 100).foreach { _ => bos.write(0x20); bos.write(0x00) } // 0x2000 = 0.25
    val au = bos.toByteArray
    val pcm = Multimodal.JvmAudioDecoder.pcm(au, 1 << 20)
    assert(pcm.length == 100, s"expected 100 samples, got ${pcm.length}")
    assert(pcm.forall(v => math.abs(v - 0.25f) < 1e-3), s"head=${pcm.take(3).toSeq}")
    // head truncation still applies when the length is unknown
    assert(Multimodal.JvmAudioDecoder.pcm(au, 10).length == 10)
  }

  test("FailSoftAudio maps garbage to sentinels") {
    val d = Multimodal.FailSoftAudio(Multimodal.JvmAudioDecoder)
    assert(d.audioMeta("not audio".getBytes) == Multimodal.AudioMeta(-1, -1, -1, -1L, -1L))
    assert(d.pcm("not audio".getBytes, 10).isEmpty)
  }

  test("withAudioMeta + audioFeatures over a DataFrame: loud vs silent windows") {
    val clips = Seq(
      (1L, sineWav(8000, 440, 0.5, 0.5)),    // 4000 samples, loud
      (2L, sineWav(8000, 440, 0.0, 0.5)),    // silence
      (3L, "garbage".getBytes)               // quarantine row
    ).toDF("media_id", "audio")
    val meta = Multimodal.withAudioMeta(clips, "audio")
      .select($"media_id", $"audio_meta.sample_rate", $"audio_meta.duration_ms")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(meta(0) == ((1L, 8000, 500L)))
    assert(meta(2) == ((3L, -1, -1L)))

    val feats = Multimodal.audioFeatures(clips, "audio", "media_id", windowSize = 2000)
      .as[(Long, Int, Double, Double, Double)].collect()
    // clip 1: two windows, rms ~ 0.35 each; sine at 440/8000 Hz crosses
    // zero ~ 2*440/8000 per sample
    val c1 = feats.filter(_._1 == 1L).sortBy(_._2)
    assert(c1.length == 2)
    assert(c1.forall(w => math.abs(w._3 - 0.3535) < 0.01))
    assert(c1.forall(w => math.abs(w._5 - 2 * 440.0 / 8000) < 0.01), s"zcr off: ${c1.toSeq}")
    // clip 2: silent
    assert(feats.filter(_._1 == 2L).forall(w => w._3 == 0.0 && w._4 == 0.0))
    // garbage clip yields no feature rows
    assert(!feats.exists(_._1 == 3L))
  }

  // ---- video ----

  test("Y4mDecoder reads stream metadata") {
    val m = Multimodal.Y4mDecoder.videoMeta(grayY4m(4, 4, Seq(50, 128, 200)))
    assert(m == Multimodal.VideoMeta(4, 4, 25, 1, 3))
  }

  test("Y4M frames decode to PNGs with the exact gray level, sampled evenly") {
    val clip = grayY4m(4, 4, Seq(50, 128, 200, 10))
    val two = Multimodal.Y4mDecoder.frames(clip, 2)
    assert(two.size == 2)
    // indices 0*4/2=0 and 1*4/2=2 → lumas 50 and 200; U=V=128 means
    // BT.601 inversion is exactly (l, l, l)
    val imgs = two.map(b => javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    assert(imgs.forall(i => i.getWidth == 4 && i.getHeight == 4))
    val grays = imgs.map(_.getRGB(1, 1) & 0xff)
    assert(grays == Seq(50, 200), s"got $grays")
    // asking for more frames than exist yields all of them
    assert(Multimodal.Y4mDecoder.frames(clip, 10).size == 4)
  }

  test("Y4mDecoder rejects odd dimensions (C420 undefined; chroma index would overrun)") {
    intercept[IllegalArgumentException](
      Multimodal.Y4mDecoder.videoMeta(grayY4m(5, 4, Seq(50))))
    intercept[IllegalArgumentException](
      Multimodal.Y4mDecoder.videoMeta(grayY4m(4, 3, Seq(50))))
  }

  test("Y4mDecoder rejects truncated and non-Y4M payloads; FailSoftVideo sentinels them") {
    intercept[IllegalArgumentException](
      Multimodal.Y4mDecoder.videoMeta("RIFFnot a y4m".getBytes))
    val truncated = grayY4m(4, 4, Seq(50)).dropRight(3)
    intercept[IllegalArgumentException](Multimodal.Y4mDecoder.videoMeta(truncated))
    val d = Multimodal.FailSoftVideo(Multimodal.Y4mDecoder)
    assert(d.videoMeta(truncated) == Multimodal.VideoMeta(-1, -1, -1, -1, -1))
    assert(d.frames(truncated, 2).isEmpty)
  }

  test("videoFrames rows flow into the image plane unchanged") {
    val clips = Seq(
      (1L, grayY4m(4, 4, Seq(50, 128, 200))),
      (2L, "not video".getBytes)
    ).toDF("media_id", "video")
    val frames = Multimodal.videoFrames(clips, "video", "media_id", n = 2)
    val meta = Multimodal.withImageMeta(frames, "frame",
        decoder = Multimodal.FailSoft(Multimodal.ImageIoDecoder))
      .select($"media_id", $"frame_idx", $"image_meta.width", $"image_meta.height")
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(meta.toSeq == Seq((1L, 0, 4, 4), (1L, 1, 4, 4)))
  }

  test("withVideoMeta attaches typed struct; quarantine on garbage") {
    val clips = Seq(
      (1L, grayY4m(4, 4, Seq(50, 128))),
      (2L, "junk".getBytes)
    ).toDF("media_id", "video")
    val got = Multimodal.withVideoMeta(clips, "video")
      .select($"media_id", $"video_meta.width", $"video_meta.n_frames")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4, 2), (2L, -1, -1)))
  }

  /** Amplitude-modulated sine WAV: per-window envelope varies strongly
    * (env = 0.1 + 0.85·|sin(seed-phased slow wave)|), so window-RMS
    * deltas are far above 16-bit quantization noise — the fixture the
    * gain-invariance pin needs (a constant-amplitude sine has
    * near-tied windows that quantization could flip). */
  private def amWav(sampleRate: Int, seed: Int, gain: Double, seconds: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val n = (sampleRate * seconds).toInt
    val buf = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val env = 0.1 + 0.85 * math.abs(math.sin(2 * math.Pi * (seed * 0.7 + 2.3) * i / n + seed))
      val v = (gain * env * math.sin(2 * math.Pi * 440 * i / sampleRate) * 32767).toInt
      buf(i * 2) = (v & 0xff).toByte
      buf(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(buf), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFingerprint: deterministic, discriminative, gain-invariant, null-quarantine") {
    // 34 windows of 4096 samples at 8 kHz = ~17.4 s per clip
    val secs = 34.0 * 4096 / 8000
    val clips = Seq(
      (1L, amWav(8000, seed = 1, gain = 1.0, secs)),
      (2L, amWav(8000, seed = 1, gain = 1.0, secs)),   // bit-identical twin
      (3L, amWav(8000, seed = 1, gain = 0.45, secs)),  // volume-normalized copy
      (4L, amWav(8000, seed = 9, gain = 1.0, secs)),   // different envelope
      (5L, Array.fill[Byte](64)(0x5A))                 // garbage: quarantine
    ).toDF("media_id", "payload")
    // bits = 32 pins the narrow stub-twin width's range contract; the
    // production default is 64 (checked below on the same fixtures)
    val got = Multimodal.audioFingerprint(clips, "payload", "media_id", bits = 32)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got(1L).isDefined && got(1L) == got(2L), "identical clips agree")
    assert(got(1L) == got(3L), s"gain-scaled copy must fingerprint identically: ${got(1L)} vs ${got(3L)}")
    assert(got(4L).isDefined && got(4L) != got(1L), "different envelope differs")
    assert(got(5L).isEmpty, "undecodable clip carries the null sentinel")
    assert(got(1L).exists(f => f >= 0 && f < (1L << 32)), "fp stays in 32 bits")
    // the production default width is 64: same invariances, wider chain
    val got64 = Multimodal.audioFingerprint(clips, "payload", "media_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got64(1L).isDefined && got64(1L) == got64(3L), "64-bit gain invariance")
    assert(got64(5L).isEmpty, "64-bit null sentinel")
    assert(got64(1L) != got(1L), "default width is 64, not the 32-bit stub twin")
  }

  test("audioFingerprint feeds the hamming funnel: gain-copy dups, distinct clip does not") {
    val secs = 34.0 * 4096 / 8000
    val clips = Seq(
      (1L, amWav(8000, 3, 1.0, secs)),
      (2L, amWav(8000, 3, 0.6, secs)),
      (3L, amWav(8000, 5, 1.0, secs))).toDF("media_id", "payload")
    val fps = Multimodal.audioFingerprint(clips, "payload", "media_id")
      .filter($"fp".isNotNull)
    val out = Multimodal.hashNearDup(fps, "media_id", "fp",
        bands = 4, bandBits = 16, maxHamming = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(2L), "gain-scaled copy flags at hamming 0")
    assert(!out(1L) && !out(3L), "distinct envelopes stay unique")
  }
}
