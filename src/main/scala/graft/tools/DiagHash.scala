package graft.tools

import graft.operators.Multimodal

/** Calibration read for the ProfileImagePlane corpus and
  * [[Multimodal.dhash64]]: cross-pair hamming separation (how far
  * apart distinct bases land — the incidental-collision floor) and
  * planted-variant distances (rescaled / JPEG-re-encoded copies — the
  * recall budget a funnel threshold must cover). This is the tool that
  * caught the round-12 bilinear-downscale aliasing bug (variants at
  * hamming 10+ pre-fix, ≤ 8 with the box filter) and that sets the
  * maxHamming used by the batch/incremental funnels; rerun it after
  * any change to dhash64 or the corpus generator. */
object DiagHash {
  def main(args: Array[String]): Unit = {
    import ProfileImagePlane._
    val n = 500
    val hashes = (0 until n).map(i => Multimodal.dhash64(debugPng(i)))
    var minD = 64; var le6 = 0; var le10 = 0
    for (i <- 0 until n; j <- (i + 1) until n) {
      val d = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
      if (d < minD) minD = d
      if (d <= 6) le6 += 1
      if (d <= 10) le10 += 1
    }
    println(s"cross: min=$minD le6=$le6 le10=$le10 of ${n * (n - 1) / 2}")
    val variantD = (0 until n).map(i => java.lang.Long.bitCount(hashes(i) ^ Multimodal.dhash64(debugVariant(i))))
    println(s"variant: within6=${variantD.count(_ <= 6)}/$n max=${variantD.max}")
    val reencD = (0 until n).map(i => java.lang.Long.bitCount(hashes(i) ^ Multimodal.dhash64(debugReenc(i))))
    println(s"reenc: within6=${reencD.count(_ <= 6)}/$n max=${reencD.max}")
  }
}
