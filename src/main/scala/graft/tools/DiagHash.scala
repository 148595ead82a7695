package graft.tools

import graft.operators.Multimodal

/** throwaway diagnostic: hash-distance distributions of the ProfileImagePlane corpus */
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
