package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** JL ±1 projection: host-replay exactness, sign-matrix determinism,
  * and the angle-preservation property the reduction exists for. */
class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("sign matrix is the md5 convention, balanced, and stable") {
    // independent recompute of the documented definition
    def expect(j: Int, i: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) >= 8) 1 else -1
    }
    for (j <- 0 until 16; i <- 0 until 64)
      assert(RandomProjection.sign(j, i) == expect(j, i))
    // roughly balanced: a degenerate all-ones matrix would be a bug
    val total = (0 until 16).flatMap(j => (0 until 64).map(i => RandomProjection.sign(j, i))).sum
    assert(math.abs(total) < 200, s"sign sum $total")
  }

  test("projection equals the exact host-side integer fold") {
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
      (2L, Array(-1.5f, 0.0f, 2.0f, -0.0625f)))
    val got = RandomProjection.projected(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", m = 3, d = 4)
      .as[(Long, Array[Double])].collect().toMap
    vecs.foreach { case (id, xs) =>
      val micro = xs.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      val want = (0 until 3).map(j =>
        (0 until 4).map(i => RandomProjection.sign(j, i) * micro(i)).sum.toDouble)
      assert(got(id).toSeq == want, s"id=$id got=${got(id).toSeq} want=$want")
    }
  }

  test("angles survive 64 -> 16 on real embeddings (the JL property)") {
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(40)
    val full = df.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val red = RandomProjection.projected(df, "vec_id", "embedding", m = 16, d = 64)
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val errs = for {
      (ia, va) <- full; (ib, vb) <- full if ia < ib
    } yield math.abs(
      cos(va.map(_.toDouble), vb.map(_.toDouble)) - cos(red(ia), red(ib)))
    // Rademacher JL at m=16: per-pair error ~ N(0, 1/sqrt(16)), so the
    // mean ABSOLUTE error across 780 pairs concentrates near
    // sqrt(2/pi)*0.25 = 0.20 (measured 0.202 on this corpus)
    val mean = errs.sum / errs.size
    assert(mean < 0.25, s"mean |cos error| = $mean")
    assert(errs.max < 0.75, s"worst pair error = ${errs.max}")
  }

  test("guardrails: positive dims") {
    val df = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      RandomProjection.projected(df, "vec_id", "embedding", m = 0, d = 1))
  }
}
