package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Power-iteration PCA: analytic recovery, sign convention, projection
  * semantics, and the order-free float discipline that makes the qs16
  * oracle replay exact. */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  /** 101 points along `dir` (unit), parameter t = -5.0 .. 5.0 step 0.1,
    * shifted by `shift` — covariance has rank 1, eigenvalue Σt²/n. */
  private def lineFixture(dir: Array[Double], shift: Array[Double]) =
    (-50 to 50).map { i =>
      val t = i / 10.0
      (i.toLong + 100, dir.indices.map(j => (shift(j) + t * dir(j)).toFloat).toArray)
    }.toDF("vec_id", "embedding")

  test("recovers an analytically-known principal direction, mean, and eigenvalue") {
    val dir = Array(0.6, 0.8)
    val shift = Array(2.0, -1.0)
    val c = Pca.topComponent(lineFixture(dir, shift), "embedding", iters = 8)
    // mean = the shift (t sums to zero)
    assert(c.mu.indices.forall(j => math.abs(c.mu(j) - shift(j)) < 1e-5), c.mu.toSeq)
    // unit loading aligned with dir up to sign
    val nrm = math.sqrt(c.v.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-4)
    val cos = c.v(0) * dir(0) + c.v(1) * dir(1)
    assert(math.abs(math.abs(cos) - 1.0) < 1e-3, s"v=${c.v.toSeq}")
    // lambda = ||C v|| / n = Σt²/n = 858.5/101 on a rank-1 corpus
    assert(math.abs(c.lambda - 858.5 / 101) < 1e-3, s"lambda=${c.lambda}")
  }

  test("topComponentFrame sign convention: largest-|.| loading is positive") {
    // direction given with negative dominant coordinate — frame must flip
    val f = Pca.topComponentFrame(lineFixture(Array(-0.8, 0.6), Array(0.0, 0.0)),
        "embedding", iters = 8)
      .orderBy($"dim").select($"loading").as[Double].collect()
    assert(math.abs(f(0) - 0.8) < 1e-3 && math.abs(f(1) + 0.6) < 1e-3, f.toSeq)
    assert(f.maxBy(math.abs) > 0)
  }

  test("projected: mean-centered scores recover the line parameter up to sign") {
    val df = lineFixture(Array(1.0, 0.0), Array(7.0, 7.0))
    val c = Pca.topComponent(df, "embedding", iters = 8)
    val scores = Pca.projected(df, "embedding", "vec_id", c)
      .orderBy($"vec_id").as[(Long, Double)].collect()
    // Σ pc1 = 0 (centered); |pc1| of row i is |t_i|
    assert(math.abs(scores.map(_._2).sum) < 1e-3)
    scores.foreach { case (id, s) =>
      val t = (id - 100) / 10.0
      assert(math.abs(math.abs(s) - math.abs(t)) < 1e-3, s"id=$id s=$s t=$t")
    }
  }

  test("residualized removes the component: residuals are orthogonal to v and tiny on a rank-1 corpus") {
    val df = lineFixture(Array(0.6, 0.8), Array(1.0, 2.0))
    val c = Pca.topComponent(df, "embedding", iters = 8)
    val res = Pca.residualized(df, "embedding", "vec_id", c)
      .as[(Long, Array[Double])].collect()
    res.foreach { case (id, r) =>
      // rank-1 data: removing PC1 leaves ~nothing (1e-6 grid noise)
      assert(r.forall(x => math.abs(x) < 1e-4), s"id=$id r=${r.toSeq}")
      val along = r.zip(c.v).map { case (a, b) => a * b }.sum
      assert(math.abs(along) < 1e-4, s"residual not orthogonal: $along")
    }
  }

  test("varianceSummary: a dominant direction owns ~all variance; fractions are cumulative") {
    // major axis (0.6, 0.8) with |t| up to 5; minor axis (-0.8, 0.6)
    // alternating ±0.01 — big enough to survive the 1e-6 grid, small
    // enough that PC1 should own >99.9% of the trace
    val df = (-50 to 50).map { i =>
      val t = i / 10.0
      val s = if (i % 2 == 0) 0.01 else -0.01
      (i.toLong + 100, Array((3.0 + t * 0.6 - s * 0.8).toFloat,
                             (-2.0 + t * 0.8 + s * 0.6).toFloat))
    }.toDF("vec_id", "embedding")
    val rows = Pca.varianceSummary(df, "embedding", "vec_id", iters = 8)
      .orderBy($"component").collect()
    assert(rows(0).getInt(0) == 1 && rows(1).getInt(0) == 2)
    assert(rows(0).getDouble(2) > 0.999, s"PC1 frac = ${rows(0).getDouble(2)}")
    assert(rows(1).getDouble(2) >= rows(0).getDouble(2))
    assert(rows(1).getDouble(2) <= 1.0 + 1e-3)
    // PC2 carries only the planted 1e-4 minor variance
    assert(rows(1).getDouble(1) < 1e-3 && rows(1).getDouble(1) > 0,
      s"lambda2 = ${rows(1).getDouble(1)}")
  }

  test("trajectory is partitioning-invariant (decimal sums are order-free)") {
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = Pca.topComponentFrame(df.repartition(1), "embedding", iters = 2)
      .orderBy($"dim").collect().toSeq
    val b = Pca.topComponentFrame(df.repartition(13), "embedding", iters = 2)
      .orderBy($"dim").collect().toSeq
    assert(a == b)
  }

  test("every emitted scalar sits on the 1e-6 grid (the oracle contract)") {
    val rows = Pca.topComponentFrame(
        spark.read.parquet(s"$sf0001/embeddings.parquet"), "embedding", iters = 2)
      .collect()
    def onGrid(x: Double) = math.abs(x * 1e6 - math.rint(x * 1e6)) < 1e-6
    rows.foreach { r =>
      assert(onGrid(r.getDouble(1)) && onGrid(r.getDouble(2)) && onGrid(r.getDouble(3)), r)
    }
  }

  test("guardrails: iters >= 1, at least 2 vectors, no zero collapse") {
    val one = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Pca.topComponent(one, "embedding", iters = 0))
    intercept[IllegalArgumentException](Pca.topComponent(one, "embedding", iters = 1))
  }
}
