package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The embedding plane's decision surface, exercised on BOTH regimes.
  *
  * The driver's synthetic embeddings are near-isotropic, so the gate
  * (qs16-qs22) proves arithmetic but only half the OPERATING story:
  * on isotropic data JL/PQ recalls are near-random and PCA's cum_frac
  * is flat — the correct reading is "don't compress". This spec plants
  * the opposite regime — a rank-4 + noise corpus with a KNOWN spectrum
  * (per-dim stds 10/5/2/1 on the first four axes, 0.3 noise elsewhere;
  * n=1500, d=64, fixed seed) — and pins that every decision flips the
  * way the plane's docs claim:
  *   - qs21's read: PC1 cum_frac ≈ λ₁/Σλ of the PLANTED spectrum
  *     (≈ 0.74), vs < 0.10 on the isotropic control;
  *   - qs18's read: JL at m=16 preserves the top-5 cosine neighborhood
  *     of the effectively-4-dim corpus far better than of the 64-dim
  *     isotropic one;
  *   - qs22's read: product quantization serves candidates from the
  *     true neighborhood on the CLUSTERED low-rank corpus (the real
  *     embedding shape) and near-garbage on the structureless control
  *     — containment-in-true-top-20, the candidate-generation metric.
  * Thresholds sit well inside the measured gap (values in NOTES_r9);
  * the RELATIVE assertions (low-rank beats isotropic by a wide margin)
  * are the load-bearing ones.
  */
class AnisotropicEmbeddingSpec extends SparkTestBase {
  import spark.implicits._

  private val D = 64
  private val N = 1500
  private val queryIds: Seq[Long] = (0L until 10L)

  private def corpus(lowRank: Boolean): DataFrame = {
    val rnd = new scala.util.Random(if (lowRank) 7 else 8)
    val stds: Int => Double =
      if (lowRank) { j => if (j == 0) 10.0 else if (j == 1) 5.0 else if (j == 2) 2.0
                          else if (j == 3) 1.0 else 0.3 }
      else { _ => 1.0 }
    (0 until N).map { i =>
      (i.toLong, Array.tabulate(D)(j => rnd.nextGaussian() * stds(j)))
    }.toDF("vec_id", "embedding").localCheckpoint()
  }

  /** Clustered low-rank corpus — the shape real embedding corpora have
    * (topical clusters living in a low-dim subspace): 50 cluster
    * centers drawn with the planted stds on dims 0-3, members jittered
    * 0.5 per dim. Cluster id = vec_id % 50, so same-cluster truth is
    * checkable. */
  private def clusteredCorpus: DataFrame = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(50)(Array.tabulate(D)(j =>
      if (j == 0) rnd.nextGaussian() * 10 else if (j == 1) rnd.nextGaussian() * 5
      else if (j == 2) rnd.nextGaussian() * 2 else if (j == 3) rnd.nextGaussian()
      else 0.0))
    (0 until N).map { i =>
      val c = centers(i % 50)
      (i.toLong, Array.tabulate(D)(j => c(j) + rnd.nextGaussian() * 0.5))
    }.toDF("vec_id", "embedding").localCheckpoint()
  }

  private def top5(df: DataFrame, vecCol: String): DataFrame =
    Similarity.bruteForceTopK(df, queryIds, k = 5, idCol = "vec_id", vecCol = vecCol)
      .select($"query_id", $"neighbor_id")

  private def recallVs(truth: DataFrame, approx: DataFrame): Double =
    truth.join(approx, Seq("query_id", "neighbor_id")).count().toDouble / truth.count()

  /** qs22's encoder shape at serving strength — 8 subspaces × 8 dims,
    * k=32 codewords, 3 Lloyd rounds (the gate uses 4×16/k=4/1 round
    * only to keep its unrolled oracle tractable; production PQ is
    * m=8..16, k=256): corpus vectors replaced by their reconstruction.
    * Queries stay full-precision (asymmetric distance, qs22's read). */
  private def pqReconstructed(emb: DataFrame): DataFrame = {
    val nSub = 8
    val w = D / nSub
    val enc = (0 until nSub).map { s =>
      val sub = emb.select($"vec_id", slice($"embedding", s * w + 1, w).as("sub"))
      val (cents, assigned) = KMeans.lloyd(sub, k = 32, iters = 3,
        idCol = "vec_id", vecCol = "sub")
      assigned.join(broadcast(cents.select($"cell", $"c_vec")), Seq("cell"))
        .select($"vec_id", $"c_vec".as(s"cv$s"))
    }.reduce((a, b) => a.join(b, Seq("vec_id")))
    enc.select($"vec_id",
      concat((0 until nSub).map(s => col(s"cv$s")): _*).as("embedding"))
  }

  /** Asymmetric top-5: full-precision queries scored against the
    * reconstructed corpus — the ADC read qs22 serves. */
  private def top5Asymmetric(emb: DataFrame, recon: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm2}
    val q = emb.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id".as("query_id"), $"embedding".as("q_vec"),
        sqrt(norm2($"embedding")).as("q_nrm"))
    val sims = recon.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (dot($"q_vec", $"embedding") /
          ($"q_nrm" * sqrt(norm2($"embedding")))).as("cos_sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
    sims.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"neighbor_id")
  }

  test("qs21 read: PC1 variance fraction matches the planted spectrum; flat when isotropic") {
    // planted: λ₁=100, Σλ = 100+25+4+1+60·0.09 = 135.4 → frac ≈ 0.739
    val vs = Pca.varianceSummary(corpus(lowRank = true), "embedding", "vec_id", iters = 3)
      .orderBy($"component").collect()
    val frac1 = vs(0).getDouble(2)
    assert(math.abs(frac1 - 100.0 / 135.4) < 0.06,
      s"PC1 cum_frac $frac1 should sit near the planted 0.739")
    // cum through PC2: (100+25)/135.4 ≈ 0.923
    val frac2 = vs(1).getDouble(2)
    assert(math.abs(frac2 - 125.0 / 135.4) < 0.06, s"PC1+PC2 cum_frac $frac2 vs planted 0.923")

    val iso = Pca.varianceSummary(corpus(lowRank = false), "embedding", "vec_id", iters = 3)
      .orderBy($"component").collect()
    assert(iso(0).getDouble(2) < 0.10,
      s"isotropic PC1 frac ${iso(0).getDouble(2)} must stay near 1/64")
  }

  test("qs18 read: JL at m=16 keeps the low-rank neighborhood, loses the isotropic one") {
    def jlRecall(lowRank: Boolean): Double = {
      val emb = corpus(lowRank)
      val truth = top5(emb, "embedding").localCheckpoint()
      val proj = RandomProjection.projected(emb, "vec_id", "embedding", m = 16, d = D)
      recallVs(truth, top5(proj, "rvec"))
    }
    val lr = jlRecall(lowRank = true)
    val iso = jlRecall(lowRank = false)
    assert(lr > iso + 0.25, s"JL m=16 recall must flip regimes: low-rank $lr vs isotropic $iso")
    // measured: low-rank 0.44 vs isotropic ≲ 0.15 (NOTES_r9) — the
    // 4-to-1 effective-dimension drop is what m=16 preserves
    assert(lr > 0.35, s"low-rank JL recall $lr should be usable at m=16")
  }

  /** Candidate quality: fraction of the served top-5 that sit in the
    * TRUE top-20 — "no garbage served", the metric that matters for
    * PQ's real role (candidate generation before exact rerank; strict
    * recall@5 is the rerank stage's job, not the quantizer's). */
  private def containment(emb: DataFrame, approx: DataFrame): Double = {
    val t20 = Similarity.bruteForceTopK(emb, queryIds, k = 20,
        idCol = "vec_id", vecCol = "embedding")
      .select($"query_id", $"neighbor_id")
    approx.join(t20, Seq("query_id", "neighbor_id")).count().toDouble /
      approx.count()
  }

  test("qs22 read: PQ serves the true neighborhood on clustered low-rank data, garbage on structureless") {
    // PQ is a CANDIDATE-GENERATION stage: coarse codes collapse
    // within-cell order (strict recall@5 is low on ANY unclustered
    // gaussian corpus — measured 0.02-0.22, NOTES_r9), so the honest
    // quality read is containment-in-true-top-20. On the clustered
    // low-rank corpus (real embedding shape) the quantizer keeps the
    // served candidates inside the query's true neighborhood; on the
    // structureless isotropic control the same encoder serves
    // near-garbage — the "don't PQ structureless data" decision.
    val emb = clusteredCorpus
    val good = containment(emb, top5Asymmetric(emb, pqReconstructed(emb)))
    val iso = corpus(lowRank = false)
    val bad = containment(iso, top5Asymmetric(iso, pqReconstructed(iso)))
    assert(good > bad + 0.2,
      s"containment must flip regimes: clustered low-rank $good vs isotropic $bad")
    assert(good > 0.65, s"clustered low-rank containment $good should be usable")
  }
}
