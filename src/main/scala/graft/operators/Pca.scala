package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** In-engine PCA (top principal component by power iteration) — the
  * embedding-plane trainer next to [[KMeans]]/[[LogisticTrainer]]/
  * [[NaiveBayes]]: the first PC of an embedding corpus drives
  * whitening, anisotropy diagnostics (how much of the corpus variance
  * one direction eats — the "dominant direction" every contrastive-
  * embedding paper removes), and cheap 1-D layout keys.
  *
  * Same census/broadcast discipline as k-means: each power-iteration
  * round is ONE map-side-combined aggregation over the vectors (the
  * corpus is never shuffled — only 64 per-dim decimal partial sums per
  * partition move), and the state the driver holds is the d-dim
  * direction (model metadata, the justified-collect class — exactly
  * [[KMeans]]' centroid collect). Per-row math goes through the native
  * [[graft.functions.expressions.DotProduct]] loop and array HOFs —
  * compact codegen, never a d-term unrolled fold (the unrolled form
  * compiled to multi-MB methods whose JIT cost dominated wall time).
  *
  * Cross-engine float discipline (the qs12/qt29 rules, applied end to
  * end so the whole trajectory is oracle-able):
  *  - inputs quantize to the 1e-6 grid on read;
  *  - every reduction is a DECIMAL sum of 1e-6-rounded terms
  *    (partition-order independent); driver-side norm² is an exact
  *    micro-unit Long sum;
  *  - every derived scalar (mean, dot, norm, loading) re-quantizes to
  *    1e-6 before the next step consumes it, so engine-vs-oracle ulp
  *    drift (fold association, pow/sqrt last-ulp) is absorbed at each
  *    stage instead of compounding;
  *  - the per-row dot is the same left fold DuckDB's
  *    `list_dot_product` evaluates.
  */
object Pca {

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Column-side 1e-6 quantization matching [[q6]]. */
  private def q6c(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  private def cdot(x: Column, mu: Column, v: Column): Column =
    graft.functions.VectorFunctions.centeredDot(x, mu, v)

  /** quantized view of the vector column */
  private def quantized(vecCol: String): Column =
    transform(col(vecCol).cast("array<double>"), x => q6c(x))

  final case class Component(mu: Array[Double], v: Array[Double], lambda: Double)

  /** Fit the top principal component: mean vector, unit loading
    * direction after `iters` power-iteration rounds from the uniform
    * start 1/sqrt(d), and the variance it captures
    * (lambda = ||C v|| / n at the final round). */
  def topComponent(df: DataFrame, vecCol: String, iters: Int): Component =
    fit(df, vecCol, iters, knownShape = None)._1

  /** [[topComponent]] plus the frozen quantized corpus it fit on and
    * the (d, n) shape — so multi-fit consumers ([[varianceSummary]]'s
    * deflation chain) scan the source ONCE and derive residuals/trace
    * from the checkpoint instead of re-reading the table per action
    * (r15: was ~7 source scans and 17 driver actions for qs21; the
    * shape probe is one tiny aggregation over the checkpoint, and a
    * second fit on a derived frame skips it entirely via
    * `knownShape` — residualization preserves both d and n). */
  private def fit(df: DataFrame, vecCol: String, iters: Int,
                  knownShape: Option[(Int, Long)],
                  carryIdCol: Option[String] = None): (Component, DataFrame, Int, Long) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // frozen quantized corpus: every round re-scans this, not the plan
    // (optionally carrying the id column so a consumer can project
    // scores from the same checkpoint — every loop step below selects
    // "e" only, so the rider column never enters the fit's shuffles)
    val vecs = df.select(
      carryIdCol.map(col).toSeq :+ quantized(vecCol).as("e"): _*).localCheckpoint()
    val (d, n) = knownShape.getOrElse {
      val r = vecs.agg(first(size(col("e"))), count(lit(1))).head()
      (if (r.isNullAt(0)) 0 else r.getInt(0), r.getLong(1))
    }
    require(n >= 2, s"need at least 2 vectors, got $n")

    // per-dim decimal sums via (dim, value) explode — map-side combined
    def dimSums(terms: DataFrame, termCol: String): Map[Int, Double] =
      terms.select(posexplode(col(termCol)).as(Seq("dim", "t")))
        .groupBy(col("dim"))
        .agg(sum(col("t").cast("decimal(30,6)")).cast("double").as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    val muSums = dimSums(vecs, "e")
    val mu = (0 until d).map(j => q6(muSums(j) / n)).toArray

    var v = Array.fill(d)(q6(1.0 / math.sqrt(d.toDouble)))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val muLit = lit(mu)
      val vLit = lit(v)
      // dot_i = q6( (e_i - mu) · v ): scan-local fused native loop
      val withDot = vecs.select(col("e"), q6c(cdot(col("e"), muLit, vLit)).as("__dot"))
      // w_j = decimal-sum_i q6((e_ij - mu_j) * dot_i)
      val wSums = dimSums(
        withDot.select(zip_with(col("e"), muLit,
          (a, b) => q6c((a - b) * col("__dot"))).as("t")), "t")
      val w = (0 until d).map(j => q6(wSums(j))).toArray
      // norm² as an exact micro-unit (1e-6 grid) integer sum: the q6'd
      // squares are k/1e6 rationals, so Σ floor(wj²·1e6+0.5) over Long
      // is order-free and /1e6 is one correctly-rounded division —
      // bit-identical to DuckDB's DECIMAL(30,6) sum cast to DOUBLE
      val nrm2Micro = w.map(wj => math.floor(wj * wj * 1e6 + 0.5).toLong).sum
      val nrm = q6(math.sqrt(nrm2Micro.toDouble / 1e6))
      require(nrm > 0.0, "power iteration collapsed to the zero vector")
      v = w.map(wj => q6(wj / nrm))
      lambda = q6(nrm / n)
    }
    (Component(mu, v, lambda), vecs, d, n)
  }

  /** The component as a (dim, mu, loading, lambda) frame — the gate-
    * query surface. Sign convention: the loading vector is flipped so
    * its largest-|.| coordinate is positive (eigenvectors are defined
    * up to sign; the convention makes the output deterministic). */
  def topComponentFrame(df: DataFrame, vecCol: String, iters: Int): DataFrame = {
    val c = topComponent(df, vecCol, iters)
    val flip = {
      val k = c.v.indices.maxBy(j => (math.abs(c.v(j)), -j))
      if (c.v(k) < 0) -1.0 else 1.0
    }
    val spark = df.sparkSession
    val rows = c.v.indices.map(j =>
      Row(j, c.mu(j), q6(flip * c.v(j)), c.lambda))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dim", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("mu", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("loading", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("lambda", org.apache.spark.sql.types.DoubleType))))
  }

  /** Residual after removing the fitted component (the "all-but-the-
    * top" anisotropy correction contrastive-embedding retrieval
    * applies): r = (x−μ) − ((x−μ)·v)·v, every coordinate re-quantized
    * to the 1e-6 grid so the rvec column is oracle-exact. Scan-local
    * per-row arithmetic against literal model state — zero shuffle. */
  def residualized(df: DataFrame, vecCol: String, idCol: String,
                   c: Component): DataFrame =
    df.select(col(idCol), residualExpr(quantized(vecCol), c).as("rvec"))

  /** r = (x−μ) − ((x−μ)·v)·v over an ALREADY-QUANTIZED vector column —
    * the shared expression behind [[residualized]] and the
    * one-scan fit variants. */
  private def residualExpr(e: Column, c: Component): Column = {
    val muLit = lit(c.mu)
    val vLit = lit(c.v)
    val cx = zip_with(e, muLit, (a, b) => a - b)
    val dotE = q6c(cdot(e, muLit, vLit))
    graft.functions.TextFunctions.letBound(dotE) { dd =>
      zip_with(cx, vLit, (c0, vv) => q6c(c0 - dd * vv))
    }
  }

  /** [[topComponent]] + [[residualized]] fused on ONE source scan
    * (r15) — same contract as [[fitAndProject]]: the residuals read
    * the fit's checkpointed quantized vectors, bit-identical to a
    * fresh residualized() over the source. */
  private[graft] def fitAndResidualize(df: DataFrame, vecCol: String,
                                       idCol: String, iters: Int): (Component, DataFrame) = {
    val (c, vecs, _, _) = fit(df, vecCol, iters, knownShape = None,
      carryIdCol = Some(idCol))
    (c, vecs.select(col(idCol), residualExpr(col("e"), c).as("rvec")))
  }

  /** Two-component explained-variance summary via DEFLATION: PC1 on
    * the corpus, PC2 as the top component of the PC1 residuals, and
    * each λ as a fraction of the total variance tr(C)/n (the exact-
    * decimal sum of per-row q6(‖x−μ‖²)). The "how anisotropic is this
    * embedding space really" read: cum_frac(1) ≫ 1/d says qs19's
    * correction is worth applying; cum_frac(2) − cum_frac(1) says
    * whether one deflation round was enough. Output: (component,
    * lambda, cum_frac). */
  def varianceSummary(df: DataFrame, vecCol: String, idCol: String,
                      iters: Int): DataFrame = {
    // r15: one source scan total. PC1 fits on the checkpointed quantized
    // corpus; the PC1 residuals, the PC2 fit, and the total-variance
    // trace all derive from that checkpoint (e == quantized(vecCol)
    // exactly, so every expression below evaluates bit-identically to
    // the former per-action re-reads of the source table), and the PC2
    // fit inherits (d, n) — residualization preserves both.
    val (c1, vecs, d, n) = fit(df, vecCol, iters, knownShape = None)
    val (c2, _, _, _) = fit(vecs.select(residualExpr(col("e"), c1).as("rvec")),
      "rvec", iters, knownShape = Some((d, n)))
    val cx = zip_with(col("e"), lit(c1.mu), (a, b) => a - b)
    val tvSum = vecs.select(q6c(graft.functions.VectorFunctions.dot(cx, cx)).as("sq"))
      .agg(sum(col("sq").cast("decimal(30,6)")).cast("double")).head().getDouble(0)
    val tv = q6(tvSum / n)
    val spark = df.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, c1.lambda, q6(c1.lambda / tv)),
        Row(2, c2.lambda, q6((c1.lambda + c2.lambda) / tv))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("component", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("lambda", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("cum_frac", org.apache.spark.sql.types.DoubleType))))
  }

  /** Project vectors onto the fitted component: score = (x-μ)·v — the
    * whitening/1-D-layout read; scan-local, zero shuffle. */
  def projected(df: DataFrame, vecCol: String, idCol: String,
                c: Component): DataFrame = {
    val score = q6c(cdot(quantized(vecCol), lit(c.mu), lit(c.v)))
    df.select(col(idCol), score.as("pc1"))
  }

  /** [[topComponent]] + [[projected]] fused on ONE source scan (r15):
    * the fit's checkpoint carries the id, and the projection reads the
    * checkpointed quantized vectors (e == quantized(vecCol) exactly,
    * so the score expression evaluates bit-identically to a fresh
    * [[projected]] over the source). qz05/qr07 previously paid a
    * second full source scan + quantize just to attach ids to
    * scores. */
  private[graft] def fitAndProject(df: DataFrame, vecCol: String,
                                   idCol: String, iters: Int): (Component, DataFrame) = {
    val (c, vecs, _, _) = fit(df, vecCol, iters, knownShape = None,
      carryIdCol = Some(idCol))
    val score = q6c(cdot(col("e"), lit(c.mu), lit(c.v)))
    (c, vecs.select(col(idCol), score.as("pc1")))
  }
}
