package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  * corpus is never shuffled), and the state the driver holds is the
  * d-dimensional direction (model metadata, the justified-collect
  * class — exactly [[KMeans]]' centroid collect).
  *
  * Cross-engine float discipline (the qs12/qt29 rules, applied end to
  * end so the whole trajectory is oracle-able):
  *  - inputs quantize to the 1e-6 grid on read;
  *  - every reduction is a DECIMAL sum of 1e-6-rounded terms
  *    (partition-order independent);
  *  - every derived scalar (mean, dot, norm, loading) re-quantizes to
  *    1e-6 before the next step consumes it, so engine-vs-oracle ulp
  *    drift (fold association, pow/sqrt last-ulp) is absorbed at each
  *    stage instead of compounding.
  */
object Pca {

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Column-side 1e-6 quantization matching [[q6]]. */
  private def q6c(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Decimal-exact sum of 1e-6-quantized terms. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(q6c(c).cast("decimal(30,6)")).cast("double")

  final case class Component(mu: Array[Double], v: Array[Double], lambda: Double)

  /** Fit the top principal component: mean vector, unit loading
    * direction after `iters` power-iteration rounds from the uniform
    * start 1/sqrt(d), and the variance it captures
    * (lambda = ||C v|| / n at the final round). */
  def topComponent(df: DataFrame, vecCol: String, iters: Int): Component = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    val d = df.select(size(col(vecCol))).head().getInt(0)
    val n = df.count()
    require(n >= 2, s"need at least 2 vectors, got $n")

    // quantized input view: x_j = q6(vec[j])
    val x = (0 until d).map(j => q6c(element_at(col(vecCol), j + 1).cast("double")).as(s"x$j"))
    val vecs = df.select(x: _*).localCheckpoint() // frozen: every round re-scans this

    // mean per dim: q6(decimal-sum / n)
    val muRow = vecs.select((0 until d).map(j => dsum(col(s"x$j")).as(s"m$j")): _*).head()
    val mu = (0 until d).map(j => q6(muRow.getDouble(j) / n)).toArray

    var v = Array.fill(d)(q6(1.0 / math.sqrt(d.toDouble)))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val bcMu = spark.sparkContext.broadcast(mu)
      val bcV = spark.sparkContext.broadcast(v)
      // dot_i = q6( sum_j (x_ij - mu_j) * v_j ): scan-local fold
      val dot = q6c((0 until d).map(j =>
        (col(s"x$j") - lit(bcMu.value(j))) * lit(bcV.value(j))).reduce(_ + _)).as("__dot")
      // w_j = decimal-sum_i q6((x_ij - mu_j) * dot_i)
      val wRow = vecs.select((col("*") +: Seq(dot)): _*)
        .select((0 until d).map(j =>
          dsum((col(s"x$j") - lit(bcMu.value(j))) * col("__dot")).as(s"w$j")): _*)
        .head()
      val w = (0 until d).map(j => q6(wRow.getDouble(j))).toArray
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
    Component(mu, v, lambda)
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
    * per-row arithmetic against broadcast model state — zero shuffle. */
  def residualized(df: DataFrame, vecCol: String, idCol: String,
                   c: Component): DataFrame = {
    val d = c.v.length
    val bcMu = df.sparkSession.sparkContext.broadcast(c.mu)
    val bcV = df.sparkSession.sparkContext.broadcast(c.v)
    def cx(j: Int) =
      q6c(element_at(col(vecCol), j + 1).cast("double")) - lit(bcMu.value(j))
    val dotE = q6c((0 until d).map(j => cx(j) * lit(bcV.value(j))).reduce(_ + _))
    val resid = graft.functions.TextFunctions.letBound(dotE) { dd =>
      array((0 until d).map(j => q6c(cx(j) - dd * lit(bcV.value(j)))): _*)
    }
    df.select(col(idCol), resid.as("rvec"))
  }

  /** Project vectors onto the fitted component: score = (x-μ)·v — the
    * whitening/1-D-layout read; scan-local, zero shuffle. */
  def projected(df: DataFrame, vecCol: String, idCol: String,
                c: Component): DataFrame = {
    val d = c.v.length
    val bcMu = df.sparkSession.sparkContext.broadcast(c.mu)
    val bcV = df.sparkSession.sparkContext.broadcast(c.v)
    val score = q6c((0 until d).map(j =>
      (q6c(element_at(col(vecCol), j + 1).cast("double")) - lit(bcMu.value(j))) *
        lit(bcV.value(j))).reduce(_ + _))
    df.select(col(idCol), score.as("pc1"))
  }
}
