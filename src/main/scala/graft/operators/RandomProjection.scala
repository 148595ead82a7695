package graft.operators

import graft.functions.TextFunctions.letBound
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the dimensionality-
  * reduction front end of the embedding plane: a fixed ±1 sign matrix
  * maps d-dimensional vectors to m ≪ d coordinates while approximately
  * preserving angles (the JL lemma with Rademacher entries), so the
  * reduced space can drive cheaper ANN candidate generation, sketch
  * storage (m ints vs d floats), and distance reads at a fraction of
  * the scan width. qs18 prices the trade continuously: recall@5 of
  * reduced-space neighbors against full-space brute force.
  *
  * Scale shape: the projection is a per-row integer fold inside the
  * scan stage — zero shuffle, codegen'd, no model state. The sign
  * matrix is md5-derived (seedless, engine-independent): sign(j,i) =
  * +1 iff the first hex nibble of md5("jl:j:i") ≥ 8 — the same
  * convention as [[graft.functions.VectorFunctions.lshBucket]]'s
  * hyperplanes, under a distinct "jl:" salt.
  *
  * Cross-engine exactness: inputs quantize to micro-units (round(x·1e6)
  * as Long), so every projected coordinate is an EXACT integer sum of
  * ±micro-values — order-free, bit-identical in DuckDB's BIGINT
  * list_sum. The uniform 1/√m JL scale is omitted: cosine and rank
  * reads are scale-invariant, and keeping coordinates integral keeps
  * the oracle exact.
  */
object RandomProjection {

  /** ±1 Rademacher entry for output dim j, input dim i. */
  def sign(j: Int, i: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$j:$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) >= 8) 1 else -1
  }

  /** (idCol, rvec): the m-dimensional projection y_j = Σ_i s_ji ·
    * round(x_i·1e6), emitted as array<double> of exactly-representable
    * integers so the vector plane's dot/cosine machinery applies
    * unchanged. Each row of the sign matrix is a ±1.0 literal array
    * and y_j is one native [[graft.functions.expressions.DotProduct]]
    * call — a compact codegen loop instead of an m·d-term unrolled
    * fold (the unrolled form compiled to multi-MB methods that
    * dominated wall time). Exactness is unchanged: the micro-values
    * are integer-valued doubles ≤ ~5e7, products are exact sign flips,
    * and partial sums stay ≤ d·5e7 ≪ 2^53, so the double fold IS
    * integer arithmetic — order-free, bit-equal to the oracle's
    * BIGINT list_sum. */
  def projected(df: DataFrame, idCol: String, vecCol: String,
                m: Int, d: Int): DataFrame = {
    require(m > 0 && d > 0, s"need positive dims, got m=$m d=$d")
    val xm = transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(1e6) + lit(0.5)))
    val y = letBound(xm) { v =>
      array((0 until m).map { j =>
        graft.functions.VectorFunctions.dot(
          v, lit((0 until d).map(i => sign(j, i).toDouble).toArray))
      }: _*)
    }
    df.select(col(idCol), y.as("rvec"))
  }
}
