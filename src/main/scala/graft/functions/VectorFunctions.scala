package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure Column expressions.
  *
  * `zip_with` + left-fold `aggregate` evaluate the dot product as a
  * sequential i=0..n-1 double accumulation — bit-identical to DuckDB's
  * `list_dot_product` over `DOUBLE[]`, which is what makes cosine
  * similarity oracle-checkable. Codegen'd, no UDF, no shuffle: at scale
  * this is a per-row projection inside the scan stage.
  */
object VectorFunctions {

  /** element cast so float embeddings accumulate in double precision */
  private def asD(v: Column): Column = v.cast("array<double>")

  /** codegen'd native dot product (expressions.DotProduct, registered
    * as `graft_dot_product` by GraftExtensions); see [[dotHof]] for the
    * pure-built-in formulation it replaced */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot_product", asD(a), asD(b))

  /** built-ins-only dot product (interpreted HOFs) — kept as the
    * reference implementation; DotProductSpec asserts bit-equality */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  /** codegen'd centered dot Σ (x_i − mu_i)·v_i — the PCA-plane kernel
    * (expressions.CenteredDot); [[centeredDotHof]] is the composed
    * formulation it must bit-match */
  def centeredDot(x: Column, mu: Column, v: Column): Column =
    call_function("graft_centered_dot", asD(x), asD(mu), asD(v))

  /** built-ins-only centered dot — kept as the reference
    * implementation; CenteredDotSpec asserts bit-equality */
  def centeredDotHof(x: Column, mu: Column, v: Column): Column =
    dot(zip_with(asD(x), asD(mu), (a, b) => a - b), v)

  /** cosine similarity, computed as dot / sqrt(norm_a * norm_b) —
    * mirror the oracle SQL's operation order exactly */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** cosine rounded for cross-engine comparison / ranking */
  def cosineRounded(a: Column, b: Column, digits: Int = 6): Column =
    round(cosine(a, b), digits)

  /** Random-hyperplane LSH bucket: k sign-bits from deterministic
    * md5-derived hyperplanes. Plane j's component i is
    * (hexdigit(md5(j ++ ":" ++ i)) - 7.5) — seedless, reproducible on
    * any engine. Used to bucket vectors so ANN probes only matching
    * buckets (the 100 TB scale path vs brute force). Delegates to the
    * native [[graft.functions.expressions.LshBucket]] (the HOF version
    * interprets planes × dim lambdas per row); [[lshBucketHof]] is the
    * built-ins-only formulation it must bit-match. */
  def lshBucket(v: Column, planes: Int, dim: Int): Column =
    call_function("graft_lsh_bucket", asD(v), lit(planes), lit(dim))

  /** HOF reference implementation of [[lshBucket]] (kept for the
    * bit-equality spec). */
  def lshBucketHof(v: Column, planes: Int, dim: Int): Column =
    graft.functions.TextFunctions.letBound(asD(v)) { vd =>
      array_join(
        array((0 until planes).map { j =>
          // sum_i v[i] * w[j][i]; w is md5-nibble derived so it constant-folds
          val proj = (0 until dim).map { i =>
            val nib = conv(substring(md5(lit(s"$j:$i")), 1, 1), 16, 10).cast("double") - 7.5
            element_at(vd, i + 1) * nib
          }.reduce(_ + _)
          when(proj >= 0, "1").otherwise("0")
        }: _*), "")
    }
}
