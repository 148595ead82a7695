package graft.tools

import graft.GraftSession
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Measures what [[graft.plans.DotProductRewrite]] buys:
  * `runMain graft.tools.ProfileDotRewrite [nRows] [dim]`.
  *
  * Three formulations of the same per-row dot product over
  * materialized array<double> columns:
  *  - HOF, rewrite suppressed: the `aggregate(zip_with(...))` chain
  *    seeded with -0.0 — outside the rule's bit-exactness guard, so it
  *    executes as interpreted lambdas (what a user paid before the
  *    rule existed);
  *  - HOF, rewrite ON: the same user-written +0.0 fold, rewritten by
  *    the injected rule into the native expression;
  *  - native call: graft_dot_product invoked directly.
  * Rewritten and native must time alike (they run the same plan) and
  * all three must agree to the last bit (-0.0 + x == +0.0 + x for
  * every x the generator emits). */
object ProfileDotRewrite {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = GraftSession.local(appName = "profile-dot-rewrite")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dot] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // deterministic dense vectors, materialized so every variant reads
    // the same in-memory arrays (generation cost excluded)
    val vecs = spark.range(nRows)
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id"), i), lit(1000L)).cast("double") - 500.0) / 250.0)
          .as("a"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id"), i, lit(7)), lit(1000L)).cast("double") - 500.0) / 250.0)
          .as("b"))
      .localCheckpoint(true)
    println(s"[dot] $nRows rows, dim $dim")

    def hofSuppressed = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y), lit(-0.0), (s, v) => s + v)

    // sum over all rows forces full evaluation; DECIMAL cast keeps the
    // reduction order-independent so the equality check is exact
    def total(c: org.apache.spark.sql.Column): java.math.BigDecimal =
      vecs.select(sum(round(c, 6).cast("decimal(28,6)")).as("t"))
        .head().getDecimal(0)

    val warm = total(VectorFunctions.dot(col("a"), col("b"))) // JIT/codegen warmup
    val tInterp = time("HOF (rewrite suppressed)")(total(hofSuppressed))
    val tRewrite = time("HOF (rewritten by rule)")(
      total(VectorFunctions.dotHof(col("a"), col("b"))))
    val tNative = time("native graft_dot_product")(
      total(VectorFunctions.dot(col("a"), col("b"))))
    require(tInterp == tRewrite && tRewrite == tNative && warm == tNative,
      s"formulations disagree: $tInterp / $tRewrite / $tNative")
    println("[dot] all three formulations agree exactly")
    spark.stop()
  }
}
