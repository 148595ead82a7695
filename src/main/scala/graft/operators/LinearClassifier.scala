package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bag-of-words linear classifier scoring — the fastText /
  * DCLM-style model-based quality filter shape (Joulin et al. 2017;
  * Li et al. 2024): tokens hash into a fixed-dimension weight table,
  * a document's logit is the mean of its tokens' weights, and the
  * sigmoid of that logit is the quality probability used as a keep
  * threshold or sampling weight.
  *
  * The weights here are a deterministic stand-in (derived from
  * md5(bucket), uniform in [-1, 1)) because no trained artifact can
  * ship in this environment — but the SHAPE is the production one: at
  * 100 TB a real weight vector is a broadcast table or, as here, a
  * pure expression; scoring is a scan projection + one per-doc
  * aggregation, zero joins, zero shuffles beyond the doc-level agg.
  *
  * Cross-engine determinism: per-token weights are rounded to 6
  * decimals and summed as DECIMAL (exact, order-independent), so the
  * mean logit and its sigmoid are bit-stable vs the DuckDB oracle.
  */
object LinearClassifier {

  /** Feature bucket of a token: first 16 bits of md5, mod `dim`. */
  def tokenBucket(tok: Column, dim: Int): Column =
    pmod(conv(substring(md5(tok), 1, 4), 16, 10).cast("long"), lit(dim.toLong))

  /** Deterministic weight of a bucket: uniform in [-1, 1) from
    * md5(bucket), rounded to 6 decimals (exactly representable as
    * DECIMAL — the summation contract). */
  def bucketWeight(bucket: Column): Column =
    round(conv(substring(md5(bucket.cast("string")), 1, 4), 16, 10)
      .cast("double") / 65536.0 * 2.0 - 1.0, 6)

  /** Per-doc classifier score: token count, mean token weight
    * (`logit`) and `prob` = sigmoid(logit) (round 6). The logit is the
    * UNROUNDED quotient exact-decimal-sum / count: IEEE division of
    * identical operands is bit-deterministic in both engines, whereas
    * rounding it is NOT — the quotient of a 6-decimal sum by a small
    * integer lands so close to short decimals that Spark's BigDecimal
    * HALF_UP and DuckDB's double rounding disagree (observed:
    * 0.063149 vs 0.063148). `prob` goes through exp() whose output is
    * engine-ulp territory, so THAT is rounded — its values are far
    * from decimal boundaries. Documents with no tokens score NULL. */
  def score(docs: DataFrame, dim: Int = 64,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val perTok = docs.select(col(idCol),
        explode(tokens(lower(col(textCol)))).as("tok"))
      .select(col(idCol),
        bucketWeight(tokenBucket(col("tok"), dim))
          .cast("decimal(18,6)").as("w"))
    val scored = perTok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
           (sum(col("w")).cast("double") / count(lit(1))).as("logit"))
      .withColumn("prob", round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 6))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("logit"), col("prob"))
  }
}
