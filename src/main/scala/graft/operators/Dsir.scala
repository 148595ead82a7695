package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — the DSIR recipe (Xie et
  * al. 2023): estimate how target-domain-like every raw document is by
  * the log ratio of two hashed bag-of-features models, one fit on a
  * target corpus, one on the raw pool; resampling by these weights
  * shifts the pool toward the target distribution.
  *
  * Model here: unigram tokens hashed into `dim` buckets (same bucket
  * function as [[LinearClassifier]]), add-one smoothing:
  *   logw(doc) = Σ_tok [ ln((t_c+1)/(T+dim)) − ln((r_c+1)/(R+dim)) ]
  * with t_c/r_c the token-bucket's target/raw counts and T/R totals.
  *
  * Scale shape (100 TB): both models ARE one bucket-count table each —
  * `dim` rows, built by one corpus aggregation apiece (map-side
  * combined; the target pass is a filtered scan of the same corpus).
  * The per-bucket log-ratio term is precomputed on that `dim`-row
  * table and BROADCAST, so scoring is scan → explode → broadcast hash
  * join → per-doc aggregation: the corpus is never shuffled except by
  * doc id for the final agg. Cross-engine determinism: the per-bucket
  * term is rounded to 6 decimals (the only transcendentals) and the
  * per-doc sum is an exact DECIMAL accumulation.
  */
object Dsir {

  /** Per-doc DSIR log importance weight of every document against the
    * target subset defined by `targetFilter` (a boolean Column over
    * `docs`' columns). Output: id, `n_feats` (token occurrences),
    * `dsir_logw` (NULL for token-less docs). */
  def importanceWeights(docs: DataFrame, targetFilter: Column, dim: Int = 256,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val feats = docs
      .select(col(idCol), targetFilter.as("is_target"),
        explode(tokens(lower(col(textCol)))).as("tok"))
      .select(col(idCol), col("is_target"),
        LinearClassifier.tokenBucket(col("tok"), dim).as("bkt"))
    val rawc = feats.groupBy(col("bkt")).agg(count(lit(1)).as("r_c"))
    val tgtc = feats.filter(col("is_target"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("t_c"))
    val rTot = rawc.agg(sum(col("r_c")).cast("double").as("r_tot"))
    val tTot = tgtc.agg(coalesce(sum(col("t_c")), lit(0L)).cast("double").as("t_tot"))
    // dim-row model table with the per-bucket log-ratio term, broadcast
    val terms = rawc.join(tgtc, Seq("bkt"), "left")
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("bkt"),
        round(log((coalesce(col("t_c"), lit(0L)) + lit(1)) / (col("t_tot") + lit(dim.toDouble))) -
              log((col("r_c") + lit(1)) / (col("r_tot") + lit(dim.toDouble))), 6)
          .cast("decimal(18,6)").as("w"))
    val perDoc = feats.join(broadcast(terms), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
           sum(col("w")).cast("double").as("dsir_logw"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("dsir_logw"))
  }
}
