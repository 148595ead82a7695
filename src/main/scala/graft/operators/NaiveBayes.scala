package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multinomial Naive Bayes — the third in-engine TRAINING family next
  * to the logistic trainer (discriminative) and k-means (clustering):
  * the generative classifier whose training IS aggregation, which
  * makes it the natural 100 TB baseline — one pass of per-(class,
  * bucket) token counts and the model is fit; no iteration, no driver
  * state beyond nothing (the model stays a DataFrame).
  *
  * Same hashed bag-of-words feature space as
  * [[LinearClassifier.tokenBucket]] / [[Dsir]] (md5-prefix buckets —
  * cross-engine exact), Laplace-smoothed:
  * p(bkt|class) = (cnt+1)/(tot_class + dim) over the FULL class×dim
  * grid (zero-count buckets carry their smoothed mass — scoring needs
  * them). Determinism discipline: counts are exact integers; each
  * log evaluates on identical doubles in both engines and is rounded
  * to 6 (the qt19 transcendental contract); scoring sums
  * token-count × DECIMAL(18,6) log-terms exactly, so the per-class
  * scores — and the argmax — are pure functions of the corpus.
  *
  * Model encoding: per-bucket rows (label, bkt ∈ [0,dim), cnt, logp)
  * plus one PRIOR row per class at bkt = −1 (cnt = class doc count,
  * logp = ln(class share)); one table ships the whole model.
  */
object NaiveBayes {

  /** Per-doc hashed feature census: (id, label, bkt, n) — ≤ dim rows
    * per doc, the compact table BOTH train and score aggregate from.
    * Materializing it once halves the expensive tokenize+explode scan
    * when a query trains and scores over the same corpus (qt33). */
  def featureCensus(docs: DataFrame, labelCol: String, dim: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    docs
      .select(col(idCol), col(labelCol).as("label"),
        explode(tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), col("label"),
        LinearClassifier.tokenBucket(col("tok"), dim).as("bkt"))
      .groupBy(col(idCol), col("label"), col("bkt"))
      .agg(count(lit(1)).as("n"))
  }

  /** Fit from a prepared [[featureCensus]]. `docs` is still read for
    * the priors (doc counts per class — zero-token docs count there
    * but have no features), a column-pruned scan of (label) only. */
  def trainFromCensus(census: DataFrame, docs: DataFrame, labelCol: String,
                      dim: Int = 64): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val counts = census.groupBy(col("label"), col("bkt")).agg(sum(col("n")).as("cnt"))
    val totals = counts.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
    val grid = totals.select(col("label"), col("tot"),
      explode(sequence(lit(0L), lit(dim - 1L))).as("bkt"))
    val model = grid.join(counts, Seq("label", "bkt"), "left")
      .select(col("label"), col("bkt"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        round(log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
                  (col("tot") + lit(dim.toLong)).cast("double")), 6).as("logp"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val priors = docs.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nDocs))
      .select(col("label"), lit(-1L).as("bkt"), col("cnt"),
        round(log(col("cnt").cast("double") / col("n").cast("double")), 6).as("logp"))
    model.unionByName(priors)
  }

  /** Fit the model. Output: (label, bkt, cnt, logp) — see encoding
    * above. */
  def train(docs: DataFrame, labelCol: String, dim: Int = 64,
            textCol: String = "text"): DataFrame = {
    // an ad-hoc per-(label,bkt) census without the doc id — identical
    // counts to aggregating featureCensus, one fewer grouping column
    val census = docs
      .select(col(labelCol).as("label"), explode(tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("label"), LinearClassifier.tokenBucket(col("tok"), dim).as("bkt"))
      .groupBy(col("label"), col("bkt")).agg(count(lit(1)).as("n"))
    trainFromCensus(census, docs, labelCol, dim)
  }

  /** Score from a prepared [[featureCensus]] — see [[score]]. */
  def scoreFromCensus(census: DataFrame, model: DataFrame,
                      idCol: String = "doc_id"): DataFrame = {
    val feats = census.groupBy(col(idCol), col("bkt")).agg(sum(col("n")).as("n"))
    scoreFeatures(feats, model, idCol)
  }

  /** Score every doc under a trained model: per-class score =
    * prior + Σ_bkt n_tokens(bkt) × logp(bkt|class), argmax with
    * larger-label tie-break. The model is broadcast (classes × dim
    * rows); the corpus contributes one feature aggregation and one
    * per-(doc, class) decimal sum. Output: (id, pred_label, score). */
  def score(docs: DataFrame, model: DataFrame, dim: Int = 64,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val feats = docs
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), LinearClassifier.tokenBucket(col("tok"), dim).as("bkt"))
      .groupBy(col(idCol), col("bkt")).agg(count(lit(1)).as("n"))
    scoreFeatures(feats, model, idCol)
  }

  private def scoreFeatures(feats: DataFrame, model: DataFrame,
                            idCol: String): DataFrame = {
    val m = model.filter(col("bkt") >= 0)
      .select(col("label"), col("bkt"), col("logp").cast(DecimalType(18, 6)).as("lp"))
    val priors = model.filter(col("bkt") === -1)
      .select(col("label"), col("logp").cast(DecimalType(18, 6)).as("prior"))
    feats.join(broadcast(m), Seq("bkt"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("n") * col("lp")).as("ts"))
      .join(broadcast(priors), Seq("label"))
      .select(col(idCol), col("label"), (col("ts") + col("prior")).cast("double").as("score"))
      .groupBy(col(idCol))
      .agg(max(struct(col("score"), col("label"))).as("m"))
      .select(col(idCol), col("m.label").as("pred_label"), col("m.score").as("score"))
  }
}
