package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the CCNet/"perplexity filter" shape
  * (Wenzek et al. 2020): fit a small LM on a trusted reference corpus,
  * score every candidate document by its cross-entropy under that
  * model, keep the low-perplexity (reference-like) tail.
  *
  * The model here is a bigram LM with add-one (Laplace) smoothing:
  *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
  * and a document's score is the mean negative log-likelihood over its
  * bigrams (cross-entropy in nats; perplexity = exp(score)).
  *
  * Scale design (100 TB): the fitted model IS two count tables
  * (bigrams, unigrams) — data, not driver state, so fitting is two
  * hash aggregations and scoring is two equi-joins keyed by the n-gram
  * string. The bigram table of a large reference is itself huge, so
  * the joins default to shuffle joins (AQE handles hot n-grams);
  * `broadcastModel = true` is the knob for genuinely small reference
  * models. Nothing is collected to the driver.
  *
  * Cross-engine determinism: each bigram's nll term is rounded to 6
  * decimals and accumulated as DECIMAL — an exact, partition-order-
  * independent sum (the qs05 centroid trick) — so the per-doc mean is
  * bit-stable vs the DuckDB oracle.
  */
object NgramLM {

  /** Fitted model: bigram counts, unigram counts, vocabulary size. */
  final case class Model(bigrams: DataFrame, unigrams: DataFrame, vocab: DataFrame)

  /** Fit the bigram model on a reference corpus: `bigrams(bg, c_bg)`,
    * `unigrams(w, c_w)` over lowercased whitespace tokens, and the
    * single-row `vocab(v)` = distinct-token count (the smoothing
    * denominator's V). */
  def fit(ref: DataFrame, textCol: String = "text"): Model = {
    val toks = ref.select(explode(tokens(lower(col(textCol)))).as("w"))
    val unigrams = toks.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val bigrams = ref
      .select(explode(shingles(lower(col(textCol)), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
    val vocab = unigrams.agg(count(lit(1)).cast("double").as("v"))
    Model(bigrams, unigrams, vocab)
  }

  /** Score every document: mean add-one-smoothed bigram nll
    * (`cross_entropy`, nats, round 6) plus its bigram count. Documents
    * with fewer than two tokens have no bigrams and score NULL. */
  def crossEntropy(docs: DataFrame, model: Model,
                   idCol: String = "doc_id", textCol: String = "text",
                   broadcastModel: Boolean = false): DataFrame = {
    val (bg, uni) =
      if (broadcastModel) (broadcast(model.bigrams), broadcast(model.unigrams))
      else (model.bigrams, model.unigrams)
    val docBg = docs.select(col(idCol),
        explode(shingles(lower(col(textCol)), 2)).as("bg"))
      .withColumn("w", substring_index(col("bg"), " ", 1))
    val nll = -log((coalesce(col("c_bg"), lit(0L)) + lit(1)).cast("double") /
                   (coalesce(col("c_w"), lit(0L)).cast("double") + col("v")))
    val scored = docBg
      .join(bg, Seq("bg"), "left")
      .join(uni, Seq("w"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col(idCol),
        round(nll, 6).cast("decimal(24,6)").as("nll"))
      // UNROUNDED quotient: the decimal sum is exact in both engines
      // and IEEE division is bit-deterministic, while ROUNDING a value
      // this close to a short decimal is where Spark's HALF_UP and
      // DuckDB's double rounding diverge (the qt13 lesson)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
           (sum(col("nll")).cast("double") / count(lit(1)))
             .as("cross_entropy"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("cross_entropy"))
  }
}
