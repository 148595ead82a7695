package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training of the linear quality classifier — full-batch
  * gradient descent for logistic regression, the step that turns
  * [[LinearClassifier]] from "score with shipped weights" into "learn
  * the weights from labeled docs" (the fastText/DCLM quality-filter
  * training loop, distilled to its distributed core).
  *
  * Distributed shape (the MLlib/treeAggregate shape, done with exact
  * arithmetic): the featurized corpus is scanned once per step; each
  * step is ONE map-side-combined aggregation producing K gradient
  * scalars; the driver holds only the K-double weight vector between
  * steps (gradient metadata, not data — the same justified-collect
  * class as IVF's index metadata). Nothing per-row ever reaches the
  * driver, and a 1000-executor run does exactly `steps` passes over
  * the data with no shuffle beyond each step's K-cell partial-agg
  * merge.
  *
  * Cross-engine exactness (what makes a 3-step GD run hash-match a SQL
  * oracle): the only three nondeterminism hazards are killed one by
  * one —
  *  1. order-dependent double sums → each row's gradient contribution
  *     is rounded to 10 decimals and summed as DECIMAL(28,10) (exact,
  *     commutative);
  *  2. transcendentals → the logistic link is the RATIONAL sigmoid
  *     σ(z) = ½(1 + z/(1+|z|)) (Elliott 1993), pure IEEE +,×,÷,|·| —
  *     bit-identical in any IEEE-754 engine, no exp();
  *  3. expression order → dot products and the weight update are
  *     written in one fixed left-to-right order, mirrored verbatim in
  *     the oracle SQL.
  * Under those three rules every intermediate weight is bit-identical
  * across engines, so the final weights compare EXACTLY — a much
  * stronger statement than "converged to similar loss".
  */
object LogisticTrainer {

  /** Rational sigmoid — monotone, σ(0)=½, range (0,1), exact IEEE. */
  def fastSigmoid(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** Full-batch GD from w = 0. `features` must contain `labelCol`
    * (0.0/1.0 double) and `featureCols` (well-scaled doubles).
    * Returns the weight path: (step, featureIdx) → weight, where step
    * ranges 1..steps (the weights AFTER that step). */
  def train(features: DataFrame, featureCols: Seq[String],
            labelCol: String = "y", lr: Double = 0.5,
            steps: Int = 3): Array[Array[Double]] = {
    require(featureCols.nonEmpty && steps > 0)
    val k = featureCols.size
    val feats = features.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.count().toDouble // materializes the cache too
    val path = Array.ofDim[Double](steps, k)
    var w = Array.fill(k)(0.0)
    for (t <- 0 until steps) {
      // z in FIXED left-to-right order: w0*x0 + w1*x1 + ...
      val z = featureCols.zipWithIndex
        .map { case (c, j) => lit(w(j)) * col(c) }
        .reduceLeft(_ + _)
      val s = fastSigmoid(z)
      val gradCols = featureCols.zipWithIndex.map { case (c, j) =>
        sum(round((s - col(labelCol)) * col(c), 10).cast("decimal(28,10)"))
          .cast("double").as(s"g$j")
      }
      val g = feats.agg(gradCols.head, gradCols.tail: _*).head()
      w = w.zipWithIndex.map { case (wj, j) => wj - lr * (g.getDouble(j) / n) }
      path(t) = w
    }
    feats.unpersist()
    path
  }

  /** Training-set accuracy of a weight vector under the same exact
    * arithmetic (decision boundary σ(z) ≥ ½ ⇔ z ≥ 0). */
  def accuracy(features: DataFrame, weights: Seq[Double],
               featureCols: Seq[String], labelCol: String = "y"): Double = {
    val z = featureCols.zipWithIndex
      .map { case (c, j) => lit(weights(j)) * col(c) }
      .reduceLeft(_ + _)
    val hit = when((z >= 0.0) === (col(labelCol) === 1.0), 1L).otherwise(0L)
    val r = features.agg(sum(hit).as("h"), count(lit(1)).as("n")).head()
    r.getLong(0).toDouble / r.getLong(1).toDouble
  }
}
