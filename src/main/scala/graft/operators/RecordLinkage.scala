package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969) — the
  * entity-resolution operator: score candidate record pairs by
  * per-field agreement evidence and classify match / possible /
  * non-match. The ingest-side sibling of the dedup plane: dedup asks
  * "is this CONTENT a copy", linkage asks "are these two RECORDS the
  * same entity" when fields are dirty (typos, missing values) and no
  * single key works.
  *
  * Model: each field carries m = P(agree | same entity) and
  * u = P(agree | different entities); agreement contributes
  * log2(m/u) > 0 to the pair's weight, disagreement
  * log2((1−m)/(1−u)) < 0; the summed weight classifies against two
  * thresholds, with the middle band flagged for review — the
  * Fellegi–Sunter decision rule.
  *
  * Scale shape: candidate pairs exist ONLY within blocks (the equi
  * join on the blocking key — the qd02 block discipline; [[Skew
  * .joinMass]] on the block key prices the pair volume beforehand),
  * and the weight is a scan-local expression over the joined row —
  * no aggregation, no second shuffle. Cross-engine determinism: the
  * log-weights are evaluated ONCE in Scala and injected as double
  * literals into both plans ([[FieldRule.wAgree]] formatted via
  * Double.toString round-trips bit-exactly through any SQL parser),
  * so neither engine computes a transcendental.
  *
  * NULL fields count as disagreement (a missing value is evidence
  * against, per the m/u model's agreement event).
  */
object RecordLinkage {

  final case class FieldRule(leftCol: String, rightCol: String, m: Double, u: Double) {
    require(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0 && m > u,
      s"need 0 < u < m < 1, got m=$m u=$u")
    def wAgree: Double = math.log(m / u) / math.log(2.0)
    def wDisagree: Double = math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Score every within-block candidate pair. `left`/`right` column
    * names must be disjoint apart from nothing — the blocking columns
    * are named per side. Output: (idLeft, idRight, weight) with
    * weight rounded to 6 (a sum of ≤ |rules| literals in fixed
    * expression order — bit-stable). */
  def linkScores(left: DataFrame, right: DataFrame,
                 leftBlock: String, rightBlock: String,
                 idLeft: String, idRight: String,
                 rules: Seq[FieldRule]): DataFrame = {
    require(rules.nonEmpty, "at least one field rule required")
    val pairs = left.join(right, col(leftBlock) === col(rightBlock))
    val weight = rules.map { r =>
      when(col(r.leftCol) === col(r.rightCol), lit(r.wAgree)).otherwise(lit(r.wDisagree))
    }.reduce(_ + _)
    pairs.select(col(idLeft), col(idRight), round(weight, 6).as("weight"))
  }

  /** The Fellegi–Sunter decision rule over scored pairs. */
  def classify(scores: DataFrame, upper: Double, lower: Double): DataFrame = {
    require(upper > lower, s"need upper > lower, got $upper <= $lower")
    scores.withColumn("verdict",
      when(col("weight") >= upper, lit("match"))
        .when(col("weight") >= lower, lit("possible"))
        .otherwise(lit("non_match")))
  }
}
