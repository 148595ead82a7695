package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left (probe) row is paired with the most
  * recent right (reference) row whose timestamp is at-or-before the
  * probe's, per key — the temporal join every training-data pipeline
  * needs for "state as of event time" features (e.g. the last page
  * view before a purchase, the model-card revision in force at commit
  * time). The reference has no such operator (SURVEY.md §2.A notes no
  * as-of/interval joins anywhere); Spark has no built-in either, so
  * this is a composed-operator implementation per the custom-operator
  * preference order.
  *
  * Scale design (100 TB): the naive formulation is a range join
  * (`l.key = r.key AND r.ts <= l.ts` + argmax), which Spark plans as an
  * equi join whose output explodes to |matches-per-probe| before a
  * window prunes it — quadratic in dense keys. This implementation is
  * the canonical union-scan shape instead:
  *
  *  1. tag right rows marker=0 and left rows marker=1, union the two
  *     sides (right payload carried as one nullable struct),
  *  2. one window, partitioned by key, ordered by (ts, marker, seq):
  *     `last(right_payload, ignoreNulls)` over unbounded-preceding —
  *     a running "latest reference row seen so far",
  *  3. keep marker=1 rows: each probe holds exactly the latest
  *     at-or-before reference row (marker 0 < 1 makes equal-ts
  *     reference rows visible to same-ts probes).
  *
  * Cost: ONE shuffle of |left|+|right| rows on the key, a sort within
  * partitions, zero row amplification — the same price as a sort-merge
  * join. Per-key data never needs to fit in memory (the window frame is
  * running-last, which Spark evaluates streamingly within the sorted
  * partition). Skewed hot keys are the residual risk, same as any
  * keyed window; AQE does not split window partitions, so a pathological
  * key would need the [[Skew]] salting pattern with per-salt carry-in.
  */
object AsOfJoin {

  private def tagged(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String, rightSeq: String,
                     rightCols: Seq[String]): (DataFrame, Seq[String]) = {
    val leftFields = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)

    val rCols: Seq[Column] =
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__m"),
          col(rightSeq).cast("string").as("__seq"), payload.as("__ref")) ++
        leftFields.filterNot(_ == key)
          .map(f => lit(null).cast(left.schema(f).dataType).as(f))
    val r = right.select(rCols: _*)

    val lCols: Seq[Column] =
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__m"),
          lit("").as("__seq"),
          lit(null).cast(r.schema("__ref").dataType).as("__ref")) ++
        leftFields.filterNot(_ == key).map(col)
    val l = left.select(lCols: _*)

    (r.unionByName(l), leftFields)
  }

  private def pickMatches(union: DataFrame, key: String, w: org.apache.spark.sql.expressions.WindowSpec,
                          leftFields: Seq[String], rightCols: Seq[String]): DataFrame =
    union
      .withColumn("__match", last(col("__ref"), ignoreNulls = true).over(w))
      .filter(col("__m") === 1)
      .select(leftFields.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c")): _*)

  /** @param left      probe side
    * @param right     reference side
    * @param key       equi-join column name (present on both sides)
    * @param leftTs    probe-time column on `left`
    * @param rightTs   reference-time column on `right`
    * @param rightSeq  total-order tie-break on the reference side: among
    *                  equal (key, ts) reference rows the one sorting
    *                  LAST by this column wins (deterministic argmax)
    * @param rightCols reference payload columns to attach to each probe
    *                  row (null when no reference row is at-or-before)
    * @return `left` columns + `rightCols` (each aliased `asof_<name>`)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, rightSeq: String,
                   rightCols: Seq[String]): DataFrame = {
    val (union, leftFields) = tagged(left, right, key, leftTs, rightTs, rightSeq, rightCols)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__m").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pickMatches(union, key, w, leftFields, rightCols)
  }

  /** Forward as-of: earliest reference row at-or-after the probe — the
    * mirror image (time order reversed). At equal ts the reference is
    * still visible to the probe (marker asc); `__seq` DESC under the
    * descending time scan makes the smallest-seq reference the last one
    * seen, i.e. the winner — the deterministic "first by seq" argmin. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, rightSeq: String,
                  rightCols: Seq[String]): DataFrame = {
    val (union, leftFields) = tagged(left, right, key, leftTs, rightTs, rightSeq, rightCols)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__m").asc, col("__seq").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pickMatches(union, key, w, leftFields, rightCols)
  }
}
