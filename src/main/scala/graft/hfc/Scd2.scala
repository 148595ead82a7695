package graft.hfc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance — the K-plane member
  * [[MergeWriter]]'s upsert cannot express: instead of overwriting a
  * dimension row, every attribute change CLOSES the current version
  * (`valid_to` = change time) and opens a new one (`valid_to` NULL),
  * so any fact can be joined to the attribute values that were true
  * AT ITS OWN TIMESTAMP (the as-of join's dimension-side dual).
  *
  * Semantics (per key, updates applied in (ts, tie-break) order):
  * consecutive updates with an unchanged attribute collapse — a
  * version row exists only where the value actually changed,
  * including against the standing current row; a batch may carry many
  * changes for one key and yields the full version chain.
  *
  * Scale shape: everything is key-partitioned — one lag/lead window
  * pair over the (existing-current ∪ updates) frame per key, one
  * union with untouched history. No driver state, no row-at-a-time
  * merge; at 100 TB the dimension's key space shards like any other
  * aggregation. Deterministic: the tie-break column makes the version
  * order a total order, so the history is a pure function of inputs
  * (and the build path is oracle-checkable as qk01).
  */
object Scd2 {

  /** Apply `updates` (key, attr, ts, tieBreak) to a standing SCD2
    * `history` (key, attr, valid_from, valid_to — NULL = current).
    * Pass an empty history (same schema) to build from scratch.
    * Output: the complete new history. */
  def applyChanges(history: DataFrame, updates: DataFrame,
                   keyCol: String, attrCol: String,
                   tsCol: String, tieCol: String): DataFrame = {
    val k = col(keyCol)
    // the standing current row joins the ordering frame BEFORE every
    // update (order rank -1), so the first update dedupes against it
    val current = history.filter(col("valid_to").isNull)
      .select(k, col(attrCol), col("valid_from").as("__ts"),
        lit(-1L).as("__tie"), lit(true).as("__standing"))
    val incoming = updates
      .select(k, col(attrCol), col(tsCol).as("__ts"),
        col(tieCol).cast("long").as("__tie"), lit(false).as("__standing"))
    val w = Window.partitionBy(k).orderBy(col("__standing").desc, col("__ts"), col("__tie"))
    val chain = current.unionByName(incoming)
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // keep only actual changes; null-safe so a transition TO or FROM a
      // NULL attribute is a real change and runs of NULLs collapse. The
      // first row per key is identified by row_number, NOT by __prev
      // being NULL — lag's NULL is ambiguous with a genuine NULL attr.
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .withColumn("valid_from", col("__ts"))
      // lead over the FILTERED frame: a collapsed no-change row must
      // not bound the surviving version's validity
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(k).orderBy(col("__standing").desc, col("__ts"), col("__tie"))))
      .select(k, col(attrCol), col("valid_from"), col("valid_to"))
    history.filter(col("valid_to").isNotNull).unionByName(chain)
  }
}
