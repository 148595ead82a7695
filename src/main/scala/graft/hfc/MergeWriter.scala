package graft.hfc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upsert semantics on plain DataFrames — the reference's three write
  * modes (SURVEY.md §2.A sinks), set-oriented instead of row-at-a-time:
  *
  *  - K2 `INSERT ... ON DUPLICATE KEY UPDATE` → [[upsert]]
  *  - K3 `INSERT IGNORE` (first-writer-wins)  → [[insertIfAbsent]]
  *  - K4 targeted column UPDATE               → [[updateColumns]]
  *
  * All three are pure DataFrame→DataFrame consolidations (testable
  * without I/O); a physical writer would wrap them in an atomic
  * partition swap or a lakehouse MERGE. Batch-internal duplicates are
  * resolved first (`dropDuplicates(keys)` keeping the LAST occurrence,
  * matching the reference's per-row loop where later rows win).
  *
  * Scale: one shuffle on the key columns per merge (full outer hash
  * join); at 100 TB both sides would be bucketed by key so the join is
  * shuffle-free, and AQE handles skewed keys.
  */
object MergeWriter {

  /** Keep the LAST row per key within a batch (reference loop order).
    *
    * Ordering contract: pass `seqCol` (an explicit monotone sequence —
    * ingest offset, event time + tiebreak, file row number) whenever
    * the batch may have been shuffled: "batch order" is not
    * well-defined after an exchange. Without `seqCol` the fallback is
    * `monotonically_increasing_id()`, which encodes
    * partition-then-row order — deterministic ONLY for single-lineage
    * batches read straight from an ordered source (the reference's
    * per-row loop case). MergePropertiesSpec pins both: explicit-seq
    * last-wins survives a repartition; the fallback is documented as
    * requiring the single-lineage precondition. */
  private[hfc] def dedupeBatch(batch: DataFrame, keys: Seq[String],
                               seqCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__seq").desc)
    batch
      .withColumn("__seq", seqCol.map(col).getOrElse(monotonically_increasing_id()))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__seq", "__rn")
  }

  /** K2: insert new keys, overwrite all non-key columns for existing
    * keys with the update's values (NULL in the update wins too, as in
    * SQL `UPDATE c = VALUES(c)`). */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String],
             seqCol: Option[String] = None): DataFrame = {
    val u = dedupeBatch(updates, keys, seqCol)
    val valueCols = existing.columns.filterNot(keys.contains)
    val e2 = existing.select(keys.map(col) ++ valueCols.map(c => col(c).as(s"__e_$c")): _*)
    val u2 = u.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"__u_$c")) :+ lit(true).as("__upd"): _*)
    e2.join(u2, keys, "full_outer")
      .select(keys.map(col) ++ valueCols.map { c =>
        when(col("__upd").isNotNull, col(s"__u_$c")).otherwise(col(s"__e_$c")).as(c)
      }: _*)
  }

  /** K3: keep existing rows untouched; append only rows whose key is
    * absent (left anti join — the reference's INSERT IGNORE). */
  def insertIfAbsent(existing: DataFrame, updates: DataFrame, keys: Seq[String],
                     seqCol: Option[String] = None): DataFrame = {
    val fresh = dedupeBatch(updates, keys, seqCol)
      .join(existing.select(keys.map(col): _*), keys, "left_anti")
    existing.unionByName(fresh)
  }

  /** K4: update ONLY `cols` for matching keys (e.g. the stale-repo
    * fast path refreshing likes/downloads, databaseImport.py:609-618;
    * discussion status-only update, :490-492). Non-matching update rows
    * are ignored; other columns keep their existing values. */
  def updateColumns(existing: DataFrame, updates: DataFrame, keys: Seq[String],
                    cols: Seq[String], seqCol: Option[String] = None): DataFrame = {
    val u = dedupeBatch(updates, keys, seqCol)
      .select(keys.map(col) ++ cols.map(c => col(c).as(s"__u_$c")) :+ lit(true).as("__upd"): _*)
    existing.join(u, keys, "left_outer")
      .select(existing.columns.map { c =>
        if (cols.contains(c))
          when(col("__upd").isNotNull, col(s"__u_$c")).otherwise(col(c)).as(c)
        else col(c)
      }.toIndexedSeq: _*)
  }

  /** F1: split a batch on the incremental watermark — rows older than
    * `limitDate` take the cheap K4 path, newer rows the full K2 path
    * (databaseImport.py:607-619). Returns (stale, fresh). */
  def stalenessSplit(batch: DataFrame, tsCol: String, limitDate: Column): (DataFrame, DataFrame) =
    (batch.filter(col(tsCol) < limitDate), batch.filter(col(tsCol) >= limitDate))
}
