package graft.hfc

import org.apache.spark.sql.{Column, DataFrame}

/** The reference's monthly incremental-refresh contract (SURVEY.md
  * §1.5.8, databaseImport.py:607-619,858-868) as one set-oriented job:
  *
  *  - repos with `last_modified < limitDate` (stale): ONLY the counter
  *    columns (likes/downloads) are refreshed — K4 fast path;
  *  - repos at/after the watermark (fresh): full upsert — K2 path;
  *  - everything else in `existing` is untouched.
  *
  * One pass over the batch, two merges; both are key-shuffle joins that
  * bucket/broadcast at scale. Idempotent: re-running the same batch
  * converges (IncrementalRefreshSpec).
  */
object IncrementalRefresh {

  def refresh(existing: DataFrame, batch: DataFrame, keys: Seq[String],
              tsCol: String, limitDate: Column,
              counterCols: Seq[String]): DataFrame = {
    val (stale, fresh) = MergeWriter.stalenessSplit(batch, tsCol, limitDate)
    val afterCounters = MergeWriter.updateColumns(existing, stale, keys, counterCols)
    MergeWriter.upsert(afterCounters, fresh, keys)
  }

  /** The same contract against a [[PartitionedMergeWriter]]-layout
    * table: the stale fast path and the fresh full path each touch
    * ONLY the partitions their keys hash to — a monthly refresh over a
    * 63 M-row table costs O(batch), not O(table). Returns the affected
    * partition ids (stale, fresh). */
  def refreshPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                         batch: DataFrame, keys: Seq[String], partitionKey: String,
                         nPartitions: Int, tsCol: String, limitDate: Column,
                         counterCols: Seq[String]): (Seq[Int], Seq[Int]) = {
    val (stale, fresh) = MergeWriter.stalenessSplit(batch, tsCol, limitDate)
    val stupd = PartitionedMergeWriter.updateColumnsPartitioned(
      spark, path, stale.select((keys ++ counterCols).map(org.apache.spark.sql.functions.col): _*),
      keys, counterCols, partitionKey, nPartitions)
    val frupd = PartitionedMergeWriter.upsertPartitioned(
      spark, path, fresh, keys, partitionKey, nPartitions)
    (stupd, frupd)
  }
}
