package graft.hfc

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MERGE that touches only the partitions containing
  * update keys — the reference's stale-repo fast path
  * (databaseImport.py:607-619) generalized to a partitioned parquet
  * table.
  *
  * [[MergeWriter.upsert]] is semantically perfect but consolidates via
  * a full-outer join over the ENTIRE table: a monthly refresh of a few
  * thousand repos against a 63 M-row `repo_file` would rewrite
  * everything. Here the table is laid out as `part_id=<hash-prefix>`
  * directories (a stable key prefix: `crc32(key) mod nPartitions`), an
  * update batch:
  *
  *  1. derives its affected partition ids (≤ nPartitions small ints —
  *     index metadata, collected so the `IN` lands in the scan as a
  *     PartitionFilter),
  *  2. reads ONLY those partitions (partition-pruned scan),
  *  3. runs the ordinary [[MergeWriter]] consolidation on that slice,
  *  4. writes the merged slice to a staging dir inside the table root
  *     (`.staging`, invisible to partition discovery) and swaps each
  *     affected `part_id=` directory in with [[AtomicSwap]]'s
  *     crash-safe rename protocol.
  *
  * Untouched partitions' files are never opened, rewritten, or moved —
  * PartitionedMergeSpec pins that byte-for-byte. At 100 TB this is the
  * difference between a merge proportional to the update and one
  * proportional to the table. A crash mid-swap leaves some partitions
  * merged and some not; [[recover]] repairs interrupted renames and
  * re-running the same upsert converges (per-partition upsert is
  * idempotent).
  */
object PartitionedMergeWriter {

  val PartCol = "part_id"

  /** stable key-prefix partition: crc32(key) mod n */
  def partitionOf(key: Column, nPartitions: Int): Column =
    pmod(crc32(key.cast("string")), lit(nPartitions.toLong)).cast("int")

  /** One-time layout job: write `df` partitioned by the key prefix. */
  def initTable(df: DataFrame, path: String, partitionKey: String, nPartitions: Int): Unit =
    df.withColumn(PartCol, partitionOf(col(partitionKey), nPartitions))
      .write.mode("overwrite").partitionBy(PartCol).parquet(path)

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def partDir(path: String, p: Int): String = s"$path/$PartCol=$p"

  /** Repair interrupted partition swaps; call before reading the
    * table after an unclean shutdown. Safe to run always. */
  def recover(spark: SparkSession, path: String, nPartitions: Int): Unit = {
    val f = fs(spark)
    (0 until nPartitions).foreach(p => AtomicSwap.recoverDir(f, partDir(path, p)))
    f.delete(new Path(s"$path/.staging"), true)
    ()
  }

  /** K2 upsert against the partitioned table at `path`, rewriting only
    * affected partitions. `partitionKey` must be one of `keys` and the
    * same column `initTable` partitioned by. Returns the affected
    * partition ids. */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                        keys: Seq[String], partitionKey: String,
                        nPartitions: Int): Seq[Int] =
    mergePartitioned(spark, path, updates, keys, partitionKey, nPartitions) {
      (existing, u) => MergeWriter.upsert(existing, u, keys :+ PartCol)
    }

  /** K4 targeted-column UPDATE (the reference's stale-repo fast path,
    * databaseImport.py:609-618) against the partitioned table: only
    * `cols` change, only for matching keys, only in the partitions the
    * update keys hash to. Non-matching update rows are ignored, like
    * [[MergeWriter.updateColumns]]. */
  def updateColumnsPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                               keys: Seq[String], cols: Seq[String], partitionKey: String,
                               nPartitions: Int): Seq[Int] =
    mergePartitioned(spark, path, updates, keys, partitionKey, nPartitions) {
      (existing, u) => MergeWriter.updateColumns(existing, u, keys :+ PartCol, cols)
    }

  /** General partition-pruned fold: consolidate the affected slices of
    * the standing table with an updates batch under a CALLER-SUPPLIED
    * merge (existing, updates-with-part_id) => merged. This is the
    * store-plane entry point for MV maintenance whose state is a
    * mergeable aggregate rather than replace-on-key rows — e.g. the
    * sketch-valued distinct-count MV
    * ([[graft.operators.Sketches.mergeDistinctMv]]), where a delta's
    * sketch must UNION into the standing key's registers, not replace
    * them. Same guarantees as upsert: only partitions the update keys
    * hash to are read or rewritten, swaps are atomic-with-recovery.
    * The consolidate sees every existing row of the affected
    * partitions (matching or not) and must return ALL surviving rows
    * for those partitions, `PartCol` included. */
  def foldPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                      keys: Seq[String], partitionKey: String, nPartitions: Int)
                     (consolidate: (DataFrame, DataFrame) => DataFrame): Seq[Int] =
    mergePartitioned(spark, path, updates, keys, partitionKey, nPartitions)(consolidate)

  private def mergePartitioned(spark: SparkSession, path: String, updates: DataFrame,
                               keys: Seq[String], partitionKey: String, nPartitions: Int)
                              (consolidate: (DataFrame, DataFrame) => DataFrame): Seq[Int] = {
    require(keys.contains(partitionKey),
      s"partitionKey $partitionKey must be part of the merge keys $keys")
    recover(spark, path, nPartitions)

    val u = updates.withColumn(PartCol, partitionOf(col(partitionKey), nPartitions))
    val affected = u.select(col(PartCol)).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    if (affected.isEmpty) return affected

    // partition-pruned read: only the affected slices are opened
    val existing = spark.read.parquet(path)
      .filter(col(PartCol).isin(affected: _*))
    val merged = consolidate(existing, u)

    // stage the merged slices inside the table root; the dot-prefix
    // keeps partition discovery from ever seeing them
    val stagingRoot = s"$path/.staging"
    merged.write.mode("overwrite").partitionBy(PartCol).parquet(stagingRoot)

    AtomicSwap.publishStagedPartitions(fs(spark), path, stagingRoot,
      affected.map(p => s"$PartCol=$p"))
    affected
  }

  /** The same merge computed the naive way (full-table full-outer
    * consolidation) — the semantic reference the spec compares
    * against. */
  def upsertFullTable(spark: SparkSession, path: String, updates: DataFrame,
                      keys: Seq[String], partitionKey: String,
                      nPartitions: Int): DataFrame = {
    val u = updates.withColumn(PartCol, partitionOf(col(partitionKey), nPartitions))
    MergeWriter.upsert(spark.read.parquet(path), u, keys :+ PartCol)
  }
}
