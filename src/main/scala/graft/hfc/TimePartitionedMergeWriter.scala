package graft.hfc

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MERGE for TIME-KEYED fact tables, partitioned by event
  * month — the layout a commits/events table wants at 100 TB, where
  * updates arrive for recent months only and analytic scans prune by
  * time range.
  *
  * [[PartitionedMergeWriter]] hashes the key into a fixed number of
  * buckets: every update batch touches ~all buckets (good for
  * uniformly-keyed dimension tables like `repository`). Here the
  * partition is `date_format(tsCol, 'yyyy-MM')`: an incremental batch
  * (the reference's monthly refresh, databaseImport.py:858-868 P13
  * watermark) lands in one or two month directories, the merge reads
  * and rewrites ONLY those, and time-ranged queries prune at the scan.
  * Same [[AtomicSwap]] crash-safe publish and [[MergeWriter]]
  * consolidation; partitions never enumerated by a fixed n — they are
  * discovered from the directory listing.
  *
  * CONTRACT — stable event time: a logical key's `tsCol` must never
  * change across versions (true for immutable event-time facts:
  * commits keyed by sha carry one committer date). A row whose month
  * moved would leave its old copy stranded in the old partition; rows
  * with a NULL `tsCol` are rejected loudly for the same reason.
  */
object TimePartitionedMergeWriter {

  val PartCol = "part_month"

  def partitionOf(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** One-time layout job: write `df` partitioned by event month. The
    * NULL-event-time contract is enforced IN the write projection
    * (raise_error inside the partition expression) — one pass, no
    * second validation scan — otherwise null rows would land in the
    * Hive default partition, which no pruned merge ever reads,
    * stranding stale copies forever. */
  def initTable(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn(PartCol,
        when(col(tsCol).isNull, raise_error(lit(
          s"$tsCol contains NULLs — a null event time has no partition and " +
            "its rows would silently vanish from every pruned merge")))
          .otherwise(partitionOf(col(tsCol))))
      .write.mode("overwrite").partitionBy(PartCol).parquet(path)

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Repair interrupted partition swaps. Months are discovered from
    * the listing (including torn `.old`/`.staging` remnants whose
    * canonical dir is already gone), not enumerated. Safe always. */
  def recover(spark: SparkSession, path: String): Unit = {
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return
    val names = f.listStatus(root).map(_.getPath.getName)
    val bases = names
      .map(_.stripSuffix(".old").stripSuffix(".staging"))
      .filter(_.startsWith(PartCol + "=")).distinct
    bases.foreach(b => AtomicSwap.recoverDir(f, s"$path/$b"))
    f.delete(new Path(s"$path/.staging"), true)
    ()
  }

  /** K2 upsert rewriting only the months the batch touches. Returns
    * the affected month strings. */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                        keys: Seq[String], tsCol: String): Seq[String] =
    mergePartitioned(spark, path, updates, tsCol) {
      (existing, u) => MergeWriter.upsert(existing, u, keys :+ PartCol)
    }

  /** K4 targeted column UPDATE (counters only, non-matching rows
    * ignored) rewriting only the months the batch touches. */
  def updateColumnsPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                               keys: Seq[String], cols: Seq[String],
                               tsCol: String): Seq[String] =
    mergePartitioned(spark, path, updates, tsCol) {
      (existing, u) => MergeWriter.updateColumns(existing, u, keys :+ PartCol, cols)
    }

  private def mergePartitioned(spark: SparkSession, path: String, updates: DataFrame,
                               tsCol: String)
                              (consolidate: (DataFrame, DataFrame) => DataFrame): Seq[String] = {
    recover(spark, path)

    val u = updates.withColumn(PartCol, partitionOf(col(tsCol)))
    val affected = u.select(col(PartCol)).distinct()
      .collect().map(_.getString(0)).toSeq
    require(!affected.contains(null),
      s"$tsCol contains NULLs — a null event time has no partition and " +
        "its rows would silently vanish from every pruned merge")
    val months = affected.sorted
    if (months.isEmpty) return months

    // the FULL existing slice goes into the consolidation — a narrow
    // K4 counters frame must not project the table's other columns out
    // of the rewritten partitions (MergeWriter aligns by name)
    val existing = spark.read.parquet(path)
      .filter(col(PartCol).isin(months: _*))
    val merged = consolidate(existing, u)

    val stagingRoot = s"$path/.staging"
    merged.write.mode("overwrite").partitionBy(PartCol).parquet(stagingRoot)
    AtomicSwap.publishStagedPartitions(fs(spark), path, stagingRoot,
      months.map(m => s"$PartCol=$m"))
    months
  }
}
