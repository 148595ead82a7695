package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental IVF index maintenance — the ANN plane's member of the
  * incremental-store family ([[IncrementalDedup]] /
  * [[IncrementalHashDedup]] / [[IncrementalFrameDedup]]): keep a
  * cell-partitioned vector index servable while batches of new vectors
  * arrive, without re-reading, re-embedding, or re-assigning any
  * historical vector.
  *
  * The coarse quantizer ([[IvfIndex]]'s deterministic sampled
  * centroids) is FROZEN at init; every later batch is assigned against
  * the same centroid table. That buys, in order:
  *  - the append touches ONLY the batch (one broadcast-centroid argmin
  *    over batch rows — historical cells are never rewritten),
  *  - the storage layout stays `cell=K/` for seed and appended files
  *    alike, so [[IvfIndex.topKFromStorage]]-style partition pruning
  *    keeps working across the whole accumulated index,
  *  - a vector's cell is a pure function of (vector, init corpus) —
  *    which is what makes the incremental path oracle-able (qs25
  *    replays seed centroids + both assignment waves from scratch).
  *
  * The price of freezing is drift: a distribution shift in later
  * batches concentrates them into few cells and probe pruning decays
  * toward a full scan. [[cellCensus]]/[[rebuildAdvice]] are that
  * read — the qj02/qm13 pricing discipline for this store: rebuild is
  * a decision taken on a measured imbalance number, not on a schedule.
  *
  * Crash/replay contract (the family's): appends are gated by sibling
  * applied markers ([[batchApplied]]/[[markApplied]]); a crash-window
  * replay only BLOATS the store with bit-identical duplicate rows
  * (assignment is pure), never corrupts it. [[serve]] stays correct
  * under bloat — it dedups ids on the PRUNED cells only (probe-sized,
  * not store-sized) — and [[compact]] reclaims the bloat through the
  * AtomicSwap crash-safe rename.
  */
object IncrementalIvf {

  /** One-off init: frozen centroids + seed corpus partitioned by cell.
    * Delegates to [[IvfIndex.build]] — same layout, same quantizer. */
  def init(corpus: DataFrame, path: String, nCells: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    IvfIndex.build(corpus, path, nCells, idCol, vecCol)

  /** Assign a batch against the FROZEN centroids and append its rows
    * under their `cell=K/` partitions. Cost: one broadcast join +
    * argmin agg over batch rows, one partitioned write — the standing
    * index is not read (only its tiny centroid table is). */
  def appendBatch(batch: DataFrame, path: String,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    recoverAll(spark, path) // a torn REBUILD would otherwise leave no centroids
    // explicit read schema: the centroid layout is fixed by
    // IvfIndex.build — (cell, c_vec, c_nrm2), with c_vec typed like the
    // batch's vector column (store and batch share one vector space by
    // the append contract). Skips the footer-inference driver job (§6).
    val cents = spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("c_vec",
          batch.schema(vecCol).dataType),
        org.apache.spark.sql.types.StructField("c_nrm2",
          org.apache.spark.sql.types.DoubleType))))
      .parquet(s"$path/centroids")
    IvfIndex.assign(batch, cents, idCol, vecCol)
      .write.mode("append").partitionBy("cell").parquet(s"$path/assigned")
  }

  // replay bookkeeping — the IncrementalDedup sibling-marker protocol
  private def markerFor(path: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$path/assigned.applied", s"batch-$batchId")

  def batchApplied(spark: SparkSession, path: String, batchId: Long): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.exists(markerFor(path, batchId))
  }

  def markApplied(spark: SparkSession, path: String, batchId: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.create(markerFor(path, batchId), true).close()
  }

  /** Query path over the accumulated index — [[IvfIndex.topKFromStorage]]
    * semantics (probe cells from the centroid table, `cell IN (...)`
    * lands as a PartitionFilter, cosine top-k ranked (desc, id asc))
    * plus the replay-bloat guard. The guard costs (almost) nothing:
    * duplicate store rows are BIT-IDENTICAL (assignment is pure), so
    * they collapse at the scored-candidates level — `dense_rank` over
    * the strict (cos desc, id asc) order gives duplicate rows the same
    * rank (and equals `row_number` exactly when the store is clean),
    * and a final distinct over the ≤ k·|queries| result rows removes
    * the copies. A pruned-side `dropDuplicates` would instead shuffle
    * the full VECTOR PAYLOAD of every probed cell — measured 664 MB at
    * a 4M-row store (ProfileIncrIvf) vs the candidates' ~24 B rows
    * that must shuffle for ranking anyway. */
  def serve(spark: SparkSession, path: String, queryIds: Seq[Long],
            k: Int, nProbe: Int,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    recoverAll(spark, path)
    IvfIndex.topKPruned(spark, path, queryIds, k, nProbe, idCol, vecCol,
      tolerateBloat = true)
  }

  /** Repair any interrupted swap BEFORE touching the store — the
    * sibling-store discipline (every entry point recovers, readers
    * included: a compact or rebuild crash between its two renames must
    * never surface as PATH_NOT_FOUND to a reader). Order matters: the
    * whole-index swap (rebuild) first, then the assigned-table swap
    * (compact) inside whatever that restored. */
  private def recoverAll(spark: SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    graft.hfc.AtomicSwap.recoverDir(fs, path)
    graft.hfc.AtomicSwap.recoverDir(fs, s"$path/assigned")
  }

  /** Per-cell occupancy: (cell, n_vectors) — counts only, one
    * partitioned-scan aggregation (the id column alone is read). */
  def cellCensus(spark: SparkSession, path: String,
                 idCol: String = "vec_id"): DataFrame = {
    recoverAll(spark, path)
    spark.read.parquet(s"$path/assigned")
      .groupBy(col("cell")).agg(count(col(idCol)).as("n_vectors"))
  }

  /** The rebuild signal, one row: cell count, vector count, max/mean
    * cell occupancy, and `imbalance` = max/mean (1.0 = perfectly
    * balanced). `rebuild` flags imbalance ≥ `threshold` — the point
    * where probing the hottest cell approaches scanning
    * imbalance/nCells of the corpus and the frozen quantizer should be
    * re-fit (a new [[init]] from current data; an offline job, like
    * the compaction it replaces). */
  def rebuildAdvice(spark: SparkSession, path: String,
                    threshold: Double = 4.0,
                    idCol: String = "vec_id"): DataFrame = {
    require(threshold >= 1.0, s"imbalance threshold must be >= 1.0, got $threshold")
    // cellCensus recovers torn swaps on entry
    cellCensus(spark, path, idCol).agg(
        count(lit(1)).as("n_cells"),
        coalesce(sum(col("n_vectors")), lit(0L)).as("n_vectors"),
        coalesce(max(col("n_vectors")), lit(0L)).as("max_cell"))
      .select(col("n_cells"), col("n_vectors"), col("max_cell"),
        round(col("max_cell") * col("n_cells") / greatest(col("n_vectors"), lit(1L)), 6)
          .as("imbalance"))
      .withColumn("rebuild", col("imbalance") >= threshold)
  }

  /** Re-fit the frozen quantizer from the CURRENT store contents — the
    * action [[rebuildAdvice]] prices. One read of the accumulated
    * vectors (ids dedup'd: replay bloat is reclaimed for free), fresh
    * deterministic sampled centroids, full re-assignment, and an
    * ATOMIC publish of the WHOLE index dir: centroids and assigned
    * must swap together (a reader mixing old centroids with new cell
    * numbering would probe garbage), so the swap unit is `path`
    * itself, not the two tables separately. Applied markers are
    * re-stamped into the staging dir so the streaming ingest's replay
    * protection survives the rebuild. Offline-job semantics like the
    * compaction it supersedes: run it when `rebuildAdvice` says so,
    * not on a schedule. */
  def rebuild(spark: SparkSession, path: String, nCells: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverAll(spark, path) // torn earlier rebuild, then torn compact
    // pin the current vectors BEFORE the swap replaces the directory
    // underneath the lazy plan (and scan the store once, not twice)
    val current = spark.read.parquet(s"$path/assigned")
      .dropDuplicates(idCol).select(col(idCol), col(vecCol))
      .localCheckpoint(true)
    val staging = graft.hfc.AtomicSwap.stagingFor(path)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    IvfIndex.build(current, staging, nCells, idCol, vecCol)
    // markers live INSIDE the index dir — carry them through the swap
    val markers = new org.apache.hadoop.fs.Path(s"$path/assigned.applied")
    if (fs.exists(markers)) {
      val dst = new org.apache.hadoop.fs.Path(s"$staging/assigned.applied")
      fs.mkdirs(dst)
      fs.listStatus(markers).foreach(m =>
        fs.create(new org.apache.hadoop.fs.Path(dst, m.getPath.getName), true).close())
    }
    fs.create(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"), true).close()
    graft.hfc.AtomicSwap.commitDir(fs, path, staging)
  }

  /** Reclaim replay bloat: duplicate ids collapse (assignment is pure —
    * duplicates are bit-identical), per-batch append files re-pack to
    * one file per cell (`repartition(col("cell"))` puts each cell in
    * exactly one task, so the partitioned write emits one file under
    * each `cell=K/` — the micro-batch small-file repair, Layout.compact's
    * job done store-natively). AtomicSwap crash-safe: readers never
    * observe a torn store. */
  def compact(spark: SparkSession, path: String,
              idCol: String = "vec_id"): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val assignedPath = s"$path/assigned"
    recoverAll(spark, path)
    val staging = graft.hfc.AtomicSwap.stagingFor(assignedPath)
    spark.read.parquet(assignedPath)
      .dropDuplicates(idCol)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staging)
    graft.hfc.AtomicSwap.commitDir(fs, assignedPath, staging)
  }
}
