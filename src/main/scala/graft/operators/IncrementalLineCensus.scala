package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus-global line boilerplate removal — the
  * continuously-fed form of [[QualityRules.globalLineDedup]]: scrub
  * each arriving batch against a PERSISTENT line-frequency store
  * without ever rescanning historical text (the same
  * state-is-tiny-next-to-the-text discipline as [[IncrementalDedup]]).
  *
  * Contract (forward-only, the production batch-curation semantics):
  * a batch's effective line frequency = standing store count + the
  * batch's own distinct-doc count, so
  *  - a line already boilerplate in the store scrubs from every new
  *    doc immediately;
  *  - a line that CROSSES the threshold inside this batch scrubs from
  *    this batch's docs (within-batch detection needs no store);
  *  - docs from EARLIER batches are not retro-scrubbed — their
  *    decisions shipped when they were processed. For any batch, the
  *    decisions equal [[QualityRules.globalLineDedup]] run over the
  *    whole corpus-so-far restricted to that batch's docs
  *    (spec-pinned), because the effective frequency IS the global
  *    frequency at processing time.
  *
  * Exactness requires the append-only corpus contract: a doc id
  * appears in exactly one batch (same contract as IncrementalDedup),
  * so per-batch distinct-doc counts add without double-counting.
  *
  * Store: (lh, line_df) parquet — two narrow columns, merged per batch
  * with one full-outer count-add and published via
  * [[graft.hfc.AtomicSwap]]'s crash-safe rename protocol (recover()
  * runs first, so a torn swap can never be read as an empty store).
  */
object IncrementalLineCensus {

  /** seed the store from an initial corpus (may be empty) */
  def initStore(docs: DataFrame, storePath: String, lineTokens: Int = 10,
                idCol: String = "doc_id", textCol: String = "text"): Unit =
    QualityRules.linesOf(docs, lineTokens, idCol, textCol)
      .select(col("lh"), col(idCol))
      .distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("line_df"))
      .write.mode("overwrite").parquet(storePath)

  /** scrub decisions for `newDocs` against store + batch, with the
    * same output shape as [[QualityRules.globalLineDedup]]
    * (id, n_lines, n_kept, clean_md5); when `updateStore`, the merged
    * census is atomically published before returning.
    *
    * `batchAlreadyCounted = true` is the REPLAY mode (the streaming
    * wrapper's crashed-after-store-commit path): the store already
    * contains this batch's counts, so the effective frequency is the
    * store count alone — adding the batch again would double-count and
    * make replayed decisions MORE aggressive than the originals. */
  def scrubBatch(newDocs: DataFrame, storePath: String,
                 lineTokens: Int = 10, maxDocFreq: Int = 3,
                 updateStore: Boolean = true,
                 batchAlreadyCounted: Boolean = false,
                 batchMarker: Option[Long] = None,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(!(updateStore && batchAlreadyCounted),
      "a replayed batch must not grow the store again")
    val spark = newDocs.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    graft.hfc.AtomicSwap.recoverDir(fs, storePath)
    // a batch about to be counted (not a known replay) must be inside
    // the bounded-marker horizon — beyond it, applied-or-not is
    // unknowable and counting again would double-count (fail loudly)
    if (!batchAlreadyCounted)
      batchMarker.foreach(graft.hfc.AtomicSwap.assertWithinReplayHorizon(fs, storePath, _))
    // explicit read schema: the census layout is fixed by initStore
    // (lh = md5 string, line_df = count long); skips the per-batch
    // footer schema-inference driver job (guide §6)
    val store = spark.read.schema(censusSchema).parquet(storePath)

    val lines = QualityRules.linesOf(newDocs, lineTokens, idCol, textCol)
    val batchDf = lines.select(col("lh"), col(idCol)).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("b_df"))
    // effective frequency at processing time = store + this batch
    // (store alone on replay — the store already holds the batch)
    val batchContribution =
      if (batchAlreadyCounted) lit(0L) else col("b_df")
    val eff = batchDf.join(store.withColumnRenamed("line_df", "s_df"), Seq("lh"), "left")
      .select(col("lh"), (batchContribution + coalesce(col("s_df"), lit(0L))).as("line_df"),
        col("b_df"))
    // decide BEFORE the store is touched (decisions must not see
    // themselves applied twice on a replay)
    val aggs = QualityRules.lineDedupAggs(maxDocFreq)
    val decisions = lines
      .join(eff.select(col("lh"), col("line_df")), "lh")
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)

    if (updateStore) {
      val merged = store.withColumnRenamed("line_df", "s_df")
        .join(eff.select(col("lh"), col("b_df")), Seq("lh"), "full_outer")
        .select(col("lh"),
          (coalesce(col("s_df"), lit(0L)) + coalesce(col("b_df"), lit(0L))).as("line_df"))
      val staging = graft.hfc.AtomicSwap.stagingFor(storePath)
      merged.write.mode("overwrite").parquet(staging)
      // the applied marker rides INSIDE the staged directory, so
      // counts and marker become one atomic rename — unlike the dedup
      // store (where a replayed append is benign), a replayed COUNT
      // add would change decisions, so the commit-vs-marker window
      // must not exist. Underscore prefix: parquet readers skip it.
      // EARLIER batches' markers must ride along too: the swap
      // replaces the whole directory, and dropping them would let a
      // checkpoint-loss replay of an old batch double-count (caught
      // by CorpusPipelineStreamSpec's two-wave replay). Retention is
      // BOUNDED (newest MaxAppliedMarkers ids) so a years-long stream
      // doesn't recreate an ever-growing empty-file set per commit;
      // replay protection therefore extends MaxAppliedMarkers batches
      // back — far beyond what a lost checkpoint can re-deliver.
      val existingIds = graft.hfc.AtomicSwap.listAppliedMarkers(fs, storePath)
      graft.hfc.AtomicSwap.writeAppliedMarkers(
        fs, staging, existingIds.toSeq ++ batchMarker)
      graft.hfc.AtomicSwap.commitDir(fs, storePath, staging)
    }
    decisions
  }

  /** was batch `batchId`'s count merge already committed? (the marker
    * travels inside the store directory — see [[scrubBatch]]).
    * recoverDir runs FIRST: after a torn swap (target renamed aside,
    * staging complete) the marker is invisible at the target path, so
    * an unrecovered existence check would declare a committed batch
    * un-counted — and the caller would merge it a second time after
    * scrubBatch's own recover rolled the counts forward (the
    * torn-swap x replay composition caught by CorpusSoakSpec;
    * Scd2Store.batchApplied already recovered first). */
  def batchCounted(spark: SparkSession, storePath: String, batchId: Long): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    graft.hfc.AtomicSwap.recoverDir(fs, storePath)
    fs.exists(new org.apache.hadoop.fs.Path(storePath, s"_applied_batch_$batchId"))
  }

  private val censusSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("lh",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("line_df",
      org.apache.spark.sql.types.LongType)))

  /** current census size — monitoring hook */
  def storeStats(spark: SparkSession, storePath: String): (Long, Long) = {
    val s = spark.read.schema(censusSchema).parquet(storePath)
    val row = s.agg(count(lit(1)), coalesce(max(col("line_df")), lit(0L))).head()
    (row.getLong(0), row.getLong(1))
  }
}
