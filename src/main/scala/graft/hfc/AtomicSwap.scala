package graft.hfc

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory swap for parquet targets on rename-atomic
  * filesystems (local FS, HDFS).
  *
  * The naive delete-then-rename swap has a hole: a crash between the
  * delete and the rename leaves NO target, and a restarted job that
  * treats "missing target" as "empty table" silently rebuilds from only
  * the new batch. The protocol here never has a window without either
  * the old or the new data reachable under a deterministic name:
  *
  *  commit:   (staging fully written, marked by parquet's `_SUCCESS`)
  *            1. rename target  → target.old     (skip if no target)
  *            2. rename staging → target
  *            3. delete target.old
  *  recover:  (run BEFORE reading the target at job/batch start)
  *            - old + target present        → crashed after 2: delete old
  *            - old present, staging complete → crashed between 1 and 2:
  *              roll forward (staging → target, delete old)
  *            - old present, staging absent/incomplete → roll back
  *              (old → target)
  *            - leftover staging            → delete (the writer that
  *              produced it never reached its commit point; the caller
  *              re-runs the merge)
  *
  * Every step is a single atomic rename or an idempotent delete, so
  * recover() is safe to run any number of times.
  */
object AtomicSwap {

  /** Bound on `_applied_batch_*` markers a marker-inside-the-swap
    * store (IncrementalLineCensus, Scd2Store) carries through
    * rewrites: replay protection reaches this many batches back (a
    * lost checkpoint re-delivers far fewer), while a years-long
    * stream's commits stay O(bound) empty files instead of O(total
    * batches ever processed). */
  val MaxAppliedMarkers: Int = 4096

  /** Applied-batch marker ids currently retained inside `dir`. */
  def listAppliedMarkers(fs: FileSystem, dir: String): Array[Long] =
    fs.listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("_applied_batch_"))
      .flatMap(_.stripPrefix("_applied_batch_").toLongOption)

  /** Stamp `ids` (newest [[MaxAppliedMarkers]] only) into `stagingDir`
    * so they ride through the upcoming swap. */
  def writeAppliedMarkers(fs: FileSystem, stagingDir: String, ids: Seq[Long]): Unit =
    ids.distinct.sorted.takeRight(MaxAppliedMarkers).foreach { id =>
      fs.create(new Path(stagingDir, s"_applied_batch_$id"), true).close()
    }

  /** Replay-horizon guard for marker-inside-the-swap stores
    * (IncrementalLineCensus, Scd2Store). Marker retention is bounded
    * at [[MaxAppliedMarkers]], so "no marker for batchId" proves "not
    * yet applied" ONLY while batchId >= the oldest retained marker. A
    * batch OLDER than every retained marker whose own marker is gone
    * is beyond the horizon: whether it was applied is unknowable, and
    * re-applying would double-count line frequencies / re-fold version
    * chains. Fail loudly instead of guessing — a checkpoint restored
    * from beyond the horizon must be rejected, not silently replayed.
    *
    * CONTRACT: batch ids must be monotonically increasing per store
    * (Structured Streaming's epoch ids are). The guard intentionally
    * rejects a below-horizon id even while fewer than
    * [[MaxAppliedMarkers]] markers exist: with monotonic ids such a
    * batch can only be a replay from a checkpoint older than the
    * store's history, never a genuinely-new batch. Two producers with
    * independent, non-monotonic id spaces MUST NOT share one store —
    * partition the store path per producer instead. */
  def assertWithinReplayHorizon(fs: FileSystem, dir: String, batchId: Long): Unit = {
    val ids = listAppliedMarkers(fs, dir)
    if (ids.nonEmpty && batchId < ids.min)
      throw new IllegalStateException(
        s"batch $batchId of store $dir is beyond the replay-protection horizon: " +
        s"oldest retained applied marker is ${ids.min} (retention bound " +
        s"MaxAppliedMarkers=$MaxAppliedMarkers). Whether this batch was already " +
        "applied is unknowable, and re-applying would corrupt the store; " +
        "refusing. Restore from a checkpoint newer than the horizon, or " +
        "rebuild the store from the corpus.")
  }

  def stagingFor(target: String): String = target + ".staging"
  private def oldFor(target: String): String = target + ".old"

  private def isComplete(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** Publish `staging` as `target`. `staging` must carry `_SUCCESS`
    * (parquet writes it; for hand-built dirs, create it). */
  def commitDir(fs: FileSystem, target: String, staging: String): Unit = {
    val t = new Path(target); val s = new Path(staging); val o = new Path(oldFor(target))
    require(isComplete(fs, s), s"staging $staging has no _SUCCESS marker — refusing to publish")
    if (fs.exists(t)) {
      require(fs.rename(t, o), s"rename $t -> $o failed")
    }
    require(fs.rename(s, t), s"rename $s -> $t failed")
    fs.delete(o, true)
    ()
  }

  /** Repair any interrupted swap of `target`; call before reading. */
  def recoverDir(fs: FileSystem, target: String): Unit = {
    val t = new Path(target); val s = new Path(stagingFor(target)); val o = new Path(oldFor(target))
    if (fs.exists(o)) {
      if (fs.exists(t)) {
        fs.delete(o, true)                    // swap completed, cleanup died
      } else if (fs.exists(s) && isComplete(fs, s)) {
        require(fs.rename(s, t), s"roll-forward rename $s -> $t failed")
        fs.delete(o, true)
      } else {
        require(fs.rename(o, t), s"roll-back rename $o -> $t failed")
      }
    }
    if (fs.exists(s)) fs.delete(s, true)      // uncommitted leftovers
    ()
  }

  /** Publish a set of staged partition directories (written under
    * `stagingRoot` by one partitionBy job) into the table root, one
    * crash-safe [[commitDir]] swap per partition. Per-partition staging
    * dirs carry no `_SUCCESS` of their own, so each is stamped from the
    * staging root's job-level marker first — that is what lets
    * [[recoverDir]] tell a completed write from a torn one. Shared by
    * the hash- and time-partitioned merge writers. */
  private[hfc] def publishStagedPartitions(fs: FileSystem, tableRoot: String,
                                           stagingRoot: String,
                                           partDirNames: Seq[String]): Unit = {
    val jobComplete = fs.exists(new Path(stagingRoot, "_SUCCESS"))
    partDirNames.foreach { name =>
      val staged = s"$stagingRoot/$name"
      val target = s"$tableRoot/$name"
      if (jobComplete && fs.exists(new Path(staged))) {
        fs.create(new Path(staged, "_SUCCESS")).close()
        // publish under the deterministic name recoverDir knows
        val canonical = stagingFor(target)
        fs.delete(new Path(canonical), true)
        require(fs.rename(new Path(staged), new Path(canonical)),
          s"rename $staged -> $canonical failed")
        commitDir(fs, target, canonical)
      }
    }
    fs.delete(new Path(stagingRoot), true)
    ()
  }
}
