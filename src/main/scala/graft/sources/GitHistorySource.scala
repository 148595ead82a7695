package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer
import scala.sys.process._

/** Executor-side git history ingest — the E1 stage the reference runs
  * with `git clone --bare` + PyDriller's commit walk
  * (databaseImport.py:320-444, SURVEY §2.A S7/S8). The reference is
  * single-threaded ("one process per repo type", :347); here the repo
  * list is a Dataset and each PARTITION of repos walks its histories in
  * parallel on the executors via `git log` subprocesses (no network:
  * the repos are already on local disk, exactly like the reference's
  * post-clone state — cloning itself stays out-of-engine per SURVEY).
  *
  * Two outputs, matching the bronze contracts Normalize consumes:
  *  - [[commits]] → the `commits` table shape (raw-epoch dates + tz
  *    offsets like P12, insertions/deletions, parents array — which
  *    also feeds Normalize.commitParents);
  *  - [[deltas]] → the `deltasRaw` contract of Normalize.modifiedFiles
  *    (change_type in PyDriller vocabulary, old/new paths, added/
  *    deleted lines; `nloc` and `diff` are null — they need file
  *    contents, which an optional `-p` pass would add; P8's cap
  *    applies downstream whenever diffs are present).
  *
  * Resource governance mirrors the reference: [[commitCount]] is the
  * `git rev-list --count HEAD` probe (:364) and callers skip repos over
  * `max_num_commits` (F3) BEFORE walking.
  *
  * Scale: one task = a batch of repos; each subprocess streams text
  * that is parsed incrementally — no whole-history buffering. Skew
  * (mega-repos) is handled by the same threshold-skip the reference
  * uses, plus repartitioning the repo list.
  */
object GitHistorySource {

  /** a repo already materialized on executor-local disk */
  case class RepoRef(repo_id: String, repo_name: String, path: String)

  case class GitCommit(sha: String, repo_id: String,
                       author_name: String, committer_name: String,
                       author_epoch: Long, author_tz: Int,
                       committer_epoch: Long, committer_tz: Int,
                       insertions: Int, deletions: Int,
                       parents: Seq[String], source: String)

  case class GitDelta(repo_id: String, repo_name: String, sha: String,
                      change_type: String, old_path: String, new_path: String,
                      added_lines: Option[Int], deleted_lines: Option[Int])

  /** `git rev-list --count HEAD` — the F3/S8 threshold probe. */
  def commitCount(path: String): Long =
    try Seq("git", "-C", path, "rev-list", "--count", "HEAD").!!.trim.toLong
    catch { case _: Exception => 0L }

  private def gitLines(path: String, args: Seq[String]): Iterator[String] =
    (Seq("git", "-C", path, "log") ++ args).lazyLines_!.iterator

  /** parse "1670000000 +0130" → (epochSeconds, offsetMinutes) */
  private def parseRawDate(s: String): (Long, Int) = {
    val parts = s.trim.split(' ')
    val epoch = parts(0).toLong
    val tz = parts(1)
    val sign = if (tz.startsWith("-")) -1 else 1
    val hh = tz.substring(1, 3).toInt
    val mm = tz.substring(3, 5).toInt
    (epoch, sign * (hh * 60 + mm))
  }

  /** record marker (%x01) and field separator (%x02) — bytes that git
    * never emits inside names, paths, or raw dates */
  private val Rec = '\u0001'
  private val FieldSep = '\u0002'

  /** one commit-metadata pass per repo: sha, parents, names, raw dates,
    * plus per-commit insertion/deletion totals from --shortstat. */
  private def walkCommits(r: RepoRef): Iterator[GitCommit] = {
    val fmt = "%x01%H%x02%P%x02%an%x02%cn%x02%ad%x02%cd"
    val out = ArrayBuffer.empty[GitCommit]
    var cur: GitCommit = null
    def flush(): Unit = if (cur != null) { out += cur; cur = null }
    gitLines(r.path, Seq(s"--format=$fmt", "--date=raw", "--shortstat")).foreach { line =>
      if (line.nonEmpty && line.charAt(0) == Rec) {
        flush()
        val f = line.substring(1).split(FieldSep)
        val (aEpoch, aTz) = parseRawDate(f(4))
        val (cEpoch, cTz) = parseRawDate(f(5))
        cur = GitCommit(f(0), r.repo_id, f(2), f(3), aEpoch, aTz, cEpoch, cTz,
          insertions = 0, deletions = 0,
          parents = if (f(1).isEmpty) Seq.empty else f(1).split(' ').toSeq,
          source = "gitlog")
      } else if (cur != null && line.contains("changed")) {
        // " 2 files changed, 10 insertions(+), 3 deletions(-)"
        val ins = "(\\d+) insertion".r.findFirstMatchIn(line).map(_.group(1).toInt).getOrElse(0)
        val del = "(\\d+) deletion".r.findFirstMatchIn(line).map(_.group(1).toInt).getOrElse(0)
        cur = cur.copy(insertions = ins, deletions = del)
      }
    }
    flush()
    out.iterator
  }

  /** resolve numstat's rename syntax: "pre{old => new}post" or
    * "old => new" → (oldPath, newPath); plain paths map to themselves */
  private[sources] def renamePaths(raw: String): (String, String) = {
    val brace = "\\{(.*) => (.*)\\}".r
    brace.findFirstMatchIn(raw) match {
      case Some(m) =>
        val pre = raw.substring(0, m.start); val post = raw.substring(m.end)
        ((pre + m.group(1) + post).replace("//", "/"),
         (pre + m.group(2) + post).replace("//", "/"))
      case None if raw.contains(" => ") =>
        val Array(o, n) = raw.split(" => ", 2); (o, n)
      case None => (raw, raw)
    }
  }

  /** one file-delta pass per repo: --name-status for the PyDriller
    * change-type vocabulary, --numstat for line counts, stitched by
    * (sha, new_path) inside the same streaming parse. */
  private def walkDeltas(r: RepoRef): Iterator[GitDelta] = {
    // name-status pass: change types + old/new paths
    case class Entry(changeType: String, oldPath: String, newPath: String)
    val bySha = scala.collection.mutable.LinkedHashMap.empty[String, ArrayBuffer[Entry]]
    var sha: String = null
    gitLines(r.path, Seq("-M", "--name-status", "--format=%x01%H")).foreach { line =>
      if (line.nonEmpty && line.charAt(0) == Rec) {
        sha = line.substring(1); bySha(sha) = ArrayBuffer.empty
      } else if (line.nonEmpty && sha != null) {
        val parts = line.split('\t')
        parts(0).charAt(0) match {
          case 'A' => bySha(sha) += Entry("ADD", null, parts(1))
          case 'D' => bySha(sha) += Entry("DELETE", parts(1), null)
          case 'M' => bySha(sha) += Entry("MODIFY", parts(1), parts(1))
          case 'R' => bySha(sha) += Entry("RENAME", parts(1), parts(2))
          case 'C' => bySha(sha) += Entry("COPY", parts(1), parts(2))
          case _   => bySha(sha) += Entry("UNKNOWN", parts(1), parts(1))
        }
      }
    }
    // numstat pass: (sha, printed path) → (added, deleted); "-" = binary
    val counts = scala.collection.mutable.HashMap.empty[(String, String), (Option[Int], Option[Int])]
    sha = null
    gitLines(r.path, Seq("-M", "--numstat", "--format=%x01%H")).foreach { line =>
      if (line.nonEmpty && line.charAt(0) == Rec) sha = line.substring(1)
      else if (line.nonEmpty && sha != null) {
        val parts = line.split('\t')
        if (parts.length >= 3) {
          val added = if (parts(0) == "-") None else Some(parts(0).toInt)
          val deleted = if (parts(1) == "-") None else Some(parts(1).toInt)
          val (_, newPath) = renamePaths(parts.drop(2).mkString("\t"))
          counts((sha, newPath)) = (added, deleted)
        }
      }
    }
    bySha.iterator.flatMap { case (s, entries) =>
      entries.iterator.map { e =>
        val keyPath = Option(e.newPath).getOrElse(e.oldPath)
        val (a, d) = counts.getOrElse((s, keyPath), (None, None))
        GitDelta(r.repo_id, r.repo_name, s, e.changeType, e.oldPath, e.newPath, a, d)
      }
    }
  }

  /** Distributed commit walk over a repo list. */
  def commits(repos: Dataset[RepoRef]): Dataset[GitCommit] = {
    import repos.sparkSession.implicits._
    repos.flatMap(walkCommits _)
  }

  /** Distributed per-commit file-delta walk (the `deltasRaw` feed of
    * Normalize.modifiedFiles, minus content-derived nloc/diff). */
  def deltas(repos: Dataset[RepoRef]): Dataset[GitDelta] = {
    import repos.sparkSession.implicits._
    repos.flatMap(walkDeltas _)
  }

  /** `commits` silver shape with proper timestamp + tz-offset split
    * (P12) from the raw epochs. */
  def commitsTable(spark: SparkSession, repos: Dataset[RepoRef]): DataFrame =
    commits(repos).toDF()
      .select(col("sha"), col("repo_id"),
        col("author_name"), col("committer_name"),
        timestamp_seconds(col("author_epoch")).as("author_date"),
        col("author_tz"),
        timestamp_seconds(col("committer_epoch")).as("committer_date"),
        col("committer_tz"),
        col("insertions"), col("deletions"),
        lit(true).as("in_main_branch"), col("source"), col("parents"))
}
