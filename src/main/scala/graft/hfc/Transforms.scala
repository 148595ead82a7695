package graft.hfc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar derivations (SURVEY.md §2.A P1-P13) as
  * codegen'd Column expressions. Each cites the
  * `extractor/databaseImport.py` line it re-expresses.
  */
object Transforms {

  /** P4: canonical repo id — `"<plural-type>/<owner>/<name>"`
    * (databaseImport.py:604,693,773; SURVEY §1.5.1 resolves the
    * reference's prefix inconsistency to this single rule). Models on
    * the Hub are also reachable *without* a prefix in clone URLs
    * (`:338-341`), so `cloneUrl` special-cases them. */
  def repoId(repoType: Column, name: Column): Column =
    concat(repoType, lit("s/"), name)

  def cloneUrl(base: String, repoType: Column, name: Column): Column =
    when(repoType === "model", concat(lit(base + "/"), name))
      .otherwise(concat(lit(base + "/"), repoType, lit("s/"), name))

  /** P1: repo_file surrogate key — sha256(repo_id + '_' + rfilename)
    * (databaseImport.py:309). Deterministic keys make FK resolution a
    * join instead of a lookup (SURVEY §4.1). */
  def repoFileId(repoId: Column, rfilename: Column): Column =
    sha2(concat_ws("_", repoId, rfilename), 256)

  /** P2: modified_file surrogate key —
    * sha256(repo_name + '_' + filename + '_' + commit_sha)
    * (databaseImport.py:419 — keyed on *name*, not id). */
  def modifiedFileId(repoName: Column, filename: Column, sha: Column): Column =
    sha2(concat_ws("_", repoName, filename, sha), 256)

  /** P8: diff payload cap — >1 MiB diffs replaced by the reference's
    * sentinel (databaseImport.py:412-416). */
  val DiffSentinel = "The diff of this file is too large to store it"
  def capDiff(diff: Column, maxBytes: Long = 1L << 20): Column =
    when(octet_length(diff) > maxBytes, lit(DiffSentinel)).otherwise(diff)

  /** P9: deleted files keep their old path (databaseImport.py:409-411). */
  def effectivePath(changeType: Column, oldPath: Column, newPath: Column): Column =
    when(changeType === "DELETE", oldPath).otherwise(newPath)

  /** P10: `gated` enum normalization — "manual"/"auto" → NULL
    * (databaseImport.py:721-723). */
  def normalizeGated(gated: Column): Column =
    when(gated.isin("manual", "auto"), lit(null)).otherwise(gated)

  /** P6: clean-text emoji/control strip (databaseImport.py:634-635,
    * clean-text lib with no_emoji=True). Unicode-class regex covers
    * emoji planes, variation selectors, ZWJ, and C0/C1 controls except
    * tab/newline. */
  def cleanText(c: Column): Column =
    regexp_replace(c,
      "[\\x{1F000}-\\x{1FAFF}\\x{2600}-\\x{27BF}\\x{FE00}-\\x{FE0F}\\x{200D}\\x{2190}-\\x{21FF}\\x{2B00}-\\x{2BFF}\\p{Cc}&&[^\n\t]]",
      "")

  /** P13: incremental watermark — first day of the month N months back
    * (databaseImport.py:858-868). */
  def limitDate(monthsBack: Int): Column =
    trunc(add_months(current_date(), -monthsBack), "MM")

  /** M2/M6/M7-style reusable histogram bucketing: half-open ranges
    * [lo, hi) given by sorted bounds; values below the first bound get
    * "<lo", above the last get ">=hi". */
  def bucketize(c: Column, bounds: Seq[Double]): Column = {
    require(bounds == bounds.sorted && bounds.nonEmpty, "bounds must be sorted")
    val first = when(c < bounds.head, lit(s"<${fmt(bounds.head)}"))
    val mid = bounds.zip(bounds.tail).foldLeft(first) { case (acc, (lo, hi)) =>
      acc.when(c < hi, lit(s"[${fmt(lo)},${fmt(hi)})"))
    }
    mid.otherwise(lit(s">=${fmt(bounds.last)}"))
  }

  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
}
