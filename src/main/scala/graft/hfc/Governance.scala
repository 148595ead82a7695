package graft.hfc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Resource-governance operators from the extractor (SURVEY.md §2.A
  * F2/F3/F8 + A3), generalized from the reference's hard-coded lists
  * and stderr logging into config-driven, observable dataflow.
  */
object Governance {

  /** F2: config-driven blocklist (replaces the hard-coded pathological
    * repo lists at databaseImport.py:624,712,787). Broadcast isin for
    * small lists. */
  def blocklistFilter(df: DataFrame, idCol: String, blocked: Seq[String]): DataFrame =
    if (blocked.isEmpty) df else df.filter(!col(idCol).isin(blocked: _*))

  /** F3 + A3: threshold skip with observable counters
    * (databaseImport.py:373-382 skips repos over max_num_commits /
    * max_num_files and tallies them; the tallies become `observe`
    * metrics readable from a QueryExecutionListener instead of loop
    * variables). Returns the kept rows; the observation named
    * `graft_governance` carries n_total / n_skipped / n_kept. */
  def thresholdSkip(df: DataFrame, keepIf: Column): DataFrame = {
    val flagged = df.withColumn("__skip", !keepIf)
    flagged
      .observe("graft_governance",
        count(lit(1)).as("n_total"),
        sum(col("__skip").cast("long")).as("n_skipped"),
        sum((!col("__skip")).cast("long")).as("n_kept"))
      .filter(!col("__skip"))
      .drop("__skip")
  }

  /** F8: error-channel split — failed/malformed rows go to a
    * quarantine frame instead of being silently dropped (the
    * reference prints to stderr and moves on,
    * databaseImport.py:300-302,537-546). Returns (good, quarantined). */
  def quarantine(df: DataFrame, isGood: Column): (DataFrame, DataFrame) =
    (df.filter(isGood), df.filter(!coalesce(isGood, lit(false))))

  /** F7: the author-presence guard (databaseImport.py:627,715,790) */
  def requireNonNull(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
}
