package graft.hfc

import graft.hfc.Transforms.bucketize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's published analytics workload — the 7 metrics from
  * `docs/metrics.html:242-392` (M1-M8 in SURVEY.md §2.B) — as Spark
  * DataFrame builders over the 17-table model.
  *
  * Each takes the silver tables it needs; all are two-level
  * aggregation / bucketed histogram / top-k shapes. HfcMetricsSpec
  * pins exact numbers on a fixture corpus.
  */
object HfcMetrics {

  /** M1: most active organizations by #models (metrics.html:244-266). */
  def topOrgsByModels(repository: DataFrame, k: Int = 10): DataFrame =
    repository.filter(col("type") === "model")
      .groupBy(col("author"))
      .agg(count(lit(1)).as("n_models"))
      .orderBy(col("n_models").desc, col("author").asc)
      .limit(k)

  /** M2: files-per-repo histogram, reference buckets 1 / 2-5 / 6-10 /
    * 11-15 / 16-50 / >50 (metrics.html:268-288). */
  def filesPerRepoHistogram(repoFile: DataFrame): DataFrame = {
    val perRepo = repoFile.groupBy(col("repo_id")).agg(count(lit(1)).as("n_files"))
    perRepo
      .select(bucketize(col("n_files"), Seq(2, 6, 11, 16, 51)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_repos"))
      .orderBy(col("bucket"))
  }

  /** M3: per-file modification activity over time for one repo — the
    * heatmap feed (metrics.html:122-145): filename × month → #commits. */
  def fileModificationHeatmap(modifiedFile: DataFrame, filesInCommit: DataFrame,
                              commits: DataFrame, repoId: String): DataFrame =
    // project each side down to the join+output columns first: the full
    // modified_file schema carries its own `sha` (Schemas.modifiedFile),
    // which would collide with the commits join key
    modifiedFile.select(col("modified_file_id"), col("filename"))
      .join(filesInCommit.select(col("modified_file_id"), col("sha")), "modified_file_id")
      .join(commits.filter(col("repo_id") === repoId)
              .select(col("sha"), col("committer_date")), "sha")
      .groupBy(col("filename"),
               date_trunc("month", col("committer_date")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_modifications"))
      .orderBy(col("filename"), col("month"))

  /** M4: datasets with/without a paperswithcode id (metrics.html:290-303). */
  def paperswithcodeSplit(dataset: DataFrame): DataFrame =
    dataset
      .groupBy(col("paperswithcode_id").isNotNull.as("has_pwc"))
      .agg(count(lit(1)).as("n_datasets"))
      .orderBy(col("has_pwc"))

  /** M5: share of repos with ≥1 discussion, per repo type
    * (metrics.html:305-321). */
  def discussionShareByType(repository: DataFrame, discussion: DataFrame): DataFrame = {
    val withDisc = discussion.select(col("repo_id")).distinct()
    repository
      .join(withDisc, repository("id") === withDisc("repo_id"), "left_outer")
      .groupBy(col("type"))
      .agg(count(lit(1)).as("n_repos"),
           count(col("repo_id")).as("n_with_discussions"),
           (count(col("repo_id")).cast("double") / count(lit(1))).as("share"))
      .orderBy(col("type"))
  }

  /** M6: discussions-per-repo histogram, buckets 1 / 2-5 / 6-10 / >10
    * (metrics.html:323-344). */
  def discussionsPerRepoHistogram(discussion: DataFrame): DataFrame =
    discussion.groupBy(col("repo_id")).agg(count(lit(1)).as("n_disc"))
      .select(bucketize(col("n_disc"), Seq(2, 6, 11)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_repos"))
      .orderBy(col("bucket"))

  /** M7: average #comments per discussion, per repo, bucketed
    * (metrics.html:346-364). */
  def avgCommentsPerDiscussion(discussionEvent: DataFrame): DataFrame = {
    val perDisc = discussionEvent
      .filter(col("event_type") === "comment")
      .groupBy(col("repo_id"), col("discussion_num"))
      .agg(count(lit(1)).as("n_comments"))
    val perRepo = perDisc.groupBy(col("repo_id"))
      .agg((sum(col("n_comments")).cast("double") / count(lit(1))).as("avg_comments"))
    perRepo
      .select(bucketize(col("avg_comments"), Seq(1.5, 2.5, 5.0)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_repos"))
      .orderBy(col("bucket"))
  }

  /** M8: share of discussions NOT started by the repo owner, per repo
    * (metrics.html:366-392; log-scale histogram feed). */
  def nonOwnerDiscussionShare(repository: DataFrame, discussion: DataFrame): DataFrame = {
    val joined = discussion.alias("d")
      .join(repository.alias("r"), col("d.repo_id") === col("r.id"))
      .select(col("d.repo_id").as("repo_id"),
              (col("d.author") =!= col("r.author")).cast("int").as("non_owner"))
    joined.groupBy(col("repo_id"))
      .agg(count(lit(1)).as("n_discussions"),
           (sum(col("non_owner")).cast("double") / count(lit(1))).as("non_owner_share"))
      .orderBy(col("repo_id"))
  }
}
