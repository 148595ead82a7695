package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import java.sql.Timestamp

/** E2E-on-fixtures for the published metrics (SURVEY.md §5.5): an
  * HFC-shaped mini corpus → M1-M8 → exact numbers. */
class HfcMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private lazy val repository: DataFrame = Seq(
    ("models/orgA/m1", "m1", "model", "orgA"),
    ("models/orgA/m2", "m2", "model", "orgA"),
    ("models/orgA/m3", "m3", "model", "orgA"),
    ("models/orgB/m4", "m4", "model", "orgB"),
    ("datasets/orgA/d1", "d1", "dataset", "orgA"),
    ("datasets/orgC/d2", "d2", "dataset", "orgC"),
    ("spaces/orgB/s1", "s1", "space", "orgB"),
  ).toDF("id", "name", "type", "author")

  private lazy val repoFile: DataFrame = Seq(
    // m1: 1 file; m2: 3 files; m4: 6 files
    ("f1", "models/orgA/m1"), ("f2", "models/orgA/m2"), ("f3", "models/orgA/m2"),
    ("f4", "models/orgA/m2"), ("f5", "models/orgB/m4"), ("f6", "models/orgB/m4"),
    ("f7", "models/orgB/m4"), ("f8", "models/orgB/m4"), ("f9", "models/orgB/m4"),
    ("f10", "models/orgB/m4"),
  ).toDF("id", "repo_id")

  private lazy val dataset: DataFrame = Seq(
    ("datasets/orgA/d1", Some("pwc-1")),
    ("datasets/orgC/d2", None: Option[String]),
  ).toDF("dataset_id", "paperswithcode_id")

  private lazy val discussion: DataFrame = Seq(
    (1, "models/orgA/m1", "orgA"),   // owner-started
    (2, "models/orgA/m1", "alice"),  // non-owner
    (3, "models/orgA/m1", "bob"),
    (1, "datasets/orgA/d1", "orgA"),
  ).toDF("num", "repo_id", "author")

  private lazy val discussionEvent: DataFrame = Seq(
    ("e1", 1, "models/orgA/m1", "comment"),
    ("e2", 1, "models/orgA/m1", "comment"),
    ("e3", 2, "models/orgA/m1", "comment"),
    ("e4", 2, "models/orgA/m1", "status-change"),
    ("e5", 1, "datasets/orgA/d1", "comment"),
  ).toDF("id", "discussion_num", "repo_id", "event_type")

  private lazy val commits: DataFrame = Seq(
    ("c1", "models/orgA/m1", ts("2024-01-10")),
    ("c2", "models/orgA/m1", ts("2024-01-20")),
    ("c3", "models/orgA/m1", ts("2024-02-05")),
  ).toDF("sha", "repo_id", "committer_date")

  // carries its own `sha` column like the declared table schema does —
  // the heatmap must not trip on ambiguity with the commits join key
  private lazy val modifiedFile: DataFrame = Seq(
    ("mf1", "README.md", "c1"), ("mf2", "model.bin", "c1"), ("mf3", "README.md", "c2"),
  ).toDF("modified_file_id", "filename", "sha")

  private lazy val filesInCommit: DataFrame = Seq(
    ("c1", "mf1"), ("c1", "mf2"), ("c2", "mf3"), ("c3", "mf3"),
  ).toDF("sha", "modified_file_id")

  test("M1: top orgs by #models, deterministic ties") {
    val out = HfcMetrics.topOrgsByModels(repository).as[(String, Long)].collect().toSeq
    assert(out == Seq(("orgA", 3L), ("orgB", 1L)))
  }

  test("M2: files-per-repo histogram with reference buckets") {
    val out = HfcMetrics.filesPerRepoHistogram(repoFile)
      .as[(String, Long)].collect().toMap
    assert(out == Map("<2" -> 1L, "[2,6)" -> 1L, "[6,11)" -> 1L))
  }

  test("M3: heatmap feed counts modifications per file-month") {
    val out = HfcMetrics.fileModificationHeatmap(
      modifiedFile, filesInCommit, commits, "models/orgA/m1")
      .as[(String, java.sql.Date, Long)].collect().toSet
    assert(out == Set(
      ("README.md", java.sql.Date.valueOf("2024-01-01"), 2L),
      ("README.md", java.sql.Date.valueOf("2024-02-01"), 1L),
      ("model.bin", java.sql.Date.valueOf("2024-01-01"), 1L)))
  }

  test("M4: paperswithcode split") {
    val out = HfcMetrics.paperswithcodeSplit(dataset).as[(Boolean, Long)].collect().toMap
    assert(out == Map(false -> 1L, true -> 1L))
  }

  test("M5: discussion share per repo type") {
    val out = HfcMetrics.discussionShareByType(repository, discussion)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("model") == ((4L, 1L, 0.25)))
    assert(out("dataset") == ((2L, 1L, 0.5)))
    assert(out("space") == ((1L, 0L, 0.0)))
  }

  test("M6: discussions-per-repo histogram") {
    val out = HfcMetrics.discussionsPerRepoHistogram(discussion)
      .as[(String, Long)].collect().toMap
    assert(out == Map("[2,6)" -> 1L, "<2" -> 1L))   // m1 has 3, d1 has 1
  }

  test("M7: avg comments per discussion, bucketed") {
    // m1: discussions 1→2 comments, 2→1 comment → avg 1.5 → [1.5,2.5)
    // d1: 1 comment → avg 1.0 → <1.5
    val out = HfcMetrics.avgCommentsPerDiscussion(discussionEvent)
      .as[(String, Long)].collect().toMap
    assert(out == Map("[1.5,2.5)" -> 1L, "<1.5" -> 1L))
  }

  test("M8: non-owner discussion share per repo") {
    val out = HfcMetrics.nonOwnerDiscussionShare(repository, discussion)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("models/orgA/m1")._1 == 3L)
    assert(math.abs(out("models/orgA/m1")._2 - 2.0 / 3.0) < 1e-12)
    assert(out("datasets/orgA/d1") == ((1L, 0.0)))
  }
}
