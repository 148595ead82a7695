package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Bronze→silver parity tests, incl. the SURVEY §1.5 traps: gated
  * normalization, LFS nulls, renamed-file J1 miss, merge-commit
  * repair. */
class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def listing(rows: (String, String, String, Timestamp, Boolean, String, String, Boolean, Int)*): DataFrame =
    rows.toDF("name", "author", "sha", "last_modified", "private", "card_data", "gated", "disabled", "likes")

  test("repositories: 3-way union, plural ids, gated nulling, emoji strip") {
    val models = listing(("orgA/m1", "orgA", "s1", ts("2024-01-01"), false, "card 😀 here", "True", false, 5))
    val datasets = listing(("orgA/d1", "orgA", "s2", ts("2024-01-02"), false, "c", "manual", false, 2))
    val spaces = listing(("orgB/s1", "orgB", "s3", ts("2024-01-03"), true, "c", "auto", false, 0))
    val out = Normalize.repositories(models, datasets, spaces)
    val byId = out.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId.keySet == Set("models/orgA/m1", "datasets/orgA/d1", "spaces/orgB/s1"))
    assert(byId("models/orgA/m1").getAs[String]("card_data") == "card  here")   // P6
    assert(byId("models/orgA/m1").getAs[String]("gated") == "True")
    assert(byId("datasets/orgA/d1").getAs[String]("gated") == null)             // P10 manual→null
    assert(byId("spaces/orgB/s1").getAs[String]("gated") == null)               // P10 auto→null
    assert(out.schema("type").dataType == StringType)
  }

  private val siblingType = ArrayType(StructType(Seq(
    StructField("rfilename", StringType),
    StructField("size", LongType),
    StructField("blob_id", StringType),
    StructField("lfs", StructType(Seq(
      StructField("size", LongType),
      StructField("sha256", StringType),
      StructField("pointer_size", LongType)))))))

  test("repoFiles: explode + P1 key + LFS flatten with null propagation + F4 guard") {
    val schema = StructType(Seq(
      StructField("repo_id", StringType), StructField("siblings", siblingType)))
    val rows = Seq(
      Row("models/a/m", Seq(
        Row("README.md", 10L, "b1", null),
        Row("model.bin", 999L, "b2", Row(999L, "lfssha", 134L)))),
      Row("models/a/empty", Seq.empty[Row]))
    val bronze = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = Normalize.repoFiles(bronze).collect().map(r => r.getAs[String]("rfilename") -> r).toMap
    assert(out.keySet == Set("README.md", "model.bin"))   // empty repo skipped
    assert(out("README.md").getAs[Any]("lfs_size") == null)
    assert(out("model.bin").getAs[Long]("lfs_size") == 999L)
    assert(out("model.bin").getAs[String]("lfs_sha") == "lfssha")
    // P1: id = sha256(repo_id + '_' + rfilename)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("models/a/m_README.md".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out("README.md").getAs[String]("id") == expected)
  }

  test("tagTables: distinct vocabulary + M:N edges") {
    val bronze = Seq(
      ("models/a/m", Seq("nlp", "bert")),
      ("models/a/n", Seq("nlp"))).toDF("repo_id", "tags")
    val (vocab, edges) = Normalize.tagTables(bronze)
    assert(vocab.as[String].collect().toSet == Set("nlp", "bert"))
    assert(edges.as[(String, String)].collect().toSet ==
      Set(("nlp", "models/a/m"), ("bert", "models/a/m"), ("nlp", "models/a/n")))
  }

  test("spaceDeps: prefixed bridge edges (J4)") {
    val bronze = Seq(
      ("spaces/o/s1", Seq("a/m1", "a/m2"), Seq("a/d1"))).toDF("space_id", "models", "datasets")
    val (m, d) = Normalize.spaceDeps(bronze)
    assert(m.as[(String, String)].collect().toSet ==
      Set(("models/a/m1", "spaces/o/s1"), ("models/a/m2", "spaces/o/s1")))
    assert(d.as[(String, String)].collect().toSet == Set(("datasets/a/d1", "spaces/o/s1")))
  }

  test("discussionEvents: union-type dispatch populates only the kind's columns (P11)") {
    val bronze = Seq(
      ("e1", 1, "r", "comment", ts("2024-01-01"), "alice", "hello", false, false, "st", "sum", "sha1", "o", "n", "{}"),
      ("e2", 1, "r", "status-change", ts("2024-01-02"), "bob", "IGNORED", true, true, "closed", "sum", "sha1", "o", "n", "{}"))
      .toDF("id", "discussion_num", "repo_id", "event_type", "created_at", "author",
            "content", "edited", "hidden", "new_status", "summary", "sha", "old_title", "new_title", "full_data")
    val out = Normalize.discussionEvents(bronze).collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(out("e1").getAs[String]("content") == "hello")
    assert(out("e1").getAs[Any]("new_status") == null)
    assert(out("e2").getAs[Any]("content") == null)       // comment column nulled for other kinds
    assert(out("e2").getAs[String]("new_status") == "closed")
    assert(out("e2").getAs[String]("full_data") == "{}")  // raw payload always kept
  }

  test("repairMergeCommits nulls unknown merge oids, keeps known (F6/J2)") {
    val discussions = Seq(
      (1, "r1", "known-sha"), (2, "r1", "gone-sha"), (3, "r1", null))
      .toDF("num", "repo_id", "merge_commit_oid")
    val commits = Seq(("known-sha", "r1")).toDF("sha", "repo_id")
    val out = Normalize.repairMergeCommits(discussions, commits)
      .select("num", "merge_commit_oid").as[(Int, Option[String])].collect().toMap
    assert(out(1).contains("known-sha"))
    assert(out(2).isEmpty)
    assert(out(3).isEmpty)
  }

  test("modifiedFiles: J1 left join resolves FK, renamed files miss to NULL, P8/P9 applied") {
    val repoFile = Seq(
      ("fid-1", "models/a/m", "current.py")).toDF("id", "repo_id", "rfilename")
    val deltas = Seq(
      ("models/a/m", "a/m", "c1", "old.py", "current.py", "MODIFY", "small diff", 1, 0, 10),
      ("models/a/m", "a/m", "c1", "historic.py", "renamed-away.py", "MODIFY", "x" * 2000000, 2, 1, 5),
      ("models/a/m", "a/m", "c2", "current.py", "ignored-by-delete", "DELETE", "d", 0, 3, 0))
      .toDF("repo_id", "repo_name", "sha", "old_path", "new_path", "change_type",
            "diff", "added_lines", "deleted_lines", "nloc")
    val out = Normalize.modifiedFiles(deltas, repoFile).collect()
      .map(r => (r.getAs[String]("sha"), r.getAs[String]("filename")) -> r).toMap
    // resolved FK by current path
    assert(out(("c1", "current.py")).getAs[String]("repo_file_id") == "fid-1")
    // renamed file: no match → NULL FK (reference dict-miss semantics)
    assert(out(("c1", "renamed-away.py")).getAs[Any]("repo_file_id") == null)
    // P8: >1MiB diff replaced by sentinel
    assert(out(("c1", "renamed-away.py")).getAs[String]("diff") == Transforms.DiffSentinel)
    // P9: DELETE keeps old_path as filename → still resolves
    assert(out(("c2", "current.py")).getAs[String]("repo_file_id") == "fid-1")
    // P2 key determinism: sha256(repo_name + '_' + filename + '_' + sha)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("a/m_current.py_c1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(("c1", "current.py")).getAs[String]("modified_file_id") == expected)
    // bridge table covers every delta exactly once
    assert(Normalize.filesInCommit(Normalize.modifiedFiles(deltas, repoFile)).count() == 3)
  }
}
