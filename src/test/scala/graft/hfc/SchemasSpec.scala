package graft.hfc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Schema-parity checks against the reference DDL
  * (databaseImport.py:184-251) per SURVEY.md §5.4. */
class SchemasSpec extends AnyFunSuite {

  test("all 17 reference tables are declared") {
    val expected = Set(
      "tag", "author", "repository", "repo_file", "tags_in_repo", "model",
      "dataset", "space", "models_in_space", "datasets_in_space", "commits",
      "discussion", "conflicting_files_discussion", "commit_parents",
      "modified_file", "files_in_commit", "discussion_event")
    assert(Schemas.all.keySet == expected)
  }

  test("write order covers every table exactly once, parents first") {
    assert(Schemas.writeOrder.toSet == Schemas.all.keySet)
    assert(Schemas.writeOrder.size == 17)
    val idx = Schemas.writeOrder.zipWithIndex.toMap
    // child tables come after their FK parents
    assert(idx("repository") < idx("model"))
    assert(idx("repository") < idx("repo_file"))
    assert(idx("commits") < idx("files_in_commit"))
    assert(idx("discussion") < idx("discussion_event"))
    assert(idx("tag") < idx("tags_in_repo"))
  }

  test("primary key columns are non-nullable") {
    def pk(t: String, cols: String*): Unit = cols.foreach { c =>
      val fld = Schemas.all(t)(c)
      assert(!fld.nullable, s"$t.$c must be non-nullable")
    }
    pk("tag", "name"); pk("author", "username"); pk("repository", "id")
    pk("repo_file", "id"); pk("tags_in_repo", "tag_name", "repo_id")
    pk("model", "model_id"); pk("dataset", "dataset_id"); pk("space", "space_id")
    pk("commits", "sha"); pk("discussion", "num", "repo_id")
    pk("commit_parents", "commit_sha", "parent_sha")
    pk("modified_file", "modified_file_id")
    pk("files_in_commit", "sha", "modified_file_id")
    pk("discussion_event", "id")
  }

  test("type mappings follow SURVEY §1.3 (bools honest, downloads long)") {
    assert(Schemas.repository("private").dataType == BooleanType)
    assert(Schemas.repository("likes").dataType == IntegerType)
    assert(Schemas.model("downloads").dataType == LongType)     // §7.4.6 divergence
    assert(Schemas.dataset("downloads").dataType == LongType)
    assert(Schemas.repoFile("size").dataType == LongType)
    assert(Schemas.commits("author_date").dataType == TimestampType)
    assert(Schemas.commits("author_tz").dataType == IntegerType)
    assert(Schemas.discussion("is_pull_request").dataType == BooleanType)
    assert(Schemas.discussionEvent("full_data").dataType == StringType)
  }
}
