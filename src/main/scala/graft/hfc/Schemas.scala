package graft.hfc

import org.apache.spark.sql.types._

/** The reference's 17-table relational model as explicit Spark schemas.
  *
  * Source of truth: HFCommunity DDL at
  * `extractor/databaseImport.py:184-251` (MariaDB), mapped per
  * SURVEY.md §1.3:
  *  - INT-as-bool columns → honest `BooleanType`
  *  - `downloads` → `LongType` (deliberate divergence: INTEGER
  *    overflows for top HFH models, SURVEY §7.4.6)
  *  - DATETIME → `TimestampType` (UTC session) + separate int tz offset
  *    (`databaseImport.py:226`)
  *  - LONGTEXT JSON blobs stay `StringType` raw; typed `from_json`
  *    views are provided by [[HfcViews]]
  *
  * Schemas are declared (never inferred) — the reference enforces its
  * schema via `information_schema` checks (`databaseImport.py:61-75`);
  * we enforce via these StructTypes + SchemaSpec parity tests.
  */
object Schemas {

  private def f(name: String, t: DataType, nullable: Boolean = true) =
    StructField(name, t, nullable)

  /** tag — databaseImport.py:184-187 */
  val tag: StructType = StructType(Seq(
    f("name", StringType, nullable = false)))

  /** author — databaseImport.py:188-191; `source` ∈ {commit, hf, hf_owner}.
    * `fullname` added in r14 for dump-interop parity (the reference DDL
    * carries it and the extractor populates it from discussion-event
    * authors, databaseImport.py:515). */
  val author: StructType = StructType(Seq(
    f("username", StringType, nullable = false),
    f("avatar_url", StringType),
    f("is_pro", BooleanType),
    f("fullname", StringType),
    f("type", StringType),
    f("source", StringType)))

  /** repository — databaseImport.py:192-195; supertype of model/dataset/space */
  val repository: StructType = StructType(Seq(
    f("id", StringType, nullable = false),
    f("name", StringType),
    f("type", StringType),          // model | dataset | space (VARCHAR(7))
    f("author", StringType),
    f("sha", StringType),
    f("last_modified", TimestampType),
    f("private", BooleanType),
    f("card_data", StringType),     // raw YAML/JSON blob
    f("gated", StringType),
    f("disabled", BooleanType),
    f("likes", IntegerType)))

  /** repo_file — databaseImport.py:196-199; PK = sha256(repo_id+'_'+rfilename) */
  val repoFile: StructType = StructType(Seq(
    f("id", StringType, nullable = false),
    f("repo_id", StringType, nullable = false),
    f("rfilename", StringType),
    f("size", LongType),
    f("blob_id", StringType),
    f("lfs_size", LongType),
    f("lfs_sha", StringType),
    f("lfs_pointer_size", LongType)))

  /** tags_in_repo — databaseImport.py:200-203 */
  val tagsInRepo: StructType = StructType(Seq(
    f("tag_name", StringType, nullable = false),
    f("repo_id", StringType, nullable = false)))

  /** model — databaseImport.py:204-207 */
  val model: StructType = StructType(Seq(
    f("model_id", StringType, nullable = false),
    f("pipeline_tag", StringType),
    f("downloads", LongType),
    f("library_name", StringType),
    f("config", StringType)))

  /** dataset — databaseImport.py:208-211 */
  val dataset: StructType = StructType(Seq(
    f("dataset_id", StringType, nullable = false),
    f("description", StringType),
    f("citation", StringType),
    f("paperswithcode_id", StringType),
    f("downloads", LongType)))

  /** space — databaseImport.py:212-215 */
  val space: StructType = StructType(Seq(
    f("space_id", StringType, nullable = false),
    f("sdk", StringType),
    f("stage", StringType),
    f("hardware", StringType),
    f("requested_hw", StringType),
    f("sleep_time", IntegerType),
    f("storage", StringType),
    f("runtime_raw", StringType)))

  /** models_in_space — databaseImport.py:216-219 */
  val modelsInSpace: StructType = StructType(Seq(
    f("model_id", StringType, nullable = false),
    f("space_id", StringType, nullable = false)))

  /** datasets_in_space — databaseImport.py:220-223 */
  val datasetsInSpace: StructType = StructType(Seq(
    f("dataset_id", StringType, nullable = false),
    f("space_id", StringType, nullable = false)))

  /** commits — databaseImport.py:224-227; tz kept as int offset */
  val commits: StructType = StructType(Seq(
    f("sha", StringType, nullable = false),
    f("repo_id", StringType),
    f("author_name", StringType),
    f("author_date", TimestampType),
    f("author_tz", IntegerType),
    f("committer_name", StringType),
    f("committer_date", TimestampType),
    f("committer_tz", IntegerType),
    f("message", StringType),
    f("in_main_branch", BooleanType),
    f("insertions", IntegerType),
    f("deletions", IntegerType),
    f("source", StringType)))

  /** discussion — databaseImport.py:228-231 */
  val discussion: StructType = StructType(Seq(
    f("num", IntegerType, nullable = false),
    f("repo_id", StringType, nullable = false),
    f("author", StringType),
    f("title", StringType),
    f("status", StringType),
    f("created_at", TimestampType),
    f("is_pull_request", BooleanType),
    f("target_branch", StringType),
    f("merge_commit_oid", StringType),
    f("diff", StringType),
    f("git_reference", StringType)))

  /** conflicting_files_discussion — databaseImport.py:232-235 */
  val conflictingFilesDiscussion: StructType = StructType(Seq(
    f("id", LongType, nullable = false),   // surrogate (AUTO_INCREMENT in ref)
    f("discussion_num", IntegerType),
    f("repo_id", StringType),
    f("repo_file_id", StringType)))

  /** commit_parents — databaseImport.py:236-239 (commit DAG edges) */
  val commitParents: StructType = StructType(Seq(
    f("commit_sha", StringType, nullable = false),
    f("parent_sha", StringType, nullable = false)))

  /** modified_file — databaseImport.py:240-243; PK = sha256(repo_name+'_'+filename+'_'+sha) */
  val modifiedFile: StructType = StructType(Seq(
    f("modified_file_id", StringType, nullable = false),
    f("repo_file_id", StringType),
    f("filename", StringType),
    f("old_path", StringType),
    f("new_path", StringType),
    f("change_type", StringType),
    f("diff", StringType),
    f("added_lines", IntegerType),
    f("deleted_lines", IntegerType),
    f("nloc", IntegerType)))

  /** files_in_commit — databaseImport.py:244-247 */
  val filesInCommit: StructType = StructType(Seq(
    f("sha", StringType, nullable = false),
    f("modified_file_id", StringType, nullable = false)))

  /** discussion_event — databaseImport.py:248-251; union-typed wide row
    * (comment | status-change | commit | title-change), full payload in
    * `full_data` */
  val discussionEvent: StructType = StructType(Seq(
    f("id", StringType, nullable = false),
    f("discussion_num", IntegerType),
    f("repo_id", StringType),
    f("event_type", StringType),
    f("created_at", TimestampType),
    f("author", StringType),
    f("content", StringType),
    f("edited", BooleanType),
    f("hidden", BooleanType),
    f("new_status", StringType),
    f("summary", StringType),
    f("sha", StringType),
    f("old_title", StringType),
    f("new_title", StringType),
    f("full_data", StringType)))

  /** all 17 tables, name → schema (the `-c` / E2 catalog surface) */
  val all: Map[String, StructType] = Map(
    "tag" -> tag,
    "author" -> author,
    "repository" -> repository,
    "repo_file" -> repoFile,
    "tags_in_repo" -> tagsInRepo,
    "model" -> model,
    "dataset" -> dataset,
    "space" -> space,
    "models_in_space" -> modelsInSpace,
    "datasets_in_space" -> datasetsInSpace,
    "commits" -> commits,
    "discussion" -> discussion,
    "conflicting_files_discussion" -> conflictingFilesDiscussion,
    "commit_parents" -> commitParents,
    "modified_file" -> modifiedFile,
    "files_in_commit" -> filesInCommit,
    "discussion_event" -> discussionEvent)

  /** primary keys per the reference DDL (databaseImport.py:184-251) —
    * the upsert/merge key set for [[MergeWriter]] and [[HfcJdbc]].
    * `conflicting_files_discussion`'s surrogate AUTO_INCREMENT id is
    * its PK in the DDL; we key it the same way. */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "tag" -> Seq("name"),
    "author" -> Seq("username"),
    "repository" -> Seq("id"),
    "repo_file" -> Seq("id"),
    "tags_in_repo" -> Seq("tag_name", "repo_id"),
    "model" -> Seq("model_id"),
    "dataset" -> Seq("dataset_id"),
    "space" -> Seq("space_id"),
    "models_in_space" -> Seq("model_id", "space_id"),
    "datasets_in_space" -> Seq("dataset_id", "space_id"),
    "commits" -> Seq("sha"),
    "discussion" -> Seq("num", "repo_id"),
    "conflicting_files_discussion" -> Seq("id"),
    "commit_parents" -> Seq("commit_sha", "parent_sha"),
    "modified_file" -> Seq("modified_file_id"),
    "files_in_commit" -> Seq("sha", "modified_file_id"),
    "discussion_event" -> Seq("id"))

  /** FK-topological write order (replaces the reference's per-row
    * commit barriers, `databaseImport.py` K6 sites — SURVEY §2.A). */
  val writeOrder: Seq[String] = Seq(
    "tag", "author", "repository", "model", "dataset", "space",
    "repo_file", "tags_in_repo", "models_in_space", "datasets_in_space",
    "commits", "commit_parents", "modified_file", "files_in_commit",
    "discussion", "conflicting_files_discussion", "discussion_event")
}
