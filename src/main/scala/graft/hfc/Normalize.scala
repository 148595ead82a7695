package graft.hfc

import graft.hfc.Transforms._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze → silver normalization: the reference's extractor dataflow
  * (databaseImport.py populate_* loops, SURVEY.md §2.A / §3 E1)
  * re-expressed as set-oriented Spark jobs.
  *
  * Bronze inputs are the raw API payload shapes (one row per repo,
  * nested arrays/structs exactly as fetched); silver outputs are the
  * 17-table relational model of [[Schemas]]. The reference processes
  * row-at-a-time with per-row commits; here each table is one
  * distributed transform, and FK ordering is a write-order concern
  * ([[Schemas.writeOrder]]), not a commit barrier.
  *
  * Scale: every function is shuffle-minimal — explodes are
  * partition-local; the only shuffles are the distincts/dedups on
  * write keys and the two FK-repair joins (J1, J2), which AQE handles
  * (broadcast when small, skew-split when not).
  */
object Normalize {

  /** U1: three typed listings → one `repository` table.
    * Applies P4 (canonical plural-prefix id), P10 (`gated`
    * normalization), P6 (config/card cleaning). Each input needs
    * (name, author, sha, last_modified, private, card_data, gated,
    * disabled, likes). */
  def repositories(models: DataFrame, datasets: DataFrame, spaces: DataFrame): DataFrame = {
    def shape(df: DataFrame, tpe: String): DataFrame =
      df.select(
        repoId(lit(tpe), col("name")).as("id"),
        col("name"),
        lit(tpe).as("type"),
        col("author"),
        col("sha"),
        col("last_modified"),
        col("private"),
        cleanText(col("card_data")).as("card_data"),
        normalizeGated(col("gated")).as("gated"),
        col("disabled"),
        col("likes"))
    shape(models, "model")
      .unionByName(shape(datasets, "dataset"))
      .unionByName(shape(spaces, "space"))
  }

  /** S4→repo_file: explode the per-repo `siblings` array, derive the
    * P1 surrogate key, flatten the nullable LFS struct (P5), skip
    * file-less repos (F4). `siblings` elements:
    * struct(rfilename, size, blob_id, lfs struct(size, sha256, pointer_size)). */
  def repoFiles(reposWithSiblings: DataFrame): DataFrame =
    reposWithSiblings
      .filter(size(col("siblings")) > 0)
      .select(col("repo_id"), explode(col("siblings")).as("f"))
      .select(
        repoFileId(col("repo_id"), col("f.rfilename")).as("id"),
        col("repo_id"),
        col("f.rfilename").as("rfilename"),
        col("f.size").as("size"),
        col("f.blob_id").as("blob_id"),
        col("f.lfs.size").as("lfs_size"),
        col("f.lfs.sha256").as("lfs_sha"),
        col("f.lfs.pointer_size").as("lfs_pointer_size"))

  /** U2 + bridge: tag vocabulary (distinct set-insert) and the
    * tags_in_repo M:N edges from the per-repo `tags` array. */
  def tagTables(reposWithTags: DataFrame): (DataFrame, DataFrame) = {
    val edges = reposWithTags
      .select(col("repo_id"), explode(col("tags")).as("tag_name"))
      .select(col("tag_name"), col("repo_id"))
      .distinct()
    val vocab = edges.select(col("tag_name").as("name")).distinct()
    (vocab, edges)
  }

  /** J4: space dependency bridges from the `models`/`datasets` arrays
    * of a space listing (prefixing per P4). */
  def spaceDeps(spacesRaw: DataFrame): (DataFrame, DataFrame) = {
    val m = spacesRaw.select(col("space_id"), explode(col("models")).as("ref"))
      .select(concat(lit("models/"), col("ref")).as("model_id"), col("space_id"))
      .distinct()
    val d = spacesRaw.select(col("space_id"), explode(col("datasets")).as("ref"))
      .select(concat(lit("datasets/"), col("ref")).as("dataset_id"), col("space_id"))
      .distinct()
    (m, d)
  }

  /** P11: the 4 union-typed discussion event kinds dispatched into the
    * wide silver row — each kind populates its column subset, raw
    * payload preserved in full_data (databaseImport.py:521-536). */
  def discussionEvents(eventsRaw: DataFrame): DataFrame = {
    val t = col("event_type")
    eventsRaw.select(
      col("id"),
      col("discussion_num"),
      col("repo_id"),
      t.as("event_type"),
      col("created_at"),
      col("author"),
      when(t === "comment", col("content")).as("content"),
      when(t === "comment", col("edited")).as("edited"),
      when(t === "comment", col("hidden")).as("hidden"),
      when(t === "status-change", col("new_status")).as("new_status"),
      when(t === "commit", col("summary")).as("summary"),
      when(t === "commit", col("sha")).as("sha"),
      when(t === "title-change", col("old_title")).as("old_title"),
      when(t === "title-change", col("new_title")).as("new_title"),
      col("full_data"))
  }

  /** F6/J2: null out `merge_commit_oid` when the commit is absent from
    * `commits` (private/gated repos) — the reference's FK repair
    * (databaseImport.py:481-488) as a left join + existence test. */
  def repairMergeCommits(discussions: DataFrame, commits: DataFrame): DataFrame = {
    val known = commits.select(col("sha").as("__known_sha")).distinct()
    discussions
      .join(known, discussions("merge_commit_oid") === col("__known_sha"), "left_outer")
      .withColumn("merge_commit_oid",
        when(col("__known_sha").isNull, lit(null)).otherwise(col("merge_commit_oid")))
      .drop("__known_sha")
  }

  /** J1: resolve each commit-delta to its repo_file FK by (repo_id,
    * current filename) — left outer, so renamed/historical files get a
    * NULL FK exactly like the reference's dict miss
    * (databaseImport.py:386-387,423). Applies P2 (key), P8 (diff cap),
    * P9 (deleted-file path). */
  def modifiedFiles(deltasRaw: DataFrame, repoFile: DataFrame): DataFrame = {
    val deltas = deltasRaw.select(
      col("repo_id"), col("repo_name"), col("sha"),
      effectivePath(col("change_type"), col("old_path"), col("new_path")).as("filename"),
      col("old_path"), col("new_path"), col("change_type"),
      capDiff(col("diff")).as("diff"),
      col("added_lines"), col("deleted_lines"), col("nloc"))
    val files = repoFile.select(
      col("repo_id"), col("rfilename").as("filename"), col("id").as("repo_file_id"))
    deltas
      .join(files, Seq("repo_id", "filename"), "left_outer")
      .select(
        modifiedFileId(col("repo_name"), col("filename"), col("sha")).as("modified_file_id"),
        col("repo_file_id"),
        col("filename"), col("old_path"), col("new_path"), col("change_type"),
        col("diff"), col("added_lines"), col("deleted_lines"), col("nloc"),
        col("sha"))
  }

  /** files_in_commit bridge from resolved deltas. */
  def filesInCommit(modifiedFiles: DataFrame): DataFrame =
    modifiedFiles.select(col("sha"), col("modified_file_id")).distinct()

  /** commit_parents population (the SURVEY §1.5.2 extension: the
    * reference declares the DDL at databaseImport.py:236-239 but never
    * fills it). Bronze commit walks carry each commit's `parents` list
    * (PyDriller exposes it); explode + distinct is the whole job. DAG
    * queries over the result live in
    * [[graft.operators.CommitGraph]]. */
  def commitParents(commitsRaw: DataFrame): DataFrame =
    graft.operators.CommitGraph.edgesFromParents(commitsRaw)
}
