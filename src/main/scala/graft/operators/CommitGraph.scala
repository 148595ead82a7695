package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Commit-DAG operators over a `commit_parents(commit_sha, parent_sha)`
  * edge table — the reference declares the table
  * (databaseImport.py:236-239) but never populates it (SURVEY.md
  * §1.5.2); population and graph queries are the extension named there.
  *
  * Scale: [[kHopAncestors]] is bounded-depth iterated self-join — k
  * shuffles on the frontier key, which is the right shape for "show me
  * the last few hops" queries (release diffing, merge-base probes).
  * Unbounded transitive closure would be GraphX/pregel territory; no
  * reference query needs it.
  */
object CommitGraph {

  /** Edge table from a bronze commit walk that carries an explicit
    * `parents` array (PyDriller exposes one per commit) — the direct
    * population path for the reference's `commit_parents` DDL. */
  def edgesFromParents(commitsRaw: DataFrame, shaCol: String = "sha",
                       parentsCol: String = "parents"): DataFrame =
    commitsRaw
      .select(col(shaCol).as("commit_sha"), explode(col(parentsCol)).as("parent_sha"))
      .distinct()

  /** Edge table from a linear-history walk (no explicit parents): each
    * commit's parent is its predecessor within the repo under the given
    * deterministic ordering. */
  def linearEdges(commits: DataFrame, shaCol: String, repoCol: String,
                  order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(repoCol)).orderBy(order: _*)
    commits
      .select(col(shaCol).as("commit_sha"), lag(col(shaCol), 1).over(w).as("parent_sha"))
      .filter(col("parent_sha").isNotNull)
  }

  /** All ancestors within `k` hops: (commit_sha, ancestor_sha, depth)
    * where depth is the MINIMUM hop count (≤ k). Each iteration joins
    * the previous frontier against the edge table — k bounded shuffles,
    * dedup once at the end. */
  def kHopAncestors(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = edges.select(col("commit_sha"), col("parent_sha"))
    val base = e.select(col("commit_sha"), col("parent_sha").as("ancestor_sha"),
                        lit(1L).as("depth"))
    var frontier = base
    var acc = List(base)
    for (d <- 2 to k) {
      frontier = frontier
        .join(e.select(col("commit_sha").as("ancestor_sha"),
                       col("parent_sha").as("__next")), "ancestor_sha")
        .select(col("commit_sha"), col("__next").as("ancestor_sha"), lit(d.toLong).as("depth"))
      acc ::= frontier
    }
    acc.reduce(_ unionByName _)
      .groupBy(col("commit_sha"), col("ancestor_sha"))
      .agg(min(col("depth")).as("depth"))
  }
}
