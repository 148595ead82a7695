package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-source boundary for the Hub listings (SURVEY.md §2.A S1-S6).
  *
  * The reference calls `list_models/list_datasets/list_spaces` with
  * `sort="lastModified", direction=-1, limit=N` — i.e. it PUSHES the
  * sort and limit to the API (databaseImport.py:597,685,765), and
  * fetches per-repo details (files S4, discussions S5, runtime S6) as
  * N+1 calls.
  *
  * This container has zero egress, so the production connector is an
  * interface; [[FixtureHfhSource]] is the fixture-backed fake used by
  * tests and demos. The contract both must honor:
  *  - `listing` returns the newest `limit` repos of `repoType` in
  *    last_modified-descending order (the slice semantics of the
  *    CLI's `-i`, usage.html),
  *  - detail frames are keyed by repo_id and fetched only for the
  *    listed slice (the N+1 becomes a semi-join pushdown here).
  *
  * Scale: a real connector shards the listing across executors with
  * `mapPartitions` + rate limiting and lands bronze parquet; Spark
  * never sees the HTTP layer (SURVEY §3 E1 redesign).
  */
trait HfhSource {
  /** newest-first listing, sort+limit pushed to the source */
  def listing(spark: SparkSession, repoType: String, limit: Int): DataFrame
  /** per-repo file metadata for the given listing slice (S4) */
  def files(spark: SparkSession, listed: DataFrame): DataFrame
  /** per-repo discussions incl. events for the slice (S5) */
  def discussions(spark: SparkSession, listed: DataFrame): DataFrame
}

/** Deterministic in-memory fake: bronze frames provided up front; the
  * pushed sort/limit and the per-slice detail fetches are real. */
final class FixtureHfhSource(repos: DataFrame, filesRaw: DataFrame,
                             discussionsRaw: DataFrame) extends HfhSource {

  override def listing(spark: SparkSession, repoType: String, limit: Int): DataFrame =
    repos.filter(col("type") === repoType)
      .orderBy(col("last_modified").desc, col("name").asc)
      .limit(limit)

  override def files(spark: SparkSession, listed: DataFrame): DataFrame =
    filesRaw.join(listed.select(col("repo_id")).distinct(), Seq("repo_id"), "left_semi")

  override def discussions(spark: SparkSession, listed: DataFrame): DataFrame =
    discussionsRaw.join(listed.select(col("repo_id")).distinct(), Seq("repo_id"), "left_semi")
}
