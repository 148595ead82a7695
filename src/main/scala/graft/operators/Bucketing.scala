package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY.md §7.1 step 7:
  * "partition silver tables by type + bucket by repo_id").
  *
  * At 100 TB the dominant shuffles are the fact-fact joins
  * (repo_file ⋈ modified_file on repo_id, commits ⋈ files_in_commit on
  * sha). Writing both sides bucketed on the join key with the same
  * bucket count makes those joins shuffle-FREE: Spark reads matching
  * buckets pairwise and sort-merge-joins them in place
  * (BucketingSpec asserts the plan has no Exchange). Bucket count is a
  * layout contract — size it so one bucket ≈ one task's worth of data
  * at the target scale (e.g. 63M repo_file rows / 2048 buckets).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * sort-merge join needs no extra sort). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when bucket counts match. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String,
                    joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }
}
