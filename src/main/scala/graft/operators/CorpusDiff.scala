package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Snapshot diff between two corpus versions: per doc id, whether it
  * was added, removed, modified (content hash changed), or unchanged —
  * the audit step of every incremental refresh (what did this month's
  * crawl actually change?) and the input to targeted re-processing
  * (only `added`/`modified` docs re-enter the pipeline).
  *
  * Shape: ONE full-outer join on the id with content compared by
  * md5 — text never shuffles twice, and with both snapshots stored
  * partitioned/bucketed by the id the join co-locates. */
object CorpusDiff {

  /** (id, change_type) for every id present in either snapshot. */
  def diff(v1: DataFrame, v2: DataFrame,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val a = v1.select(col(idCol).as("__id1"), md5(col(textCol)).as("__h1"))
    val b = v2.select(col(idCol).as("__id2"), md5(col(textCol)).as("__h2"))
    a.join(b, col("__id1") === col("__id2"), "full_outer")
      .select(
        coalesce(col("__id1"), col("__id2")).as(idCol),
        when(col("__id1").isNull, "added")
          .when(col("__id2").isNull, "removed")
          .when(col("__h1") =!= col("__h2"), "modified")
          .otherwise("unchanged").as("change_type"))
  }
}
