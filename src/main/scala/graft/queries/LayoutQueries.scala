package graft.queries

import graft.Tables
import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout plane: the write-side ordering decisions that make
  * 100 TB scans skippable — Z-order clustering audits and the
  * scale-safe global ordinal. Oracle-checked against DuckDB bit
  * arithmetic / ROW_NUMBER.
  */
object LayoutQueries {

  /** qz01: Z-order layout audit over (doc_id, n_chars) mod 64 — the
    * per-bucket count and per-dimension min/max spans a z-ordered
    * write would expose as file statistics (16 z-prefix buckets ==
    * the 4x4 quadrant grid; both columns' spans shrink to 1/4 of the
    * domain in every bucket). Pure bit-arithmetic projection + one
    * aggregation. */
  def zorderLayout(t: Tables): DataFrame = {
    import t.spark.implicits._
    Layout.zorderAudit(t.documents, $"doc_id" % 64, $"n_chars" % 64,
        bits = 6, bucketBits = 4)
      .orderBy($"bucket")
  }

  val zorderLayoutSql: String =
    """WITH b AS (SELECT doc_id % 64 AS x, n_chars % 64 AS y FROM documents),
      |z AS (SELECT x, y, CAST(list_sum(list_transform(range(0,6), i ->
      |    ((x >> i) & 1) * (1::BIGINT << (2*i)) + ((y >> i) & 1) * (1::BIGINT << (2*i+1))
      |  )) AS BIGINT) z FROM b)
      |SELECT z >> 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
      |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin

  /** qz02: deterministic global rank of every document by doc_id —
    * value-range buckets + broadcast offsets + bounded per-bucket
    * windows, never a single-partition window over the corpus. The
    * oracle is the definition itself: ROW_NUMBER() OVER (ORDER BY
    * doc_id). */
  def globalOrdinal(t: Tables): DataFrame = {
    import t.spark.implicits._
    Layout.globalOrdinal(t.documents.select($"doc_id", $"lang"), "doc_id",
        numBuckets = 8)
      .select($"doc_id", $"lang", $"ordinal".cast("long").as("ordinal"))
      .orderBy($"ordinal")
  }

  val globalOrdinalSql: String =
    """SELECT doc_id, lang,
      |  ROW_NUMBER() OVER (ORDER BY doc_id) AS ordinal
      |FROM documents ORDER BY ordinal""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qz01_zorder_layout"  -> ((s: SparkSession, d: String) => zorderLayout(Tables(s, d))),
    "qz02_global_ordinal" -> ((s: SparkSession, d: String) => globalOrdinal(Tables(s, d))),
  )

  def oracles: Map[String, String] = Map(
    "qz01_zorder_layout"  -> zorderLayoutSql,
    "qz02_global_ordinal" -> globalOrdinalSql,
  )
}
