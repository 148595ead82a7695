package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + DuckDB oracle from the
  * per-domain modules under `graft.queries`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RelationalQueries.regionRevenue(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.QualityQueries.queries ++
      graft.queries.LayoutQueries.queries ++
      graft.queries.RetrievalQueries.queries ++
      graft.queries.InteropQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.ExtendedQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.QualityQueries.oracles ++
      graft.queries.LayoutQueries.oracles ++
      graft.queries.RetrievalQueries.oracles ++
      graft.queries.InteropQueries.oracles
}
