package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One `DataFrame` per table; plain `spark.read.parquet` so Catalyst gets
  * full pushdown/pruning into the vectorized parquet scan. At cluster scale
  * these would be catalog tables (partitioned + bucketed); the query code
  * below only depends on the logical schema, so swapping the physical
  * layout is a one-line change here.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader only surfaces as LONG (`spark.sql.legacy.parquet.nanosAsLong`,
    * set in [[graft.GraftSession]]). Normalize to a proper microsecond
    * TimestampType here; the driver's fixtures are µs-aligned so `div
    * 1000` is lossless (verified over sf0.1).
    */
  private def withTsNormalized(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df

  lazy val region: DataFrame     = table("region")
  lazy val nation: DataFrame     = table("nation")
  lazy val customer: DataFrame   = table("customer")
  lazy val supplier: DataFrame   = table("supplier")
  lazy val part: DataFrame       = table("part")
  lazy val orders: DataFrame     = table("orders")
  lazy val lineitem: DataFrame   = table("lineitem")
  lazy val events: DataFrame     = withTsNormalized(table("events"))
  lazy val documents: DataFrame  = table("documents")
  lazy val embeddings: DataFrame = table("embeddings")
}
