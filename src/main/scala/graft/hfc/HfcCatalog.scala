package graft.hfc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** Catalog bootstrap — the reference's `-c` schema-create entry point
  * (E2, databaseImport.py:150-253) on a Parquet warehouse.
  *
  * Creates the `hfc` database with all 17 tables as managed parquet
  * tables under `warehouseDir`, each with its declared [[Schemas]]
  * StructType (never inferred). Idempotent; FK order is irrelevant for
  * creation (constraints are informational — enforced by tests and
  * the [[Schemas.writeOrder]] write discipline instead of per-row
  * commit barriers).
  */
object HfcCatalog {

  val Database = "hfc"

  def createAll(spark: SparkSession, warehouseDir: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
    Schemas.all.foreach { case (name, schema) =>
      empty(spark, name).write
        .mode("ignore")
        .option("path", s"$warehouseDir/$name")
        .format("parquet")
        .saveAsTable(s"$Database.$name")
    }
  }

  def empty(spark: SparkSession, table: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.all(table))

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(s"$Database.$name")

  def dropAll(spark: SparkSession): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS $Database CASCADE")
}
