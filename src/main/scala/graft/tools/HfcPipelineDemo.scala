package graft.tools

import graft.GraftSession
import graft.hfc._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** End-to-end drive of the HFC path: catalog bootstrap (E2) → bronze
  * fixtures → Normalize (E1 stage 2) → MergeWriter (stage 3) →
  * HfcMetrics (E3). Prints per-table counts and the M1/M5 results.
  *
  * `runMain graft.tools.HfcPipelineDemo [warehouseDir]`
  */
object HfcPipelineDemo {
  def main(args: Array[String]): Unit = {
    val wh = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("hfc-wh").toString)
    val spark = GraftSession.local(appName = "hfc-pipeline-demo")
    import spark.implicits._

    // E2: catalog bootstrap
    HfcCatalog.dropAll(spark)
    HfcCatalog.createAll(spark, wh)
    println(s"[demo] catalog created: ${Schemas.all.size} tables under $wh")

    // bronze fixtures (API-shaped)
    def listing(rows: (String, String, String, String, Boolean, String, String, Boolean, Int)*): DataFrame =
      rows.toDF("name", "author", "sha", "lm", "private", "card_data", "gated", "disabled", "likes")
        .withColumn("last_modified", col("lm").cast("timestamp")).drop("lm")
    val models = listing(
      ("orgA/m1", "orgA", "s1", "2024-01-05", false, "hello 😀", "True", false, 10),
      ("orgA/m2", "orgA", "s2", "2024-02-11", false, "c2", null, false, 3),
      ("orgB/m3", "orgB", "s3", "2024-03-02", false, "c3", null, false, 7))
    val datasets = listing(("orgA/d1", "orgA", "s4", "2024-01-20", false, "c", "manual", false, 1))
    val spaces = listing(("orgB/s1", "orgB", "s5", "2024-02-28", true, "c", "auto", false, 0))

    // S1-S3: listing via the source boundary — sort+limit pushed
    val src = new graft.sources.FixtureHfhSource(
      models.withColumn("type", lit("model"))
        .withColumn("repo_id", concat(lit("models/"), col("name"))),
      spark.emptyDataFrame, spark.emptyDataFrame)
    val newest = src.listing(spark, "model", limit = 2)
      .select(col("name")).as[String].collect().toSeq
    println(s"[demo] S1 newest-2 model slice: $newest")

    // F2/F3: governance with observable metrics
    val governed = Governance.thresholdSkip(
      Governance.blocklistFilter(models, "name", Seq("orgB/m3")),
      keepIf = col("likes") <= 5)
    println(s"[demo] governance kept: ${governed.select("name").as[String].collect().toSeq.sorted}")

    // E1 stage 2: normalize
    val repos = Normalize.repositories(models, datasets, spaces)
    val bronzeFiles = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("models/orgA/m1", Seq(Row("README.md", 10L, "b1", null),
                                  Row("model.bin", 5L, "b2", Row(99L, "lfs1", 134L)))),
        Row("models/orgB/m3", Seq(Row("config.json", 2L, "b3", null))))),
      StructType(Seq(
        StructField("repo_id", StringType),
        StructField("siblings", ArrayType(StructType(Seq(
          StructField("rfilename", StringType), StructField("size", LongType),
          StructField("blob_id", StringType),
          StructField("lfs", StructType(Seq(
            StructField("size", LongType), StructField("sha256", StringType),
            StructField("pointer_size", LongType)))))))))))
    val files = Normalize.repoFiles(bronzeFiles)
    val (vocab, tagEdges) = Normalize.tagTables(
      Seq(("models/orgA/m1", Seq("nlp", "bert")), ("models/orgB/m3", Seq("nlp")))
        .toDF("repo_id", "tags"))

    // E1 stage 3: MERGE into the catalog tables (upsert, then a
    // second idempotent pass to prove convergence)
    def mergeInto(table: String, batch: DataFrame, keys: Seq[String]): Long = {
      val existing = HfcCatalog.table(spark, table)
      val merged = MergeWriter.upsert(existing.select(batch.columns.toIndexedSeq.map(col): _*), batch, keys)
      val out = s"$wh/${table}_merged"
      merged.write.mode("overwrite").parquet(out)
      spark.read.parquet(out).count()
    }
    println(s"[demo] repository rows after merge: ${mergeInto("repository", repos, Seq("id"))}")
    println(s"[demo] repo_file rows after merge:  ${mergeInto("repo_file", files, Seq("id"))}")
    println(s"[demo] tag rows:                    ${mergeInto("tag", vocab, Seq("name"))}")
    println(s"[demo] tags_in_repo rows:           ${mergeInto("tags_in_repo", tagEdges, Seq("tag_name", "repo_id"))}")

    // E3: analytics over the silver tables
    val m1 = HfcMetrics.topOrgsByModels(repos).as[(String, Long)].collect().toSeq
    println(s"[demo] M1 top orgs by #models: $m1")
    val discussions = Seq((1, "models/orgA/m1", "alice")).toDF("num", "repo_id", "author")
    val m5 = HfcMetrics.discussionShareByType(repos, discussions)
      .as[(String, Long, Long, Double)].collect().toSeq
    println(s"[demo] M5 discussion share: $m5")

    // bucketed co-located join (the 100 TB fact-fact layout): both
    // sides bucketed by repo_id → the join plans with zero Exchange
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    graft.operators.Bucketing.writeBucketed(repos.withColumnRenamed("id", "repo_id"),
      "demo_repos_b", "repo_id", 4)
    graft.operators.Bucketing.writeBucketed(files, "demo_files_b", "repo_id", 4)
    val coloc = graft.operators.Bucketing.colocatedJoin(
      spark, "demo_files_b", "demo_repos_b", "repo_id", "repo_id")
    val plan = coloc.queryExecution.executedPlan.toString
    println(s"[demo] bucketed join rows=${coloc.count()} shuffleFree=${!plan.contains("Exchange")}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    spark.sql("DROP TABLE IF EXISTS demo_repos_b")
    spark.sql("DROP TABLE IF EXISTS demo_files_b")
    HfcCatalog.dropAll(spark)
    spark.stop()
  }
}
