package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Live Hub connector over the public REST API — the production
  * implementation of [[HfhSource]] the fixture fake stands in for.
  * Drives the same endpoints the reference reaches through the
  * huggingface_hub client (databaseImport.py:597,685,765 list_models /
  * list_datasets / list_spaces; :467 get_repo_discussions):
  *
  *   GET {base}/api/{models|datasets|spaces}?sort=lastModified&direction=-1&limit=N
  *   GET {base}/api/{models|datasets|spaces}/{repo}               (siblings detail)
  *   GET {base}/api/{models|datasets|spaces}/{repo}/discussions?p=K  (paged)
  *
  * Shape contract (what [[graft.hfc.Normalize]] consumes):
  *  - `listing` → one row per repo: name, type, author, sha,
  *    last_modified (timestamp), private, card_data (raw JSON string),
  *    gated (raw string: "false"/"auto"/"manual"), disabled, likes,
  *    repo_id (P4 plural-prefixed) — newest-first, limit pushed to the
  *    API exactly like the reference's sort/direction/limit params.
  *  - `files` → (repo_id, siblings array<struct rfilename/size/blob_id/
  *    lfs{size,sha256,pointer_size}>) — [[graft.hfc.Normalize.repoFiles]]'
  *    bronze input.
  *  - `discussions` → one row per discussion: repo_id, num, title,
  *    status, created_at, author, is_pull_request, full_data (raw JSON).
  *
  * Scale/resilience: the listing is ONE driver-side call (it is the
  * work list); the N+1 detail fetches run on executors through
  * [[ResilientFetch]] — per-partition rate limit, bounded backoff on
  * 429/5xx/IO, and per-repo quarantine rows instead of task failures
  * (`filesWithQuarantine` / `discussionsWithQuarantine` expose them;
  * the plain trait methods return the good rows). JSON lands as raw
  * strings on the executors and is parsed COLUMNAR-ly with `from_json`
  * — the HTTP layer never shapes data, Spark does.
  *
  * Zero-egress note: this class only dials the `baseUrl` it is given;
  * HttpHfhSourceSpec drives it against an in-process JDK HttpServer on
  * localhost. Pointing it at https://huggingface.co is a constructor
  * argument away and changes no code.
  */
final class HttpHfhSource(baseUrl: String, token: Option[String] = None,
                          policy: ResilientFetch.Policy = ResilientFetch.Policy(),
                          maxDiscussionPages: Int = 100)
    extends HfhSource with Serializable {

  private val base = baseUrl.stripSuffix("/")

  @transient private lazy val http = java.net.http.HttpClient.newHttpClient()

  /** one GET → body string; non-200 surfaces as [[ResilientFetch.HttpStatusException]]
    * so the retry/quarantine classification applies */
  private def get(url: String): String = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30)).GET()
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = http.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw ResilientFetch.HttpStatusException(resp.statusCode(), url)
    resp.body()
  }

  private def plural(repoType: String): String = repoType match {
    case "model" => "models"; case "dataset" => "datasets"; case "space" => "spaces"
    case other => throw new IllegalArgumentException(s"unknown repoType: $other")
  }

  private def textOrNull(n: JsonNode, field: String): String = {
    val f = n.get(field)
    if (f == null || f.isNull) null
    else if (f.isTextual) f.asText()
    else f.toString // objects (cardData) and booleans (gated=false) as raw JSON
  }

  private def parseTs(iso: String): java.sql.Timestamp =
    if (iso == null) null
    else java.sql.Timestamp.from(java.time.Instant.parse(iso))

  private val listingSchema = StructType(Seq(
    StructField("name", StringType), StructField("type", StringType),
    StructField("author", StringType), StructField("sha", StringType),
    StructField("last_modified", TimestampType), StructField("private", BooleanType),
    StructField("card_data", StringType), StructField("gated", StringType),
    StructField("disabled", BooleanType), StructField("likes", LongType),
    StructField("repo_id", StringType)))

  override def listing(spark: SparkSession, repoType: String, limit: Int): DataFrame = {
    val p = plural(repoType)
    // full=true is LOAD-BEARING: the Hub's default list payload omits
    // sha/lastModified/siblings/gated entirely — the reference requests
    // list_models(full=True, cardData=True, fetch_config=True, ...)
    // (databaseImport.py:597) and these are the REST translations the
    // huggingface_hub client sends. Without them every listing row
    // would come back with NULL sha/last_modified against the real
    // Hub (caught by the cassette fixtures, HubCassetteSpec).
    val extra = repoType match {
      case "model" => "full=true&cardData=true&config=true&"
      case _       => "full=true&"
    }
    val json = get(s"$base/api/$p?${extra}sort=lastModified&direction=-1&limit=$limit")
    val mapper = new ObjectMapper()
    val rows = mapper.readTree(json).elements().asScala.map { n =>
      val name = textOrNull(n, "id")
      Row(name, repoType, textOrNull(n, "author"), textOrNull(n, "sha"),
        parseTs(textOrNull(n, "lastModified")),
        Option(n.get("private")).exists(_.asBoolean(false)),
        textOrNull(n, "cardData"), textOrNull(n, "gated"),
        Option(n.get("disabled")).exists(_.asBoolean(false)),
        Option(n.get("likes")).map(_.asLong(0L)).getOrElse(0L),
        s"$p/$name")
    }.toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), listingSchema)
      .orderBy(col("last_modified").desc, col("name").asc)
  }

  /** executor-side N+1 detail fetch for the listed slice: the id list
    * is collected on the driver (it IS the bounded work list — ≤ the
    * pushed listing limit, the IvfIndex-metadata precedent), fanned out
    * via [[ResilientFetch.fetchDataset]]. Returns raw-JSON outcomes. */
  private def detailOutcomes(spark: SparkSession, listed: DataFrame,
                             fetch: String => String) = {
    import spark.implicits._
    val ids = listed.select(col("repo_id")).distinct().as[String].collect().toSeq
    ResilientFetch.fetchDataset[String](spark.createDataset(ids), fetch, policy)
  }

  private val lfsSchema = StructType(Seq(
    StructField("size", LongType), StructField("sha256", StringType),
    StructField("pointerSize", LongType)))
  private val detailSchema = StructType(Seq(
    StructField("siblings", ArrayType(StructType(Seq(
      StructField("rfilename", StringType), StructField("size", LongType),
      StructField("blobId", StringType), StructField("lfs", lfsSchema)))))))

  def filesWithQuarantine(spark: SparkSession, listed: DataFrame): (DataFrame, DataFrame) = {
    // blobs=true is LOAD-BEARING: without it the Hub's repo detail
    // lists siblings as bare rfilenames — size/blobId/lfs all absent.
    // The reference requests repo_info(files_metadata=True)
    // (databaseImport.py:299), which is this query param.
    val out = detailOutcomes(spark, listed, id => get(s"$base/api/$id?blobs=true")).toDF()
    val good = out.filter(col("error").isNull)
      .select(col("key").as("repo_id"),
        from_json(col("value"), detailSchema).getField("siblings").as("s0"))
      .select(col("repo_id"),
        // API camelCase → the Normalize.repoFiles bronze contract names
        transform(coalesce(col("s0"), array()), f => struct(
          f.getField("rfilename").as("rfilename"),
          f.getField("size").as("size"),
          f.getField("blobId").as("blob_id"),
          struct(
            f.getField("lfs").getField("size").as("size"),
            f.getField("lfs").getField("sha256").as("sha256"),
            f.getField("lfs").getField("pointerSize").as("pointer_size")
          ).as("lfs"))).as("siblings"))
    val quarantine = out.filter(col("error").isNotNull)
      .select(col("key").as("repo_id"), col("attempts"), col("error"))
    (good, quarantine)
  }

  override def files(spark: SparkSession, listed: DataFrame): DataFrame =
    filesWithQuarantine(spark, listed)._1

  private val discussionPageSchema = StructType(Seq(
    StructField("discussions", ArrayType(StructType(Seq(
      StructField("raw", StringType),
      StructField("d", StructType(Seq(
        StructField("num", LongType), StructField("title", StringType),
        StructField("status", StringType), StructField("createdAt", StringType),
        StructField("author", StructType(Seq(StructField("name", StringType)))),
        StructField("isPullRequest", BooleanType))))))))))

  def discussionsWithQuarantine(spark: SparkSession, listed: DataFrame): (DataFrame, DataFrame) = {
    val pages = maxDiscussionPages
    val out = detailOutcomes(spark, listed, { id =>
      // page until an empty page, concatenating the `discussions`
      // arrays into one synthetic page — the reference's paging loop
      // (get_repo_discussions iterates the generator) collapsed into
      // the fetch closure so retry/quarantine wrap the WHOLE repo
      val mapper = new ObjectMapper()
      val all = mapper.createArrayNode()
      var p = 0
      var done = false
      while (!done && p < pages) {
        val page = mapper.readTree(get(s"$base/api/$id/discussions?p=$p"))
        val ds = page.get("discussions")
        if (ds == null || !ds.elements().hasNext) done = true
        else {
          // each element carries BOTH the complete object (raw — the
          // reference's full_data LONGTEXT keeps every field, incl.
          // ones the typed parse ignores) and the node for columnar
          // field extraction
          ds.elements().asScala.foreach { n =>
            val w = mapper.createObjectNode()
            w.put("raw", n.toString)
            w.set[JsonNode]("d", n)
            all.add(w)
          }
          p += 1
        }
      }
      val root = mapper.createObjectNode()
      root.set[JsonNode]("discussions", all)
      root.toString
    }: String => String)
    val good = out.toDF().filter(col("error").isNull)
      .select(col("key").as("repo_id"),
        explode_outer(from_json(col("value"), discussionPageSchema).getField("discussions")).as("w"))
      .filter(col("w").isNotNull)
      .select(col("repo_id"), col("w.d.num").as("num"), col("w.d.title").as("title"),
        col("w.d.status").as("status"),
        to_timestamp(col("w.d.createdAt")).as("created_at"),
        col("w.d.author.name").as("author"),
        coalesce(col("w.d.isPullRequest"), lit(false)).as("is_pull_request"),
        col("w.raw").as("full_data"))
    val quarantine = out.toDF().filter(col("error").isNotNull)
      .select(col("key").as("repo_id"), col("attempts"), col("error"))
    (good, quarantine)
  }

  override def discussions(spark: SparkSession, listed: DataFrame): DataFrame =
    discussionsWithQuarantine(spark, listed)._1

  /** S6: space runtime enrichment — GET /api/{repo_id}/runtime per
    * listed space (databaseImport.py:801-806 `get_space_runtime`),
    * returned RAW as `runtime_raw` so
    * [[graft.hfc.HfcViews.withRuntimeView]] parses it columnar-ly.
    * Same quarantine split as the other N+1 fetches. */
  def spaceRuntimesWithQuarantine(spark: SparkSession, listed: DataFrame): (DataFrame, DataFrame) = {
    val out = detailOutcomes(spark, listed, id => get(s"$base/api/$id/runtime")).toDF()
    val good = out.filter(col("error").isNull)
      .select(col("key").as("repo_id"), col("value").as("runtime_raw"))
    val quarantine = out.filter(col("error").isNotNull)
      .select(col("key").as("repo_id"), col("attempts"), col("error"))
    (good, quarantine)
  }

  def spaceRuntimes(spark: SparkSession, listed: DataFrame): DataFrame =
    spaceRuntimesWithQuarantine(spark, listed)._1

  /** Space detail fetch feeding [[graft.hfc.Normalize.spaceDeps]] (J4):
    * GET /api/{repo_id} per listed space, returning (space_id, models,
    * datasets) with the dependency arrays parsed columnar-ly. Spaces
    * with no declared deps get empty arrays (explode-safe). */
  def spaceDepsWithQuarantine(spark: SparkSession, listed: DataFrame): (DataFrame, DataFrame) = {
    val out = detailOutcomes(spark, listed, id => get(s"$base/api/$id")).toDF()
    val depsSchema = StructType(Seq(
      StructField("models", ArrayType(StringType)),
      StructField("datasets", ArrayType(StringType))))
    val good = out.filter(col("error").isNull)
      .select(col("key").as("space_id"),
        from_json(col("value"), depsSchema).as("d"))
      .select(col("space_id"),
        coalesce(col("d.models"), array()).as("models"),
        coalesce(col("d.datasets"), array()).as("datasets"))
    val quarantine = out.filter(col("error").isNotNull)
      .select(col("key").as("space_id"), col("attempts"), col("error"))
    (good, quarantine)
  }

  def spaceDeps(spark: SparkSession, listed: DataFrame): DataFrame =
    spaceDepsWithQuarantine(spark, listed)._1

  /** S10: the token-validation probe the reference runs before
    * crawling (databaseImport.py's hub auth check; huggingface_hub
    * `whoami`): GET /api/whoami-v2 with the bearer token.
    * Right(username) on 200; Left(status) on 401/403/…; IO failures
    * propagate (they mean "can't reach the Hub", not "bad token"). */
  def whoami(): Either[Int, String] =
    try {
      val json = get(s"$base/api/whoami-v2")
      Right(Option(new ObjectMapper().readTree(json).get("name"))
        .filterNot(_.isNull).map(_.asText()).getOrElse(""))
    } catch {
      case ResilientFetch.HttpStatusException(status, _) => Left(status)
    }
}
