package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress

/** Replays the checked-in Hub API cassette fixtures
  * (src/test/resources/fixtures/hub — full-shape payloads authored
  * offline from the PUBLIC API surface, see the fixtures README)
  * through the same localhost harness HttpHfhSourceSpec uses. Two
  * things are under test that the hand-minimal payloads could not pin:
  *
  *  1. the parser tolerates (and correctly ignores) the full field
  *     census a real response carries — trendingScore, widgetData,
  *     safetensors, the discussions envelope's count/start fields,
  *     nested author objects with nulls;
  *  2. the connector sends the LOAD-BEARING query params — full=true/
  *     cardData=true/config=true on listings and blobs=true on repo
  *     detail — without which the real Hub omits sha/lastModified/
  *     sibling metadata entirely (the reference's
  *     list_models(full=True, ...) and repo_info(files_metadata=True),
  *     databaseImport.py:597,299). The harness 404s when they are
  *     missing, so a regression fails loudly here instead of returning
  *     silently-NULL columns on first real egress.
  */
class HubCassetteSpec extends SparkTestBase {
  import spark.implicits._

  private def cassette(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/hub/$name")
    require(in != null, s"missing cassette fixture $name")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.getResponseHeaders.add("Content-Type", "application/json")
    x.sendResponseHeaders(status, b.length.toLong)
    try x.getResponseBody.write(b) finally x.getResponseBody.close()
  }

  private def query(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def route(x: HttpExchange): Unit = {
      val path = x.getRequestURI.getPath
      val q = query(x)
      path match {
        case "/api/models" =>
          // the real Hub omits sha/lastModified/cardData without these
          if (q.get("full").contains("true") && q.get("cardData").contains("true") &&
              q.get("config").contains("true"))
            respond(x, 200, cassette("models_list.json"))
          else respond(x, 404, """{"error":"harness: missing full/cardData/config params"}""")
        case "/api/datasets" =>
          if (q.get("full").contains("true")) respond(x, 200, cassette("datasets_list.json"))
          else respond(x, 404, """{"error":"harness: missing full param"}""")
        case "/api/spaces" =>
          if (q.get("full").contains("true")) respond(x, 200, cassette("spaces_list.json"))
          else respond(x, 404, """{"error":"harness: missing full param"}""")
        case "/api/models/openai-community/gpt2" =>
          // sibling sizes/blobIds exist only with blobs=true
          if (q.get("blobs").contains("true")) respond(x, 200, cassette("model_detail_blobs.json"))
          else respond(x, 404, """{"error":"harness: missing blobs param"}""")
        case "/api/models/openai-community/gpt2/discussions" =>
          q.getOrElse("p", "0") match {
            case "0" => respond(x, 200, cassette("discussions_page0.json"))
            case "1" => respond(x, 200, cassette("discussions_page1.json"))
            case _   => respond(x, 200, cassette("discussions_empty.json"))
          }
        case p if p.startsWith("/api/models/example-org/") && p.endsWith("/discussions") =>
          respond(x, 200, cassette("discussions_empty.json"))
        case p if p.startsWith("/api/models/example-org/") =>
          respond(x, 200, """{"siblings":[]}""")
        case "/api/spaces/ysharma/ChatGPT4/runtime" =>
          respond(x, 200, cassette("space_runtime.json"))
        case "/api/spaces/ysharma/ChatGPT4" =>
          respond(x, 200, cassette("space_detail.json"))
        case "/api/spaces/example-org/paused-demo" =>
          respond(x, 200, """{"id":"example-org/paused-demo","models":[],"datasets":[]}""")
        case "/api/whoami-v2" =>
          Option(x.getRequestHeaders.getFirst("Authorization")) match {
            case Some("Bearer hf_valid") => respond(x, 200, cassette("whoami.json"))
            case _ => respond(x, 401, """{"error":"Invalid credentials in Authorization header"}""")
          }
        case _ => respond(x, 404, s"""{"error":"no route: $path"}""")
      }
    }
    s.createContext("/api", (x: HttpExchange) => route(x))
    s.start(); s
  }

  private lazy val src = new HttpHfhSource(
    s"http://127.0.0.1:${server.getAddress.getPort}",
    policy = ResilientFetch.Policy(maxAttempts = 2, baseDelayMs = 1, perPartitionRps = 1e6))

  override def afterAll(): Unit = { try server.stop(0) finally super.afterAll() }

  test("model listing parses the full-shape payload: gated tri-state, raw cardData, null sha") {
    val l = src.listing(spark, "model", limit = 3)
      .select($"name", $"author", $"sha", $"gated", $"private", $"disabled", $"likes", $"repo_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getBoolean(5), r.getLong(6), r.getString(7)))
    assert(l.length == 3)
    // newest-first by lastModified
    assert(l.map(_._1).toSeq == Seq(
      "openai-community/gpt2", "example-org/llama-7b-gated", "example-org/internal-scratch"))
    assert(l(0) == (("openai-community/gpt2", "openai-community",
      "607a30d783dfa663caf39e06633721c8d4cfcd7e", "false", false, false, 2604L,
      "models/openai-community/gpt2")))
    // gated tri-state survives as raw strings
    assert(l(1)._4 == "manual" && l(2)._4 == "auto")
    // null sha stays null, private/disabled parse
    assert(l(2)._3 == null && l(2)._5 && l(2)._6)
    // raw cardData JSON is carried for columnar parsing downstream
    val card = src.listing(spark, "model", limit = 3)
      .filter($"name" === "openai-community/gpt2").select($"card_data").head().getString(0)
    assert(card.contains("\"license\":\"mit\""))
  }

  test("dataset listing carries paperswithcode-bearing cardData") {
    val l = src.listing(spark, "dataset", limit = 2)
    assert(l.count() == 2)
    val card = l.filter($"name" === "stanfordnlp/imdb").select($"card_data").head().getString(0)
    assert(card.contains("paperswithcode_id"))
    val gated = l.select($"name", $"gated").as[(String, String)].collect().toMap
    assert(gated("example-org/web-crawl-gated") == "auto")
  }

  test("repo detail with blobs=true: plain + LFS siblings in the bronze shape") {
    val listed = Seq("models/openai-community/gpt2").toDF("repo_id")
    val files = src.files(spark, listed)
      .select($"repo_id", explode($"siblings").as("f"))
      .select($"f.rfilename", $"f.size", $"f.blob_id",
        $"f.lfs.size".as("lfs_size"), $"f.lfs.sha256".as("lfs_sha"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(files.length == 4)
    val lfs = src.files(spark, listed)
      .select(explode($"siblings").as("f")).filter($"f.lfs.sha256".isNotNull)
      .select($"f.rfilename", $"f.lfs.size", $"f.lfs.pointer_size")
      .as[(String, Long, Long)].collect()
    assert(lfs.toSeq == Seq(("model.safetensors", 548105171L, 135L)))
  }

  test("discussions: envelope fields ignored, pages concatenated, author nulls tolerated") {
    val listed = Seq("models/openai-community/gpt2").toDF("repo_id")
    val d = src.discussions(spark, listed)
      .select($"num", $"title", $"status", $"author", $"is_pull_request")
      .orderBy($"num")
      .as[(Long, String, String, String, Boolean)].collect()
    assert(d.map(_._1).toSeq == Seq(40L, 41L, 42L))
    assert(d(0)._4 == "deleted-user" && d(0)._3 == "merged" && d(0)._5)
    assert(d(2) == ((42L, "Update model card with eval results", "open", "julien-c", true)))
    // full_data keeps the complete discussion object for the raw plane
    val full = src.discussions(spark, listed).filter($"num" === 42)
      .select($"full_data").head().getString(0)
    assert(full.contains("numComments") && full.contains("isHf"))
  }

  test("space listing + runtime + deps parse the full payloads") {
    val l = src.listing(spark, "space", limit = 2)
    assert(l.count() == 2)
    val listed = Seq("spaces/ysharma/ChatGPT4").toDF("repo_id")
    val rt = src.spaceRuntimes(spark, listed).select($"runtime_raw").head().getString(0)
    assert(rt.contains("\"stage\": \"RUNNING\"") || rt.contains("\"stage\":\"RUNNING\""))
    val deps = src.spaceDeps(spark, listed)
      .select($"space_id", $"models", $"datasets")
      .as[(String, Seq[String], Seq[String])].head()
    assert(deps._2 == Seq("openai-community/gpt2", "example-org/llama-7b-gated"))
    assert(deps._3 == Seq("stanfordnlp/imdb"))
  }

  test("whoami parses the full account payload; bad token yields Left(401)") {
    val ok = new HttpHfhSource(s"http://127.0.0.1:${server.getAddress.getPort}",
      token = Some("hf_valid"))
    assert(ok.whoami() == Right("ci-bot"))
    val bad = new HttpHfhSource(s"http://127.0.0.1:${server.getAddress.getPort}",
      token = Some("hf_stale"))
    assert(bad.whoami() == Left(401))
  }
}
