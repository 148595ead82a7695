package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** Integration drive of the LIVE Hub connector against an in-process
  * JDK HttpServer on localhost (zero egress): listing push-down,
  * camelCase→bronze reshaping into Normalize's contract, discussion
  * pagination, 429-retry, and 404-quarantine — the full production
  * path minus only the real hostname. */
class HttpHfhSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val m2Hits = new AtomicInteger(0)

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) { val os = x.getResponseBody; os.write(b); os.close() }
    x.close()
  }

  private def qp(x: HttpExchange, name: String): Option[String] =
    Option(x.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == name => v }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/api/models", (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      path match {
        case "/api/models" =>
          respond(x, 200,
            """[
              |{"id":"o/m1","author":"o","sha":"s1","lastModified":"2024-03-01T12:00:00.000Z",
              | "private":false,"cardData":{"license":"mit"},"gated":false,"disabled":false,"likes":7},
              |{"id":"o/m2","author":"o","sha":"s2","lastModified":"2024-02-01T00:00:00.000Z",
              | "private":false,"gated":"manual","disabled":false,"likes":2},
              |{"id":"o/m3","author":"o","sha":"s3","lastModified":"2024-01-01T00:00:00.000Z",
              | "private":true,"gated":"auto","disabled":true,"likes":0}
              |]""".stripMargin)
        case "/api/models/o/m1/discussions" =>
          qp(x, "p").getOrElse("0") match {
            case "0" => respond(x, 200,
              """{"discussions":[
                |{"num":1,"title":"bug","status":"open","createdAt":"2024-02-01T00:00:00.000Z",
                | "author":{"name":"alice"},"isPullRequest":false},
                |{"num":2,"title":"pr","status":"merged","createdAt":"2024-02-02T00:00:00.000Z",
                | "author":{"name":"bob"},"isPullRequest":true}]}""".stripMargin)
            case "1" => respond(x, 200,
              """{"discussions":[
                |{"num":3,"title":"q","status":"closed","createdAt":"2024-02-03T00:00:00.000Z",
                | "author":{"name":"carol"},"isPullRequest":false}]}""".stripMargin)
            case _ => respond(x, 200, """{"discussions":[]}""")
          }
        case "/api/models/o/m1" =>
          respond(x, 200,
            """{"siblings":[
              |{"rfilename":"README.md","size":10,"blobId":"b1"},
              |{"rfilename":"model.bin","size":5000000,"blobId":"b2",
              | "lfs":{"size":5000000,"sha256":"abc123","pointerSize":134}}]}""".stripMargin)
        case "/api/models/o/m2/discussions" =>
          respond(x, 200, """{"discussions":[]}""")
        case "/api/models/o/m2" =>
          // two transient 429s, then success: pins the retry path
          if (m2Hits.incrementAndGet() <= 2) respond(x, 429, "rate limited")
          else respond(x, 200, """{"siblings":[]}""")
        case p if p.startsWith("/api/models/o/m3") =>
          respond(x, 404, "not found")
        case _ => respond(x, 404, "no route")
      }
    })
    s.createContext("/api/spaces", (x: HttpExchange) => {
      x.getRequestURI.getPath match {
        case "/api/spaces" =>
          respond(x, 200,
            """[{"id":"o/s1","author":"o","sha":"sp1","lastModified":"2024-04-01T00:00:00Z",
              |  "private":false,"gated":false,"disabled":false,"likes":5}]""".stripMargin)
        case "/api/spaces/o/s1/runtime" =>
          respond(x, 200,
            """{"stage":"RUNNING","hardware":{"current":"cpu-basic","requested":"cpu-upgrade"},
              | "storage":"small"}""".stripMargin)
        case "/api/spaces/o/s1" =>
          respond(x, 200,
            """{"id":"o/s1","models":["o/m1","other/m7"],"datasets":["o/d1"]}""")
        case _ => respond(x, 404, "no route")
      }
    })
    s.createContext("/api/whoami-v2", (x: HttpExchange) => {
      Option(x.getRequestHeaders.getFirst("Authorization")) match {
        case Some("Bearer hf_valid") => respond(x, 200, """{"name":"tester"}""")
        case _ => respond(x, 401, "unauthorized")
      }
    })
    s.start(); s
  }

  private lazy val src = new HttpHfhSource(
    s"http://127.0.0.1:${server.getAddress.getPort}",
    policy = ResilientFetch.Policy(maxAttempts = 4, baseDelayMs = 1, perPartitionRps = 1e6))

  override def afterAll(): Unit = { try server.stop(0) finally super.afterAll() }

  test("listing: pushed sort/limit shape, prefixed repo_id, raw gated/cardData carried") {
    val l = src.listing(spark, "model", limit = 3)
    val rows = l.select("repo_id", "name", "author", "gated", "private", "likes")
      .as[(String, String, String, String, Boolean, Long)].collect()
    assert(rows.map(_._1).toSeq ==
      Seq("models/o/m1", "models/o/m2", "models/o/m3")) // newest first
    assert(rows(0)._4 == "false" && rows(1)._4 == "manual") // raw gated for P10
    val card = l.filter($"name" === "o/m1").select("card_data").as[String].head()
    assert(card.contains("\"license\":\"mit\""))
    assert(l.schema("last_modified").dataType.typeName == "timestamp")
  }

  test("files: bronze siblings reshape feeds Normalize.repoFiles; 429 retried; 404 quarantined") {
    m2Hits.set(0)
    val listed = src.listing(spark, "model", limit = 3)
    val (good, quarantine) = src.filesWithQuarantine(spark, listed)
    val byRepo = good.collect().map(r => r.getString(0) -> r).toMap
    assert(byRepo.keySet == Set("models/o/m1", "models/o/m2")) // m3 not in good
    // m2 survived two 429s
    assert(m2Hits.get() == 3)
    // quarantine carries the 404 with one attempt (fail-fast class)
    val q = quarantine.as[(String, Int, String)].collect()
    assert(q.map(_._1).toSeq == Seq("models/o/m3"))
    assert(q.head._2 == 1 && q.head._3.contains("404"))
    // the reshaped bronze drives the real silver transform: P1 keys,
    // P5 LFS flatten — live-API camelCase never leaks downstream
    val files = graft.hfc.Normalize.repoFiles(good)
    val f = files.orderBy($"rfilename").collect()
    assert(f.length == 2) // m2's empty siblings filtered (F4)
    val bin = files.filter($"rfilename" === "model.bin").head()
    assert(bin.getAs[String]("blob_id") == "b2")
    assert(bin.getAs[Long]("lfs_size") == 5000000L)
    assert(bin.getAs[String]("lfs_sha") == "abc123")
    val readme = files.filter($"rfilename" === "README.md").head()
    assert(readme.isNullAt(readme.fieldIndex("lfs_size"))) // non-LFS → null struct
  }

  test("whoami: S10 token validation — valid token names the user, bad token is Left(401)") {
    val port = server.getAddress.getPort
    val authed = new HttpHfhSource(s"http://127.0.0.1:$port", token = Some("hf_valid"))
    assert(authed.whoami() == Right("tester"))
    val anon = new HttpHfhSource(s"http://127.0.0.1:$port")
    assert(anon.whoami() == Left(401))
    val badTok = new HttpHfhSource(s"http://127.0.0.1:$port", token = Some("hf_stale"))
    assert(badTok.whoami() == Left(401))
  }

  test("live listing feeds Normalize.repositories: P4 prefix + P10 gated normalization end-to-end") {
    val models = src.listing(spark, "model", limit = 3)
    val empty = models.filter(lit(false))
    val silver = graft.hfc.Normalize.repositories(models, empty, empty)
    val byName = silver.collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(silver.count() == 3)
    // P4: canonical plural-prefixed id derived from (type, name)
    assert(byName("o/m1").getAs[String]("id") == "models/o/m1")
    // P10: "manual"/"auto" → NULL; the API's boolean false ("false") survives
    assert(byName("o/m2").getAs[String]("gated") == null)
    assert(byName("o/m3").getAs[String]("gated") == null)
    assert(byName("o/m1").getAs[String]("gated") == "false")
  }

  test("space runtime (S6): raw fetch parses through HfcViews.withRuntimeView") {
    val listed = src.listing(spark, "space", limit = 1)
    assert(listed.select("repo_id").as[String].head() == "spaces/o/s1")
    val (good, quarantine) = src.spaceRuntimesWithQuarantine(spark, listed)
    assert(quarantine.count() == 0)
    val parsed = graft.hfc.HfcViews.withRuntimeView(good)
      .select($"repo_id", $"runtime_parsed.stage", $"runtime_parsed.hardware.requested",
              $"runtime_parsed.storage")
      .as[(String, String, String, String)].head()
    assert(parsed == (("spaces/o/s1", "RUNNING", "cpu-upgrade", "small")))
  }

  test("space deps (J4): detail arrays feed Normalize.spaceDeps with P4 prefixes") {
    val listed = src.listing(spark, "space", limit = 1)
    val (good, quarantine) = src.spaceDepsWithQuarantine(spark, listed)
    assert(quarantine.count() == 0)
    val (m, d) = graft.hfc.Normalize.spaceDeps(good)
    assert(m.as[(String, String)].collect().toSet ==
      Set(("models/o/m1", "spaces/o/s1"), ("models/other/m7", "spaces/o/s1")))
    assert(d.as[(String, String)].collect().toSet ==
      Set(("datasets/o/d1", "spaces/o/s1")))
  }

  test("discussions: pagination concatenated, fields parsed, empty repos absent") {
    val listed = src.listing(spark, "model", limit = 3).filter($"name" =!= "o/m3")
    val (good, quarantine) = src.discussionsWithQuarantine(spark, listed)
    assert(quarantine.count() == 0)
    val d = good.orderBy($"num").collect()
    assert(d.map(_.getAs[Long]("num")).toSeq == Seq(1L, 2L, 3L)) // pages 0+1 walked
    assert(d.forall(_.getString(0) == "models/o/m1"))            // m2 has none
    assert(d(1).getAs[Boolean]("is_pull_request"))
    assert(d(2).getAs[String]("author") == "carol")
    assert(d.forall(r => r.getAs[java.sql.Timestamp]("created_at") != null))
    assert(d.head.getAs[String]("full_data").contains("\"title\":\"bug\""))
  }
}
