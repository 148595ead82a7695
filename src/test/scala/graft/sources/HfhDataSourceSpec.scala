package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase

import java.net.InetSocketAddress

/** `spark.read.format("hfh")` against an in-process localhost server:
  * the V2 listing scan (one call, pushed limit) and the partitioned
  * N+1 files fan-out with error-row quarantine. */
class HfhDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) { val os = x.getResponseBody; os.write(b); os.close() }
    x.close()
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/api/models", (x: HttpExchange) => {
      x.getRequestURI.getPath match {
        case "/api/models" =>
          // assert the pushed params reached the API
          val q = Option(x.getRequestURI.getQuery).getOrElse("")
          assert(q.contains("sort=lastModified") && q.contains("limit=2"), q)
          respond(x, 200,
            """[{"id":"o/a","author":"o","sha":"s1","lastModified":"2024-03-01T00:00:00Z",
              |  "private":false,"gated":false,"likes":3},
              | {"id":"o/b","author":"o","sha":"s2","lastModified":"2024-02-01T00:00:00Z",
              |  "private":false,"gated":"manual","likes":1}]""".stripMargin)
        case "/api/models/o/a" =>
          respond(x, 200,
            """{"siblings":[{"rfilename":"README.md","size":10,"blobId":"b1"},
              |  {"rfilename":"w.bin","size":99,"blobId":"b2",
              |   "lfs":{"size":99,"sha256":"h","pointerSize":134}}]}""".stripMargin)
        case "/api/models/o/a/discussions" =>
          if (Option(x.getRequestURI.getQuery).exists(_.contains("p=0")))
            respond(x, 200,
              """{"discussions":[{"num":1,"title":"t","status":"open",
                |  "createdAt":"2024-02-01T00:00:00Z","author":{"name":"zed"},
                |  "isPullRequest":false}]}""".stripMargin)
          else respond(x, 200, """{"discussions":[]}""")
        case "/api/models/o/b" => respond(x, 404, "gone")
        case p if p.startsWith("/api/models/o/b/") => respond(x, 404, "gone")
        case _ => respond(x, 404, "no route")
      }
    })
    s.start(); s
  }

  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def afterAll(): Unit = { try server.stop(0) finally super.afterAll() }

  test("listing table: one pushed API call, bronze columns, prefixed repo_id") {
    val df = spark.read.format("hfh")
      .option("baseUrl", base).option("table", "listing")
      .option("type", "model").option("limit", "2").load()
    val rows = df.select("repo_id", "gated", "likes")
      .as[(String, String, Long)].collect()
    assert(rows.toSeq == Seq(("models/o/a", "false", 3L), ("models/o/b", "manual", 1L)))
    assert(df.schema("last_modified").dataType.typeName == "timestamp")
    assert(df.rdd.getNumPartitions == 1) // the listing IS one call
  }

  test("files table: partitioned fan-out, LFS flatten, quarantine as error rows") {
    val df = spark.read.format("hfh")
      .option("baseUrl", base).option("table", "files")
      .option("repos", "models/o/a,models/o/b")
      .option("reposPerPartition", "1")
      .option("maxAttempts", "2").option("perPartitionRps", "1000000").load()
    assert(df.rdd.getNumPartitions == 2) // one partition per repo group
    val good = df.filter($"fetch_error".isNull).orderBy($"rfilename").collect()
    assert(good.map(_.getAs[String]("rfilename")).toSeq == Seq("README.md", "w.bin"))
    val bin = good(1)
    assert(bin.getAs[Long]("lfs_size") == 99L && bin.getAs[Long]("lfs_pointer_size") == 134L)
    assert(good(0).isNullAt(good(0).fieldIndex("lfs_size")))
    val bad = df.filter($"fetch_error".isNotNull).collect()
    assert(bad.length == 1 && bad(0).getAs[String]("repo_id") == "models/o/b")
    assert(bad(0).getAs[String]("fetch_error").contains("404"))
  }

  test("discussions table: paged per-repo walk, quarantine rows for dead repos") {
    val df = spark.read.format("hfh")
      .option("baseUrl", base).option("table", "discussions")
      .option("repos", "models/o/a,models/o/b")
      .option("maxAttempts", "2").option("perPartitionRps", "1000000").load()
    val rows = df.collect()
    val good = rows.filter(_.getAs[String]("fetch_error") == null)
    assert(good.length == 1)
    assert(good(0).getAs[String]("repo_id") == "models/o/a")
    assert(good(0).getAs[Long]("num") == 1L && good(0).getAs[String]("author") == "zed")
    assert(good(0).getAs[String]("full_data").contains("\"title\":\"t\""))
    val bad = rows.filter(_.getAs[String]("fetch_error") != null)
    assert(bad.map(_.getAs[String]("repo_id")).toSeq == Seq("models/o/b"))
  }

  test("unknown table name fails loudly at schema inference") {
    val e = intercept[Exception] {
      spark.read.format("hfh").option("baseUrl", base)
        .option("table", "nope").load()
    }
    assert(e.getMessage.contains("listing") || e.getMessage.contains("nope"))
  }
}
