package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase
import graft.hfc.{HfcMetrics, Normalize}
import graft.sources.GitCloneSource.CloneTask
import org.apache.spark.sql.functions._

import java.io.File
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

/** The reference binary end-to-end over the LIVE seams: HTTP listing →
  * silver repository; HTTP siblings → repo_file; `git clone --bare` →
  * history walk → modified_file; metrics on the result. The only
  * differences from production are the hostname (localhost) and the
  * clone transport (file://) — every stage runs the real code. */
class LivePipelineE2ESpec extends SparkTestBase {
  import spark.implicits._

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) { val os = x.getResponseBody; os.write(b); os.close() }
    x.close()
  }

  private def runGit(dir: File, cmd: String*): Unit = {
    val pb = scala.sys.process.Process(
      Seq("git", "-c", "user.name=t", "-c", "user.email=t@l",
          "-c", "commit.gpgsign=false") ++ cmd, dir)
    assert(pb.! == 0, s"git ${cmd.mkString(" ")} failed")
  }

  private def sourceRepo(files: (String, String)*): File = {
    val dir = Files.createTempDirectory("graft-live-src").toFile
    runGit(dir, "init", "-q", "-b", "main")
    files.foreach { case (name, text) =>
      Files.write(Paths.get(dir.toString, name), text.getBytes)
      runGit(dir, "add", name); runGit(dir, "commit", "-q", "-m", s"add $name")
    }
    dir
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/api/models", (x: HttpExchange) => {
      x.getRequestURI.getPath match {
        case "/api/models" =>
          respond(x, 200,
            """[{"id":"orgA/m1","author":"orgA","sha":"h1","lastModified":"2024-03-01T00:00:00Z",
              |  "private":false,"gated":false,"disabled":false,"likes":4},
              | {"id":"orgA/m2","author":"orgA","sha":"h2","lastModified":"2024-02-01T00:00:00Z",
              |  "private":false,"gated":"manual","disabled":false,"likes":1}]""".stripMargin)
        case "/api/models/orgA/m1" =>
          respond(x, 200,
            """{"siblings":[{"rfilename":"README.md","size":5,"blobId":"b1"},
              |  {"rfilename":"model.bin","size":9,"blobId":"b2",
              |   "lfs":{"size":9,"sha256":"s","pointerSize":134}}]}""".stripMargin)
        case "/api/models/orgA/m2" =>
          respond(x, 200, """{"siblings":[{"rfilename":"README.md","size":3,"blobId":"b3"}]}""")
        case p if p.endsWith("/discussions") =>
          respond(x, 200, """{"discussions":[]}""")
        case _ => respond(x, 404, "no route")
      }
    })
    s.start(); s
  }

  override def afterAll(): Unit = { try server.stop(0) finally super.afterAll() }

  test("listing → clone → walk → normalize → metrics, every stage live") {
    val g1 = sourceRepo("README.md" -> "m1 readme\n", "model.bin" -> "bits\n")
    val g2 = sourceRepo("README.md" -> "m2 readme\n")
    val work = Files.createTempDirectory("graft-live-work").toString
    try {
      val src = new HttpHfhSource(s"http://127.0.0.1:${server.getAddress.getPort}")

      // S1: listing → U1 silver repository
      val listed = src.listing(spark, "model", limit = 10)
      val empty = listed.filter(lit(false))
      val repository = Normalize.repositories(listed, empty, empty)
      assert(repository.select("id").as[String].collect().toSet ==
        Set("models/orgA/m1", "models/orgA/m2"))

      // S4: live siblings → P1/P5 repo_file
      val repoFile = Normalize.repoFiles(src.files(spark, listed))
      assert(repoFile.count() == 3)

      // S7 behind E1 stage-0: clone url per listed repo (production:
      // the hub URL; here the file:// fixture), bare clone, real walk
      val urls = Map("orgA/m1" -> s"file://${g1.getAbsolutePath}",
                     "orgA/m2" -> s"file://${g2.getAbsolutePath}")
      val tasks = listed.select($"repo_id", $"name").as[(String, String)].collect()
        .map { case (rid, name) => CloneTask(rid, name, urls(name)) }.toSeq.toDS()
      val cloned = GitCloneSource.cloneAll(tasks, work)
      assert(cloned.filter(_.error != null).count() == 0)
      val refs = GitCloneSource.refs(cloned)
      val commits = GitHistorySource.commitsTable(spark, refs)
      assert(commits.count() == 3) // 2 commits in m1, 1 in m2

      // J1: deltas resolve against the LIVE repo_file keys
      val deltasRaw = GitHistorySource.deltas(refs, withContent = true).toDF()
      val modifiedFile = Normalize.modifiedFiles(deltasRaw, repoFile)
      assert(modifiedFile.count() == 3) // one ADD per committed file
      // every walked filename resolves its FK against the API-listed files
      assert(modifiedFile.filter(col("repo_file_id").isNull).count() == 0)

      // E3 metrics over live-built silver
      val m1 = HfcMetrics.topOrgsByModels(repository).as[(String, Long)].collect().toSeq
      assert(m1 == Seq(("orgA", 2L)))
      val hist = HfcMetrics.filesPerRepoHistogram(repoFile).collect()
      assert(hist.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(g1)
      org.apache.commons.io.FileUtils.deleteDirectory(g2)
      org.apache.commons.io.FileUtils.deleteDirectory(new File(work))
    }
  }
}
