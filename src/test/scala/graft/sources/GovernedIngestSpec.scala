package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase
import graft.hfc.Governance
import graft.sources.GitCloneSource.CloneTask
import org.apache.spark.sql.functions._

import java.io.File
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

/** The reference's resource-governance loop (F2 blocklist, F3
  * threshold skip with observable counters, F8 quarantine) composed
  * over the LIVE seams: listing → blocklist → clone (with a dead
  * remote) → commit-count probe → threshold skip → walk. The walk only
  * ever touches repos that survived every gate — the
  * databaseImport.py:373-382,624 flow as governed dataflow. */
class GovernedIngestSpec extends SparkTestBase {
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

  /** a repo with `n` single-file commits */
  private def repoWithCommits(n: Int): File = {
    val dir = Files.createTempDirectory("graft-gov-src").toFile
    runGit(dir, "init", "-q", "-b", "main")
    (1 to n).foreach { i =>
      Files.write(Paths.get(dir.toString, "f.txt"), s"v$i\n".getBytes)
      runGit(dir, "add", "f.txt"); runGit(dir, "commit", "-q", "-m", s"c$i")
    }
    dir
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/api/models", (x: HttpExchange) => {
      if (x.getRequestURI.getPath == "/api/models")
        respond(x, 200,
          """[{"id":"o/small","author":"o","sha":"s1","lastModified":"2024-04-01T00:00:00Z","private":false,"gated":false,"likes":1},
            | {"id":"o/huge","author":"o","sha":"s2","lastModified":"2024-03-01T00:00:00Z","private":false,"gated":false,"likes":2},
            | {"id":"o/blocked","author":"o","sha":"s3","lastModified":"2024-02-01T00:00:00Z","private":false,"gated":false,"likes":3},
            | {"id":"o/dead","author":"o","sha":"s4","lastModified":"2024-01-01T00:00:00Z","private":false,"gated":false,"likes":4}]""".stripMargin)
      else respond(x, 404, "no route")
    })
    s.start(); s
  }

  override def afterAll(): Unit = { try server.stop(0) finally super.afterAll() }

  test("F2 + F3 + F8 over live listing, clone, and commit-count probe") {
    val small = repoWithCommits(2)
    val huge = repoWithCommits(6) // over the max_num_commits threshold below
    val work = Files.createTempDirectory("graft-gov-work").toString
    try {
      val src = new HttpHfhSource(s"http://127.0.0.1:${server.getAddress.getPort}")
      val listed = src.listing(spark, "model", limit = 10)
      assert(listed.count() == 4)

      // F2: config-driven blocklist drops the pathological repo up front
      val allowed = Governance.blocklistFilter(listed, "repo_id", Seq("models/o/blocked"))
      assert(allowed.count() == 3)

      // clone stage: one remote is dead → F8-style quarantine row
      val urls = Map("o/small" -> s"file://${small.getAbsolutePath}",
                     "o/huge" -> s"file://${huge.getAbsolutePath}",
                     "o/dead" -> "file:///no/such/remote")
      val tasks = allowed.select($"repo_id", $"name").as[(String, String)].collect()
        .map { case (rid, n) => CloneTask(rid, n, urls(n)) }.toSeq.toDS()
      val results = GitCloneSource.cloneAll(tasks, work, maxAttempts = 2)
      val (cloned, deadQ) = Governance.quarantine(results.toDF(), col("error").isNull)
      assert(deadQ.select("repo_id").as[String].collect().toSeq == Seq("models/o/dead"))

      // S8 probe on the CLONES + F3 threshold skip with observable tallies
      val probed = GitCloneSource.refs(cloned.as[GitCloneSource.CloneResult])
        .collect().map(r => (r.repo_id, r.repo_name, r.path,
          GitHistorySource.commitCount(r.path)))
        .toSeq.toDF("repo_id", "repo_name", "path", "n_commits")
      val kept = Governance.thresholdSkip(probed, col("n_commits") <= 3)
      val keptRows = kept.collect() // materializes the observation too
      assert(keptRows.map(_.getString(0)).toSeq == Seq("models/o/small"))

      // the walk runs ONLY on survivors — huge was never history-walked
      val refs = kept.select($"repo_id", $"repo_name", $"path")
        .as[GitHistorySource.RepoRef]
      val commits = GitHistorySource.commits(refs).collect()
      assert(commits.length == 2 && commits.forall(_.repo_id == "models/o/small"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(small)
      org.apache.commons.io.FileUtils.deleteDirectory(huge)
      org.apache.commons.io.FileUtils.deleteDirectory(new File(work))
    }
  }
}
