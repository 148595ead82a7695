package graft.sources

import graft.SparkTestBase
import graft.sources.GitHistorySource.RepoRef

import java.io.File
import java.nio.file.{Files, Paths}

/** The DataSource V2 face must return exactly what the Dataset API
  * returns — same rows, driven through Spark's connector planning
  * (one InputPartition per repo) instead of a flatMap. */
class GitHistoryDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def run(dir: File, env: Seq[(String, String)], cmd: String*): Unit = {
    val pb = scala.sys.process.Process(
      Seq("git", "-c", "user.name=tester", "-c", "user.email=t@local",
          "-c", "commit.gpgsign=false") ++ cmd,
      dir, env: _*)
    assert(pb.! == 0, s"git ${cmd.mkString(" ")} failed")
  }

  private def write(dir: File, name: String, text: String): Unit =
    Files.write(Paths.get(dir.toString, name), text.getBytes)

  private def scriptRepo(tag: String): File = {
    val dir = Files.createTempDirectory(s"graft-dsv2-$tag").toFile
    def dated(n: Int) = Seq(
      "GIT_AUTHOR_DATE" -> s"17000001${n}0 +0000",
      "GIT_COMMITTER_DATE" -> s"17000001${n}5 +0000")
    run(dir, Nil, "init", "-q", "-b", "main")
    write(dir, "a.txt", s"$tag l1\nl2\n")
    run(dir, Nil, "add", "a.txt"); run(dir, dated(1), "commit", "-q", "-m", "c1")
    write(dir, "a.txt", s"$tag l1\nl2x\nl3\n")
    run(dir, Nil, "add", "-A"); run(dir, dated(2), "commit", "-q", "-m", "c2")
    dir
  }

  test("format(git-history) commits equal the Dataset API, one partition per repo") {
    val (r1, r2) = (scriptRepo("r1"), scriptRepo("r2"))
    try {
      val df = spark.read.format("git-history")
        .option("repos", s"$r1,$r2")
        .load()
      assert(df.rdd.getNumPartitions == 2, "expected one InputPartition per repo")
      val viaDs = GitHistorySource.commits(Seq(
          RepoRef(r1.getName, r1.getName, r1.toString),
          RepoRef(r2.getName, r2.getName, r2.toString)).toDS())
        .collect().map(c => (c.sha, c.repo_id, c.author_epoch, c.insertions)).toSet
      val viaFmt = df.select("sha", "repo_id", "author_epoch", "insertions")
        .as[(String, String, Long, Int)].collect().toSet
      assert(viaFmt == viaDs)
      assert(viaFmt.size == 4)
    } finally {
      Seq(r1, r2).foreach(d => scala.reflect.io.Directory(d).deleteRecursively())
    }
  }

  test("format(git-history) deltas honor withContent at the subprocess level") {
    val r = scriptRepo("rc")
    try {
      val bare = spark.read.format("git-history")
        .option("repos", r.toString).option("table", "deltas").load()
      val withC = spark.read.format("git-history")
        .option("repos", r.toString).option("table", "deltas")
        .option("withContent", "true").load()
      val bareRows = bare.collect()
      assert(bareRows.length == 2) // ADD a (c1), MODIFY a (c2)
      assert(bareRows.forall(_.isNullAt(bareRows.head.fieldIndex("diff"))))
      val contentRows = withC.collect()
      val diffs = contentRows.map(r0 => r0.getAs[String]("diff"))
      assert(diffs.forall(d => d != null && d.contains("@@")))
      val nlocs = contentRows.map(r0 => r0.getAs[Int]("nloc"))
      assert(nlocs.sorted.toSeq == Seq(2, 3)) // post-images: 2 lines, 3 lines
    } finally {
      scala.reflect.io.Directory(r).deleteRecursively()
    }
  }

  test("unknown table option fails loudly") {
    intercept[IllegalArgumentException] {
      spark.read.format("git-history")
        .option("repos", "/tmp").option("table", "blobs").load()
    }
  }
}
