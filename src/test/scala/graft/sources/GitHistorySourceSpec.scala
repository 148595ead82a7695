package graft.sources

import graft.SparkTestBase
import graft.sources.GitHistorySource.RepoRef

import java.io.File
import java.nio.file.{Files, Paths}

/** Walks a scripted REAL git repository (init + add/modify/rename/
  * delete commits with pinned dates) through the executor-side history
  * source and checks the bronze rows feed Normalize/CommitGraph — the
  * E1 ingest story end to end, minus only the network clone. */
class GitHistorySourceSpec extends SparkTestBase {
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

  /** 4 commits: ADD a; ADD b + MODIFY a; RENAME a→c; DELETE b */
  private def scriptRepo(): File = {
    val dir = Files.createTempDirectory("graft-git").toFile
    def dated(n: Int) = Seq(
      "GIT_AUTHOR_DATE" -> s"17000000${n}0 +0230",
      "GIT_COMMITTER_DATE" -> s"17000000${n}5 -0100")
    run(dir, Nil, "init", "-q", "-b", "main")
    write(dir, "a.txt", "l1\nl2\n")
    run(dir, Nil, "add", "a.txt"); run(dir, dated(1), "commit", "-q", "-m", "c1")
    write(dir, "a.txt", "l1\nl2-changed\nl3\n"); write(dir, "b.txt", "b1\n")
    run(dir, Nil, "add", "-A"); run(dir, dated(2), "commit", "-q", "-m", "c2")
    run(dir, Nil, "mv", "a.txt", "c.txt"); run(dir, dated(3), "commit", "-q", "-m", "c3")
    run(dir, Nil, "rm", "-q", "b.txt"); run(dir, dated(4), "commit", "-q", "-m", "c4")
    dir
  }

  test("commit walk: metadata, raw-date tz split, parent chain, line totals") {
    val dir = scriptRepo()
    try {
      assert(GitHistorySource.commitCount(dir.toString) == 4)
      val repos = Seq(RepoRef("models/o/r", "o/r", dir.toString)).toDS()
      val commits = GitHistorySource.commits(repos).collect().sortBy(_.author_epoch)
      assert(commits.length == 4)
      assert(commits.forall(_.repo_id == "models/o/r"))
      assert(commits.forall(c => c.author_name == "tester" && c.committer_name == "tester"))
      // pinned raw dates round-trip with their offsets
      assert(commits(0).author_epoch == 1700000010L && commits(0).author_tz == 150)
      assert(commits(0).committer_epoch == 1700000015L && commits(0).committer_tz == -60)
      // linear parent chain, root has none
      assert(commits(0).parents.isEmpty)
      (1 until 4).foreach(i => assert(commits(i).parents == Seq(commits(i - 1).sha)))
      // shortstat totals: c2 adds b1 + changes a (2 ins via b, 2 ins/1 del via a)
      assert(commits(1).insertions == 3 && commits(1).deletions == 1)
      // and the parents feed CommitGraph/Normalize.commitParents directly
      val edges = graft.hfc.Normalize.commitParents(
        GitHistorySource.commits(repos).toDF())
        .as[(String, String)].collect().toSet
      assert(edges == Set(commits(1).sha -> commits(0).sha,
                          commits(2).sha -> commits(1).sha,
                          commits(3).sha -> commits(2).sha))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("delta walk: ADD/MODIFY/RENAME/DELETE with line counts, feeds Normalize.modifiedFiles") {
    import org.apache.spark.sql.functions._
    val dir = scriptRepo()
    try {
      val repos = Seq(RepoRef("models/o/r", "o/r", dir.toString)).toDS()
      val commits = GitHistorySource.commits(repos).collect().sortBy(_.author_epoch)
      val byShaType = GitHistorySource.deltas(repos).collect()
        .groupBy(_.sha).view.mapValues(_.map(d =>
          (d.change_type, d.old_path, d.new_path, d.added_lines, d.deleted_lines)).toSet)
      assert(byShaType(commits(0).sha) ==
        Set(("ADD", null, "a.txt", Some(2), Some(0))))
      assert(byShaType(commits(1).sha) ==
        Set(("MODIFY", "a.txt", "a.txt", Some(2), Some(1)),
            ("ADD", null, "b.txt", Some(1), Some(0))))
      assert(byShaType(commits(2).sha) ==
        Set(("RENAME", "a.txt", "c.txt", Some(0), Some(0))))
      assert(byShaType(commits(3).sha) ==
        Set(("DELETE", "b.txt", null, Some(0), Some(1))))

      // close the loop: the walker's rows satisfy the deltasRaw
      // contract of Normalize.modifiedFiles (J1/P2/P9) as-is
      val deltasRaw = GitHistorySource.deltas(repos).toDF()
      val repoFile = Seq(("f-c", "models/o/r", "c.txt")).toDF("id", "repo_id", "rfilename")
      val mf = graft.hfc.Normalize.modifiedFiles(deltasRaw, repoFile)
      val renamed = mf.filter(col("change_type") === "RENAME")
        .select("filename", "repo_file_id").as[(String, String)].head()
      assert(renamed == (("c.txt", "f-c")))   // current-path join resolves the FK
      val deleted = mf.filter(col("change_type") === "DELETE")
        .select("filename", "repo_file_id").as[(String, Option[String])].head()
      assert(deleted == (("b.txt", None)))    // P9 old-path + reference's dict-miss NULL
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("content pass: unified diff hunks, P8 sentinel cap, post-image nloc") {
    val dir = scriptRepo()
    try {
      // c5: a >1 MiB text file (forces the walker-side P8 cap) and a binary file
      val big = ("x" * 79 + "\n") * 14000  // 1.12 MiB
      write(dir, "big.txt", big)
      Files.write(Paths.get(dir.toString, "bin.dat"),
        Array[Byte](0, 1, 2, 3, 0, 65, 66, 10, 0))
      run(dir, Nil, "add", "-A")
      run(dir, Seq("GIT_AUTHOR_DATE" -> "1700000050 +0230",
                   "GIT_COMMITTER_DATE" -> "1700000055 -0100"), "commit", "-q", "-m", "c5")

      val repos = Seq(RepoRef("models/o/r", "o/r", dir.toString)).toDS()
      val commits = GitHistorySource.commits(repos).collect().sortBy(_.author_epoch)
      val ds = GitHistorySource.deltas(repos, withContent = true).collect()
      val byKey = ds.map(d => (d.sha, Option(d.new_path).getOrElse(d.old_path)) -> d).toMap

      // c1 ADD a.txt: hunks present, post-image = 2 non-blank lines
      val add = byKey((commits(0).sha, "a.txt"))
      assert(add.diff.exists(t => t.startsWith("@@") && t.contains("+l1\n+l2\n")))
      assert(add.nloc == Some(2))
      // c2 MODIFY a.txt: hunk shows the change, nloc = post-image count
      val mod = byKey((commits(1).sha, "a.txt"))
      assert(mod.diff.exists(t => t.contains("-l2\n") && t.contains("+l2-changed\n")))
      assert(mod.nloc == Some(3))
      // c3 pure RENAME: empty diff (GitPython/PyDriller contract), post-image carried
      val ren = byKey((commits(2).sha, "c.txt"))
      assert(ren.change_type == "RENAME" && ren.diff == Some("") && ren.nloc == Some(3))
      // c4 DELETE b.txt: diff records the removal, no post-image → nloc None
      val del = byKey((commits(3).sha, "b.txt"))
      assert(del.change_type == "DELETE" && del.diff.exists(_.contains("-b1")))
      assert(del.nloc == None)
      // c5 big.txt: walker-side P8 cap → the reference's exact sentinel
      val capped = byKey((commits(4).sha, "big.txt"))
      assert(capped.diff == Some(graft.hfc.Transforms.DiffSentinel))
      assert(capped.nloc == Some(14000))
      // c5 bin.dat: numstat "-" → None counts, binary → nloc None, empty diff text
      val bin = byKey((commits(4).sha, "bin.dat"))
      assert(bin.added_lines == None && bin.deleted_lines == None && bin.nloc == None)
      assert(bin.diff == Some(""))

      // and Normalize carries diff+nloc through with capDiff idempotent on the sentinel
      val mf = graft.hfc.Normalize.modifiedFiles(
        GitHistorySource.deltas(repos, withContent = true).toDF(),
        Seq(("f-big", "models/o/r", "big.txt")).toDF("id", "repo_id", "rfilename"))
      val row = mf.filter(org.apache.spark.sql.functions.col("filename") === "big.txt")
        .select("diff", "nloc").as[(String, Int)].head()
      assert(row == ((graft.hfc.Transforms.DiffSentinel, 14000)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("nloc modes: superset counts non-blank lines; CommentStripped drops comment-only lines") {
    val dir = Files.createTempDirectory("graft-git-nloc").toFile
    try {
      run(dir, Nil, "init", "-q", "-b", "main")
      // 2 comment-only lines + 1 blank + 3 code lines (one with trailing comment)
      write(dir, "mod.py", "# header\n# more docs\n\nx = 1  # inline\ndef f():\n    return x\n")
      // 1 line comment + 2-line block comment + 2 code lines
      write(dir, "Mod.scala", "// top\n/* block\n   comment */\nval a = 1\nval b = \"// not a comment\"\n")
      // unrecognized extension: superset either way
      write(dir, "notes.txt", "// kept\n\nbody\n")
      run(dir, Nil, "add", "-A")
      run(dir, Seq("GIT_AUTHOR_DATE" -> "1700000010 +0000",
                   "GIT_COMMITTER_DATE" -> "1700000015 +0000"), "commit", "-q", "-m", "c1")
      val repos = Seq(RepoRef("models/o/r", "o/r", dir.toString)).toDS()
      def nlocs(mode: Nloc.NlocMode) =
        GitHistorySource.deltas(repos, withContent = true, nlocMode = mode)
          .collect().map(d => d.new_path -> d.nloc).toMap
      val sup = nlocs(Nloc.NlocMode.Superset)
      assert(sup("mod.py") == Some(5) && sup("Mod.scala") == Some(5) && sup("notes.txt") == Some(2))
      val strip = nlocs(Nloc.NlocMode.CommentStripped)
      assert(strip("mod.py") == Some(3), s"py: ${strip("mod.py")}")
      assert(strip("Mod.scala") == Some(2), s"scala: ${strip("Mod.scala")}")
      assert(strip("notes.txt") == Some(2)) // fallback = superset
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("non-ASCII filenames survive the walk unescaped (core.quotepath)") {
    val dir = Files.createTempDirectory("graft-git-utf8").toFile
    try {
      run(dir, Nil, "init", "-q", "-b", "main")
      write(dir, "fällø.txt", "eins\nzwei\n")
      run(dir, Nil, "add", "-A")
      run(dir, Seq("GIT_AUTHOR_DATE" -> "1700000010 +0000",
                   "GIT_COMMITTER_DATE" -> "1700000015 +0000"), "commit", "-q", "-m", "c1")
      val repos = Seq(RepoRef("models/o/u", "o/u", dir.toString)).toDS()
      val ds = GitHistorySource.deltas(repos, withContent = true).collect()
      assert(ds.length == 1)
      val d = ds.head
      // without quotepath=false git prints "f\303\244ll\303\270.txt"
      assert(d.new_path == "fällø.txt", s"path was ${d.new_path}")
      assert(d.added_lines == Some(2) && d.nloc == Some(2))
      assert(d.diff.exists(_.contains("+eins")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("an EMPTY repo (unborn HEAD) is an empty history, not an error") {
    val dir = Files.createTempDirectory("graft-git-empty").toFile
    try {
      run(dir, Nil, "init", "-q", "-b", "main")   // zero commits
      val repos = Seq(RepoRef("models/o/e", "o/e", dir.toString)).toDS()
      assert(GitHistorySource.commitCount(dir.toString) == 0)
      assert(GitHistorySource.commits(repos).collect().isEmpty)
      assert(GitHistorySource.deltas(repos, withContent = true).collect().isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("a failing git is an error, never a silently shorter history") {
    val notARepo = Files.createTempDirectory("graft-notgit").toFile
    try {
      val repos = Seq(RepoRef("models/o/x", "o/x", notARepo.toString)).toDS()
      val e = intercept[org.apache.spark.SparkException] {
        GitHistorySource.deltas(repos).collect()
      }
      assert(e.getMessage.contains("exited with") ||
        Option(e.getCause).exists(_.getMessage.contains("exited with")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(notARepo)
  }

  test("renamePaths handles brace and plain rename forms") {
    assert(GitHistorySource.renamePaths("src/{old.txt => new.txt}") ==
      (("src/old.txt", "src/new.txt")))
    assert(GitHistorySource.renamePaths("{a => b}/f.txt") == (("a/f.txt", "b/f.txt")))
    assert(GitHistorySource.renamePaths("old.txt => new.txt") == (("old.txt", "new.txt")))
    assert(GitHistorySource.renamePaths("plain.txt") == (("plain.txt", "plain.txt")))
  }
}
