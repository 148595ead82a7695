package graft.tools

import graft.GraftSession
import graft.hfc._
import graft.sources.{GitCloneSource, GitHistorySource}
import graft.sources.GitCloneSource.{CloneResult, CloneTask}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E1 end-to-end extraction throughput — the one BASELINE.md row never
  * measured engine-side: the reference reports ~54 h single-threaded
  * for a full hub import (docs/usage.html; ~5.6 repos/sec implied).
  * This main drives the ENTIRE populate loop over a synthetic fleet of
  * REAL git repositories: listing (bronze, API-shaped) → governance →
  * clone (`git clone --bare` over file:// transport) → history walk
  * (3-pass `git log` + `cat-file` nloc) → discussions (bronze, N+1
  * shape) → Normalize (all silver tables) → MERGE in
  * [[Schemas.writeOrder]].
  *
  * Honesty box: the network stages (hub listing API, discussion
  * fetches, clone transport) are simulated at local-disk latency, so
  * the measured number is the ENGINE-SIDE ceiling — what throughput
  * the cluster sustains once bytes arrive. The reference's 54 h
  * includes real network; the comparison says whether the engine or
  * the wire is the bottleneck at scale. Fleet GENERATION (scripting
  * the origin repos) is timed separately and excluded.
  *
  * `runMain graft.tools.ProfileE1 [nRepos] [commitsPerRepo] [workDir]`
  */
object ProfileE1 {

  final case class OriginRepo(idx: Long, name: String, path: String)

  private def sh(dir: java.io.File, env: Seq[(String, String)], cmd: String*): Unit = {
    val pb = new java.lang.ProcessBuilder(
      (Seq("git", "-c", "commit.gpgsign=false") ++ cmd): _*)
    pb.directory(dir)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectOutput(java.lang.ProcessBuilder.Redirect.DISCARD)
    pb.redirectError(java.lang.ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    p.getOutputStream.close()
    require(p.waitFor() == 0, s"git ${cmd.mkString(" ")} failed in $dir")
  }

  /** Script one deterministic origin repo: alternating ADD/MODIFY
    * commits over two files + a README, idx-salted content so shas are
    * unique across the fleet, pinned author/committer dates. */
  private def makeOrigin(parent: String, idx: Long, nCommits: Int): OriginRepo = {
    val name = s"org${idx % 50}/repo$idx"
    val dir = new java.io.File(parent, s"repo$idx")
    require(dir.mkdirs(), s"origin dir exists: $dir")
    val user = Seq("-c", s"user.name=user${idx % 200}", "-c", s"user.email=u${idx % 200}@local")
    sh(dir, Nil, (user ++ Seq("init", "-q", "-b", "main")): _*)
    java.nio.file.Files.write(new java.io.File(dir, "README.md").toPath,
      s"# repo $idx\nsynthetic fleet member\n".getBytes("UTF-8"))
    for (c <- 1 to nCommits) {
      val f = s"f${c % 2}.txt"
      val body = (0 until 20).map(l => s"repo$idx commit$c line$l").mkString("", "\n", "\n")
      java.nio.file.Files.write(new java.io.File(dir, f).toPath, body.getBytes("UTF-8"))
      val env = Seq(
        "GIT_AUTHOR_DATE" -> s"${1690000000L + idx * 1000 + c * 60} +0100",
        "GIT_COMMITTER_DATE" -> s"${1690000000L + idx * 1000 + c * 60 + 30} +0000")
      sh(dir, Nil, (user ++ Seq("add", "-A")): _*)
      sh(dir, env, (user ++ Seq("commit", "-q", "-m", s"repo$idx c$c")): _*)
    }
    OriginRepo(idx, name, dir.getAbsolutePath)
  }

  def main(args: Array[String]): Unit = {
    val nRepos = args.headOption.map(_.toInt).getOrElse(5000)
    val nCommits = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val work = args.drop(2).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("profile-e1").toString)
    Seq("origin", "clones", "stage", "silver").foreach(d => new java.io.File(work, d).mkdirs())
    val spark = GraftSession.local(appName = "profile-e1")
    import spark.implicits._

    val walls = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](stage: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      walls(stage) = s
      println(f"[e1] $stage%-18s ${s}%8.2f s  (${nRepos / s}%8.1f repos/s)")
      r
    }

    // ---- fleet generation (excluded from engine throughput) ----
    val fleet = timed("generate-fleet") {
      val f = spark.range(nRepos).repartition(64)
        .mapPartitions(_.map(i => makeOrigin(s"$work/origin", i, nCommits)))
        .localCheckpoint(true)
      require(f.count() == nRepos); f
    }

    // ---- bronze listing (the hub API shape, synthesized) ----
    val lfsType = "struct<size:bigint,sha256:string,pointer_size:bigint>"
    val modelsListing = fleet.toDF()
      .select(
        $"name",
        split($"name", "/").getItem(0).as("author"),
        md5(concat(lit("sha"), $"idx")).as("sha"),
        timestamp_seconds(lit(1700000000L) + $"idx" * 37).as("last_modified"),
        lit(false).as("private"),
        concat(lit("license: mit\nidx: "), $"idx").as("card_data"),
        when($"idx" % 10 === 0, lit("True")).otherwise(lit(null)).cast("string").as("gated"),
        lit(false).as("disabled"),
        ($"idx" % 100).cast("int").as("likes"),
        concat(lit("models/"), $"name").as("repo_id"),
        array(
          struct(lit("README.md").as("rfilename"), lit(64L).as("size"),
            md5(concat(lit("b0"), $"idx")).as("blob_id"), lit(null).cast(lfsType).as("lfs")),
          struct(lit("f0.txt").as("rfilename"), ($"idx" % 997 + 100).as("size"),
            md5(concat(lit("b1"), $"idx")).as("blob_id"), lit(null).cast(lfsType).as("lfs")),
          struct(lit("f1.txt").as("rfilename"), ($"idx" % 491 + 100).as("size"),
            md5(concat(lit("b2"), $"idx")).as("blob_id"),
            when($"idx" % 7 === 0,
              struct(($"idx" + 1000).as("size"), md5(concat(lit("lfs"), $"idx")).as("sha256"),
                lit(134L).as("pointer_size"))).otherwise(lit(null).cast(lfsType)).as("lfs"))
        ).as("siblings"),
        array(concat(lit("tag"), $"idx" % 20), concat(lit("tag"), ($"idx" * 7) % 20)).as("tags"),
        ($"idx" % 5000).as("downloads"),
        lit("transformers").as("library_name"),
        concat(lit("pipeline"), $"idx" % 12).as("pipeline_tag"))
      .localCheckpoint(true)

    // ---- clone stage (real `git clone --bare`, file:// transport) ----
    val cloneResults = timed("clone") {
      val tasks = fleet.map(o => CloneTask(s"models/${o.name}", o.name, s"file://${o.path}"))
      GitCloneSource.cloneAll(tasks, s"$work/clones", maxAttempts = 2, timeoutSec = 300)
        .toDF().write.mode("overwrite").parquet(s"$work/stage/clone_results")
      spark.read.parquet(s"$work/stage/clone_results").as[CloneResult]
    }
    val nOk = cloneResults.filter(_.error == null).count()
    println(s"[e1] clones ok=$nOk failed=${nRepos - nOk}")

    // ---- history walk (commits + content deltas with nloc) ----
    timed("walk-history") {
      val refs = GitCloneSource.refs(cloneResults)
      GitHistorySource.commitsTable(spark, refs)
        .withColumn("message", lit(null).cast("string"))
        .write.mode("overwrite").parquet(s"$work/stage/commits")
      GitHistorySource.deltas(refs, withContent = true)
        .toDF().write.mode("overwrite").parquet(s"$work/stage/deltas")
    }
    val commitsRaw = spark.read.parquet(s"$work/stage/commits")
    val deltasRaw = spark.read.parquet(s"$work/stage/deltas")

    // ---- bronze discussions (the N+1 detail shape, synthesized) ----
    val discussionsRaw = fleet.toDF().select($"idx", concat(lit("models/"), $"name").as("repo_id"))
      .select($"repo_id", explode(array(lit(1), lit(2))).as("num"), $"idx")
      .select($"num", $"repo_id",
        concat(lit("user"), $"idx" % 200).as("author"),
        concat(lit("discussion "), $"num").as("title"),
        when($"num" === 1, lit("open")).otherwise(lit("merged")).as("status"),
        timestamp_seconds(lit(1700000000L) + $"idx" * 11 + $"num").as("created_at"),
        ($"num" === 2).as("is_pull_request"),
        when($"num" === 2, lit("refs/heads/main")).as("target_branch"),
        when($"num" === 2, md5(concat(lit("bogus"), $"idx"))).as("merge_commit_oid"),
        lit(null).cast("string").as("diff"),
        when($"num" === 2, concat(lit("refs/pr/"), $"num")).as("git_reference"))
    val eventsRaw = discussionsRaw
      .select($"repo_id", $"num".as("discussion_num"), $"author", $"created_at",
        explode(array(lit("comment"), lit("status-change"), lit("title-change"))).as("event_type"))
      .select(
        md5(concat($"repo_id", $"discussion_num", $"event_type")).as("id"),
        $"discussion_num", $"repo_id", $"event_type", $"created_at", $"author",
        when($"event_type" === "comment", lit("looks good")).as("content"),
        when($"event_type" === "comment", lit(false)).as("edited"),
        when($"event_type" === "comment", lit(false)).as("hidden"),
        when($"event_type" === "status-change", lit("closed")).as("new_status"),
        lit(null).cast("string").as("summary"),
        lit(null).cast("string").as("sha"),
        when($"event_type" === "title-change", lit("old")).as("old_title"),
        when($"event_type" === "title-change", lit("new")).as("new_title"),
        lit("{}").as("full_data"))

    // ---- normalize + MERGE in writeOrder ----
    val emptyListing = modelsListing.limit(0)
    timed("normalize+merge") {
      val repos = Normalize.repositories(modelsListing, emptyListing, emptyListing)
      val files = Normalize.repoFiles(modelsListing)
      val (tagVocab, tagEdges) = Normalize.tagTables(modelsListing)
      val model = modelsListing.select(
        concat(lit("models/"), $"name").as("model_id"),
        $"pipeline_tag", $"downloads".cast("long").as("downloads"),
        $"library_name", lit(null).cast("string").as("config"))
      val authors = commitsRaw.select($"author_name".as("username"), lit("commit").as("source"))
        .unionByName(modelsListing.select($"author".as("username"), lit("hf_owner").as("source")))
        .unionByName(discussionsRaw.select($"author".as("username"), lit("hf").as("source")))
      val authorTable = authors
        .withColumn("avatar_url", lit(null).cast("string"))
        .withColumn("is_pro", lit(null).cast("boolean"))
        .withColumn("type", lit("user"))
        .select($"username", $"avatar_url", $"is_pro", $"type", $"source")
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"username").orderBy($"source")))
        .filter($"__rn" === 1).drop("__rn")
      val discussions = Normalize.repairMergeCommits(discussionsRaw, commitsRaw)
      val events = Normalize.discussionEvents(eventsRaw)
      val modified = Normalize.modifiedFiles(deltasRaw.toDF(), files)
      val fic = Normalize.filesInCommit(modified)
      val parents = Normalize.commitParents(commitsRaw)
      val commitsSilver = commitsRaw.drop("parents")

      val batches: Map[String, (DataFrame, Seq[String])] = Map(
        "tag" -> (tagVocab, Seq("name")),
        "author" -> (authorTable, Seq("username")),
        "repository" -> (repos, Seq("id")),
        "model" -> (model, Seq("model_id")),
        "repo_file" -> (files, Seq("id")),
        "tags_in_repo" -> (tagEdges, Seq("tag_name", "repo_id")),
        "commits" -> (commitsSilver, Seq("sha", "repo_id")),
        "commit_parents" -> (parents, Seq("commit_sha", "parent_sha")),
        "modified_file" -> (modified.drop("sha"), Seq("modified_file_id")),
        "files_in_commit" -> (fic, Seq("sha", "modified_file_id")),
        "discussion" -> (discussions, Seq("num", "repo_id")),
        "discussion_event" -> (events, Seq("id")))
      // FK barriers as write order (K6), exactly like the reference's
      // per-type commit points
      Schemas.writeOrder.filter(batches.contains).foreach { t =>
        val (batch, keys) = batches(t)
        val existing = batch.limit(0) // first full import: empty silver state
        val merged = MergeWriter.upsert(existing, batch, keys)
        merged.write.mode("overwrite").parquet(s"$work/silver/$t")
        val n = spark.read.parquet(s"$work/silver/$t").count()
        println(f"[e1]   merged $t%-26s $n%9d rows")
      }
    }

    val engine = walls.filterKeys(_ != "generate-fleet").values.sum
    val rps = nRepos / engine
    println(f"[e1] ENGINE TOTAL (clone+walk+normalize+merge): $engine%8.2f s = $rps%8.1f repos/s")
    println(f"[e1] reference baseline: ~5.6 repos/s single-threaded (54 h full hub) -> ratio ${rps / 5.6}%6.1fx")

    // ---- incremental refresh (the reference's monthly mode,
    // databaseImport.py:607-619): 10% of repos gain one commit and a
    // bumped last_modified (fresh -> full K2 path incl. re-clone +
    // walk); the other 90% only refresh counters (stale -> K4 path).
    // Setup (origin mutation, old-clone removal) is untimed.
    val freshFleet = fleet.filter(_.idx % 10 == 0).localCheckpoint(true)
    val nFresh = freshFleet.count()
    freshFleet.foreachPartition { it: Iterator[OriginRepo] =>
      it.foreach { o =>
        val dir = new java.io.File(o.path)
        val user = Seq("-c", s"user.name=user${o.idx % 200}", "-c", s"user.email=u${o.idx % 200}@local")
        val body = s"repo${o.idx} incremental update\n"
        java.nio.file.Files.write(new java.io.File(dir, "f0.txt").toPath, body.getBytes("UTF-8"))
        val env = Seq(
          "GIT_AUTHOR_DATE" -> s"${1750000000L + o.idx} +0100",
          "GIT_COMMITTER_DATE" -> s"${1750000000L + o.idx} +0000")
        sh(dir, Nil, (user ++ Seq("add", "-A")): _*)
        sh(dir, env, (user ++ Seq("commit", "-q", "-m", s"repo${o.idx} incr")): _*)
        // the fresh path re-clones: drop the stale bare clone
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
        }
        rm(new java.io.File(s"$work/clones", s"models/${o.name}".replaceAll("[^A-Za-z0-9._-]", "_")))
      }
    }
    timed("incremental") {
      val refreshed = modelsListing
        .withColumn("likes", ($"likes" + 1).cast("int"))
      val freshIds = freshFleet.toDF().select(concat(lit("models/"), $"name").as("repo_id"))
      val batch = refreshed.join(broadcast(freshIds.withColumn("__fresh", lit(true))),
          Seq("repo_id"), "left")
        .withColumn("last_modified",
          when($"__fresh", timestamp_seconds(lit(1750000000L))).otherwise($"last_modified"))
      // stale fast path: counters only on the repository table (K4)
      val repoSilver = spark.read.parquet(s"$work/silver/repository")
      val staleBatch = graft.hfc.Normalize.repositories(
        batch.filter($"__fresh".isNull).drop("__fresh"), emptyListing, emptyListing)
      val afterCounters = MergeWriter.updateColumns(
        repoSilver, staleBatch, Seq("id"), Seq("likes"))
      // fresh full path: re-clone, walk, upsert
      val tasks = freshFleet.map(o => CloneTask(s"models/${o.name}", o.name, s"file://${o.path}"))
      val freshRefs = GitCloneSource.refs(
        GitCloneSource.cloneAll(tasks, s"$work/clones", maxAttempts = 2, timeoutSec = 300))
      val freshCommits = GitHistorySource.commitsTable(spark, freshRefs)
        .withColumn("message", lit(null).cast("string"))
        .localCheckpoint(true)
      val freshDeltas = GitHistorySource.deltas(freshRefs, withContent = true).toDF()
      val freshRepos = graft.hfc.Normalize.repositories(
        batch.filter($"__fresh").drop("__fresh"), emptyListing, emptyListing)
      val repoOut = MergeWriter.upsert(afterCounters, freshRepos, Seq("id"))
      repoOut.write.mode("overwrite").parquet(s"$work/silver2/repository")
      val commitsOut = MergeWriter.upsert(
        spark.read.parquet(s"$work/stage/commits").drop("parents"),
        freshCommits.drop("parents"), Seq("sha", "repo_id"))
      commitsOut.write.mode("overwrite").parquet(s"$work/silver2/commits")
      val files = graft.hfc.Normalize.repoFiles(modelsListing)
      val freshModified = graft.hfc.Normalize.modifiedFiles(freshDeltas, files)
      MergeWriter.upsert(spark.read.parquet(s"$work/silver/modified_file"),
          freshModified.drop("sha"), Seq("modified_file_id"))
        .write.mode("overwrite").parquet(s"$work/silver2/modified_file")
      val nRepoRows = spark.read.parquet(s"$work/silver2/repository").count()
      val nCommitRows = spark.read.parquet(s"$work/silver2/commits").count()
      println(s"[e1]   incremental: repository=$nRepoRows commits=$nCommitRows " +
        s"(+$nFresh fresh of $nRepos)")
    }
    val incr = walls("incremental")
    println(f"[e1] incremental refresh: $incr%8.2f s for $nRepos repos ($nFresh fresh) = " +
      f"${nRepos / incr}%8.1f repos/s (${engine / incr}%4.1fx faster than full import)")
    println(s"""{"metric":"e1_repos_per_sec","value":$rps,"unit":"repos/sec","n_repos":$nRepos,""" +
      walls.map { case (k, v) => s""""$k":${math.rint(v * 100) / 100}""" }.mkString(",") + "}")
    spark.stop()
  }
}
