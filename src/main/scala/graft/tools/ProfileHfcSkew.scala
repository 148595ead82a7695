package graft.tools

import graft.GraftSession
import graft.hfc.{HfcMetrics, Normalize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HFC-shaped skew measurement (round-11 verdict #5). The reference
  * blocklists mega-repos precisely because of skew
  * (databaseImport.py:712 — its per-repo Python dict dies on them);
  * the engine instead relies on (a) J1's COMPOSITE join key and (b)
  * AQE skew splitting. This drives both claims on a fixture with the
  * June-2024 census's shape — a few repos holding ~1% of all files
  * each — plus the adversarial hot-PAIR case J1's composite key can
  * NOT diffuse (one file of one mega repo modified in ~1M commits,
  * the README pathology).
  *
  * Legs (walls printed; findings land in NOTES_r11):
  *  1. J1 repo-skew: deltas/repo_file join where mega repos dominate
  *     rows — the composite (repo_id, filename) shuffle key spreads a
  *     mega repo across partitions, so AQE skew ON vs OFF should be a
  *     wash (the design claim, measured).
  *  2. J1 hot-pair: 1M deltas on ONE (repo, filename) — the only key
  *     shape that actually concentrates; AQE skew ON vs OFF measured,
  *     `isSkewJoin=true` grepped from the executed plan.
  *  3. M2 files-per-repo histogram and M3 heatmap on the skewed
  *     fixture: partial aggregation / per-repo filter shapes.
  *
  * Thresholds are lowered proportionally to local data size (the
  * ProfileSkewJoin convention): the trigger condition is the same
  * decision the defaults make at cluster scale.
  *
  * `runMain graft.tools.ProfileHfcSkew` */
object ProfileHfcSkew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(appName = "hfc-skew-profile")
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    val nMega = 8; val megaFiles = 30000L; val nBase = 192000L; val baseFiles = 14L

    // repo_file with the census skew: 8 mega repos x 30k files (~1% of
    // all files EACH), 192k long-tail repos x 14 files
    val mega = spark.range(nMega * megaFiles).select(
      concat(lit("org/mega-"), (col("id") / megaFiles).cast("long")).as("repo_id"),
      concat(lit("f"), pmod(col("id"), lit(megaFiles))).as("rfilename"))
    val base = spark.range(nBase * baseFiles).select(
      concat(lit("org/repo-"), (col("id") / baseFiles).cast("long")).as("repo_id"),
      concat(lit("f"), pmod(col("id"), lit(baseFiles))).as("rfilename"))
    val readme = Seq(("org/mega-0", "README.md")).toDF("repo_id", "rfilename")
    val repoFile = mega.unionByName(base).unionByName(readme)
      .withColumn("id", md5(concat(col("repo_id"), lit("/"), col("rfilename"))))
      .repartition(32).localCheckpoint(true)

    def mkDeltas(files: DataFrame): DataFrame = files.select(
      col("repo_id"), col("repo_id").as("repo_name"),
      md5(concat(col("repo_id"), col("rfilename"))).as("sha"),
      lit("MODIFY").as("change_type"),
      lit(null).cast("string").as("old_path"),
      col("rfilename").as("new_path"),
      md5(col("rfilename")).as("diff"),
      lit(3L).as("added_lines"), lit(1L).as("deleted_lines"), lit(40L).as("nloc"))

    // leg 1: one delta per file — per-REPO skew only
    val deltasRepoSkew = mkDeltas(repoFile.select("repo_id", "rfilename"))
      .repartition(32).localCheckpoint(true)
    // leg 2: plus 1M deltas on the single (mega-0, README.md) pair
    val hot = spark.range(1000000).select(
      lit("org/mega-0").as("repo_id"), lit("org/mega-0").as("repo_name"),
      md5(col("id").cast("string")).as("sha"),
      lit("MODIFY").as("change_type"),
      lit(null).cast("string").as("old_path"),
      lit("README.md").as("new_path"),
      md5(concat(lit("d"), col("id"))).as("diff"),
      lit(3L).as("added_lines"), lit(1L).as("deleted_lines"), lit(40L).as("nloc"))
    val deltasHotPair = deltasRepoSkew.unionByName(hot)
      .repartition(32).localCheckpoint(true)

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[hfc-skew] $label%-34s rows=$n%9d wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
      n
    }

    for (skewOn <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val tag = if (skewOn) "skew=on " else "skew=off"
      time(s"J1 repo-skew  $tag") {
        Normalize.modifiedFiles(deltasRepoSkew, repoFile).count()
      }
      val mfHot = Normalize.modifiedFiles(deltasHotPair, repoFile)
      // drive THIS DataFrame's own QueryExecution (df.count() builds a
      // separate one, leaving this plan un-finalized under AQE)
      time(s"J1 hot-pair   $tag") { mfHot.queryExecution.toRdd.count() }
      if (skewOn) {
        val p = mfHot.queryExecution.executedPlan.toString
        // Spark 4 renders the flag as `SortMergeJoin(skew=true)` with
        // `AQEShuffleRead skewed` children
        println(s"[hfc-skew] hot-pair skew split engaged: ${p.contains("skew=true")}")
        p.linesIterator.filter(l => l.contains("Join") || l.toLowerCase.contains("skew")
            || l.contains("AQEShuffleRead"))
          .take(8).foreach(l => println(s"[hfc-skew]   plan| ${l.trim.take(150)}"))
      }
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    time("M2 files-per-repo histogram") {
      HfcMetrics.filesPerRepoHistogram(repoFile).count()
    }
    // M3 is a single-repo heatmap: the repo filter prunes before any
    // shuffle, so the mega repo costs one partition-local scan + a
    // (filename, month) agg over ITS rows only
    val mf = Normalize.modifiedFiles(deltasHotPair, repoFile).localCheckpoint(true)
    val fic = mf.select(col("modified_file_id"), col("sha"))
    val commits = deltasHotPair.select(col("sha"), col("repo_id")).distinct()
      .withColumn("committer_date",
        to_timestamp(concat(lit("2024-"),
          lpad((pmod(abs(hash(col("sha"))), lit(12)) + 1).cast("string"), 2, "0"),
          lit("-15 12:00:00"))))
      .localCheckpoint(true)
    time("M3 heatmap (mega repo)") {
      HfcMetrics.fileModificationHeatmap(mf, fic, commits, "org/mega-0").count()
    }
    spark.stop()
  }
}
