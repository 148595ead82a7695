package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

import java.io.File
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pins the two load-bearing properties of the partition-pruned MERGE:
  * (1) it computes exactly what the full-table consolidation computes,
  * and (2) partitions that contain no update keys are NOT rewritten —
  * their files stay byte-identical (same paths, sizes, mtimes,
  * contents). At 63 M-row repo_file scale that is the difference
  * between a merge proportional to the update and one proportional to
  * the table. */
class PartitionedMergeSpec extends SparkTestBase {
  import spark.implicits._

  private val N = 8

  private def baseTable: DataFrame =
    (0 until 200).map(i => (s"repo$i", i, s"v$i")).toDF("id", "likes", "payload")

  private def fileState(dir: String): Map[String, (Long, Long, String)] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map { p =>
        val bytes = Files.readAllBytes(p)
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        (p.toString, (Files.size(p), Files.getLastModifiedTime(p).toMillis,
          md.map("%02x".format(_)).mkString))
      }.toMap

  test("upsertPartitioned == full-table upsert, and untouched partitions are byte-identical") {
    val dir = Files.createTempDirectory("graft-pmerge").toString
    try {
      val path = s"$dir/t"
      PartitionedMergeWriter.initTable(baseTable, path, "id", N)

      val updates = Seq(
        ("repo3", 999, "v3b"),     // existing key, new values
        ("repo3", 1000, "v3c"),    // same key again — last wins
        ("repo777", 1, "new"),     // brand new key
      ).toDF("id", "likes", "payload")

      val expected = PartitionedMergeWriter
        .upsertFullTable(spark, path, updates, Seq("id"), "id", N)
        .select("id", "likes", "payload").as[(String, Int, String)].collect().toSet

      val before = fileState(path)
      val affected = PartitionedMergeWriter
        .upsertPartitioned(spark, path, updates, Seq("id"), "id", N)
      val after = fileState(path)

      // semantics: identical to the naive full-outer consolidation
      val actual = spark.read.parquet(path)
        .select("id", "likes", "payload").as[(String, Int, String)].collect().toSet
      assert(actual == expected)
      assert(actual.contains(("repo3", 1000, "v3c")))
      assert(actual.contains(("repo777", 1, "new")))

      // pruning: only the partitions holding repo3/repo777 changed
      assert(affected.nonEmpty && affected.size <= 2)
      val untouchedDirs = (0 until N).filterNot(affected.contains)
        .map(p => s"$path/${PartitionedMergeWriter.PartCol}=$p")
      val beforeUntouched = before.filter { case (f, _) => untouchedDirs.exists(f.startsWith) }
      val afterUntouched = after.filter { case (f, _) => untouchedDirs.exists(f.startsWith) }
      assert(beforeUntouched.nonEmpty, "fixture should populate several partitions")
      assert(beforeUntouched == afterUntouched,
        "untouched partition files must not be rewritten, moved, or re-timestamped")
      // and the affected ones really did change
      assert(before.keySet.filter(f => affected.exists(p =>
        f.startsWith(s"$path/${PartitionedMergeWriter.PartCol}=$p"))) !=
        after.keySet.filter(f => affected.exists(p =>
          f.startsWith(s"$path/${PartitionedMergeWriter.PartCol}=$p"))))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new File(dir))
    }
  }

  test("upsertPartitioned is idempotent (re-running the same batch converges)") {
    val dir = Files.createTempDirectory("graft-pmerge").toString
    try {
      val path = s"$dir/t"
      PartitionedMergeWriter.initTable(baseTable, path, "id", N)
      val updates = Seq(("repo5", 42, "x")).toDF("id", "likes", "payload")
      PartitionedMergeWriter.upsertPartitioned(spark, path, updates, Seq("id"), "id", N)
      val once = spark.read.parquet(path).as[(String, Int, String, Int)].collect().toSet
      PartitionedMergeWriter.upsertPartitioned(spark, path, updates, Seq("id"), "id", N)
      val twice = spark.read.parquet(path).as[(String, Int, String, Int)].collect().toSet
      assert(once == twice)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new File(dir))
    }
  }

  test("updateColumnsPartitioned touches only counter columns and affected partitions") {
    val dir = Files.createTempDirectory("graft-pmerge").toString
    try {
      val path = s"$dir/t"
      PartitionedMergeWriter.initTable(baseTable, path, "id", N)
      val before = fileState(path)
      val updates = Seq(
        ("repo7", 777, "IGNORED"),   // existing key: likes updated, payload NOT in cols
        ("repoX", 1, "IGNORED"),     // unknown key: ignored entirely (K4 semantics)
      ).toDF("id", "likes", "payload")
      val affected = PartitionedMergeWriter.updateColumnsPartitioned(
        spark, path, updates, Seq("id"), cols = Seq("likes"), "id", N)
      val after = fileState(path)

      val rows = spark.read.parquet(path)
        .select("id", "likes", "payload").as[(String, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rows("repo7") == ((777, "v7")))        // likes changed, payload kept
      assert(!rows.contains("repoX"))               // non-matching row dropped
      assert(rows.size == 200)
      val untouched = (0 until N).filterNot(affected.contains)
        .map(p => s"$path/${PartitionedMergeWriter.PartCol}=$p")
      assert(before.filter(f => untouched.exists(f._1.startsWith)) ==
             after.filter(f => untouched.exists(f._1.startsWith)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new File(dir))
    }
  }

  test("refreshPartitioned: stale keys get counters only, fresh keys full upsert") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val dir = Files.createTempDirectory("graft-pmerge").toString
    try {
      val path = s"$dir/t"
      PartitionedMergeWriter.initTable(baseTable, path, "id", N)
      val batch = Seq(
        ("repo3", 333, "NEWPAYLOAD", "2024-01-05"),  // stale (< limit) → likes only
        ("repo9", 999, "fresh-pay", "2024-03-10"),   // fresh → full upsert
        ("repo900", 9, "brand-new", "2024-03-11"),   // fresh new key → inserted
      ).toDF("id", "likes", "payload", "lm")
        .withColumn("last_modified", to_timestamp(col("lm"))).drop("lm")
      IncrementalRefresh.refreshPartitioned(spark, path, batch, Seq("id"), "id", N,
        "last_modified", to_timestamp(lit("2024-02-01")), Seq("likes"))

      val rows = spark.read.parquet(path)
        .select("id", "likes", "payload").as[(String, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rows("repo3") == ((333, "v3")))            // counters refreshed, payload kept
      assert(rows("repo9") == ((999, "fresh-pay")))     // full upsert
      assert(rows("repo900") == ((9, "brand-new")))     // inserted
      assert(rows("repo5") == ((5, "v5")))              // untouched key intact
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new File(dir))
    }
  }

  test("recover repairs a crash between the rename-aside and the publish") {
    val dir = Files.createTempDirectory("graft-pmerge").toString
    try {
      val path = s"$dir/t"
      PartitionedMergeWriter.initTable(baseTable, path, "id", N)
      val whole = spark.read.parquet(path)
        .as[(String, Int, String, Int)].collect().toSet

      // simulate the torn state for partition 0: target renamed aside,
      // staging complete under the canonical name, publish never ran
      val target = s"$path/${PartitionedMergeWriter.PartCol}=0"
      val staging = AtomicSwap.stagingFor(target)
      Files.move(Paths.get(target), Paths.get(staging))
      Files.createFile(Paths.get(staging, "_SUCCESS"))
      Files.createDirectory(Paths.get(target))
      Files.move(Paths.get(target), Paths.get(target + ".old"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)

      PartitionedMergeWriter.recover(spark, path, N)
      val recovered = spark.read.parquet(path)
        .as[(String, Int, String, Int)].collect().toSet
      assert(recovered == whole, "roll-forward must restore every row")
      assert(!new File(target + ".old").exists())
      assert(!new File(staging).exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new File(dir))
    }
  }
}
