package graft.hfc

import graft.SparkTestBase

import java.io.File
import java.nio.file.{Files, Paths}

/** Exhausts the crash states of the swap protocol: whichever rename
  * the process died between, recover() must leave the target readable
  * with either the old or the (complete) new contents — never empty,
  * never a half-write. */
class AtomicSwapSpec extends SparkTestBase {

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def mkData(dir: String, marker: String, withSuccess: Boolean = true): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "data.txt"), marker.getBytes)
    if (withSuccess) Files.createFile(Paths.get(dir, "_SUCCESS"))
  }

  private def readMarker(dir: String): String =
    new String(Files.readAllBytes(Paths.get(dir, "data.txt")))

  test("crash after publish, before cleanup: stale .old is dropped, target kept") {
    val root = Files.createTempDirectory("graft-swap").toString
    val t = s"$root/t"
    mkData(t, "new"); mkData(s"$t.old", "old")
    AtomicSwap.recoverDir(fs, t)
    assert(readMarker(t) == "new")
    assert(!new File(s"$t.old").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new File(root))
  }

  test("crash between rename-aside and publish: complete staging rolls forward") {
    val root = Files.createTempDirectory("graft-swap").toString
    val t = s"$root/t"
    mkData(s"$t.old", "old"); mkData(AtomicSwap.stagingFor(t), "new")
    AtomicSwap.recoverDir(fs, t)
    assert(readMarker(t) == "new")
    assert(!new File(s"$t.old").exists())
    assert(!new File(AtomicSwap.stagingFor(t)).exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new File(root))
  }

  test("crash with torn staging (no _SUCCESS): rolls back to the old contents") {
    val root = Files.createTempDirectory("graft-swap").toString
    val t = s"$root/t"
    mkData(s"$t.old", "old"); mkData(AtomicSwap.stagingFor(t), "half", withSuccess = false)
    AtomicSwap.recoverDir(fs, t)
    assert(readMarker(t) == "old", "incomplete staging must never be published")
    assert(!new File(AtomicSwap.stagingFor(t)).exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new File(root))
  }

  test("leftover staging beside an intact target is discarded") {
    val root = Files.createTempDirectory("graft-swap").toString
    val t = s"$root/t"
    mkData(t, "current"); mkData(AtomicSwap.stagingFor(t), "uncommitted")
    AtomicSwap.recoverDir(fs, t)
    assert(readMarker(t) == "current")
    assert(!new File(AtomicSwap.stagingFor(t)).exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new File(root))
  }

  test("commitDir refuses a staging dir without _SUCCESS") {
    val root = Files.createTempDirectory("graft-swap").toString
    val t = s"$root/t"
    mkData(t, "current"); mkData(AtomicSwap.stagingFor(t), "half", withSuccess = false)
    intercept[IllegalArgumentException] {
      AtomicSwap.commitDir(fs, t, AtomicSwap.stagingFor(t))
    }
    assert(readMarker(t) == "current")
    org.apache.commons.io.FileUtils.deleteDirectory(new File(root))
  }
}
