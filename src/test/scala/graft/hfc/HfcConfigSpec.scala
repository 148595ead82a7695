package graft.hfc

import graft.SparkTestBase

import java.nio.file.Files

class HfcConfigSpec extends SparkTestBase {
  import spark.implicits._

  private val refShaped =
    """{
      |  "host" : "hostname",
      |  "port" : 3306,
      |  "user" : "user",
      |  "pass" : "ignored-secret",
      |  "database" : "db_name",
      |  "hfh_token" : "ignored-secret",
      |  "last_n_months" : 2,
      |  "max_num_commits" : 1500,
      |  "max_num_files" : 10000
      |}""".stripMargin

  test("parses the reference's hfc.config shape, ignores secret fields") {
    val cfg = HfcConfig.fromJson(refShaped)
    assert(cfg == HfcConfig("hostname", 3306, "user", "db_name", 2, 1500, 10000))
    assert(cfg.commitLimit.contains(1500) && cfg.fileLimit.contains(10000))
    assert(cfg.limitDate.isDefined)
  }

  test("reference defaults: -1 months = epoch watermark, 0 thresholds = no skip") {
    val cfg = HfcConfig.fromJson("""{"last_n_months": -1, "max_num_commits": 0}""")
    assert(cfg.limitDate.isEmpty)
    assert(cfg.commitLimit.isEmpty && cfg.fileLimit.isEmpty)
    // epoch default: every row is "fresh" (full-extraction path)
    val batch = Seq(("r1", java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
      .toDF("id", "last_modified")
    val (stale, fresh) = MergeWriter.stalenessSplit(batch, "last_modified",
      cfg.limitDateOrEpoch)
    assert(stale.count() == 0 && fresh.count() == 1)
  }

  test("loads from a file") {
    val f = Files.createTempFile("hfc", ".config")
    try {
      Files.write(f, refShaped.getBytes)
      assert(HfcConfig.load(f.toString).maxNumCommits == 1500)
    } finally Files.delete(f)
  }
}
