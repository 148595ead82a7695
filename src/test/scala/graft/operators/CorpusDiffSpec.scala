package graft.operators

import graft.SparkTestBase

class CorpusDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("diff classifies added/removed/modified/unchanged per id") {
    val v1 = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("doc_id", "text")
    val v2 = Seq((1L, "aa"), (2L, "bb CHANGED"), (4L, "dd")).toDF("doc_id", "text")
    val out = CorpusDiff.diff(v1, v2)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "modified",
                      3L -> "removed", 4L -> "added"))
  }

  test("empty snapshots degenerate correctly") {
    val v1 = Seq((1L, "aa")).toDF("doc_id", "text")
    val empty = v1.filter($"doc_id" < 0)
    assert(CorpusDiff.diff(v1, empty).as[(Long, String)].collect().toSeq ==
      Seq(1L -> "removed"))
    assert(CorpusDiff.diff(empty, v1).as[(Long, String)].collect().toSeq ==
      Seq(1L -> "added"))
  }
}
