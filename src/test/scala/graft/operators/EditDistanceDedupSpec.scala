package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EditDistanceDedupSpec extends SparkTestBase {
  import spark.implicits._

  // 30 near-identical tokens so the LSH banding deterministically
  // collides for the close pairs (the fuzzyFlag fixture lesson)
  private val base = (1 to 30).map(i => s"tok$i").mkString(" ")

  private lazy val docs = Seq(
    (1L, base),
    (2L, base),                             // exact copy: distance 0
    (3L, base.replace("tok30", "tok3x")),   // one substitution: distance 1
    (4L, (1 to 30).map(i => s"zzz$i").mkString(" "))) // unrelated
    .toDF("doc_id", "text")

  test("funnel: exact copy at 0, single edit at its true distance, unrelated absent") {
    val out = Dedup.nearDupsEditDistance(docs, maxDist = 5)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 0L)
    assert(out((1L, 3L)) == 1L)
    assert(out((2L, 3L)) == 1L)
    assert(out.keys.forall { case (a, b) => a != 4L && b != 4L })
  }

  test("funnel output is a subset of the brute-force edit-distance truth") {
    val a = docs.select($"doc_id".as("a_id"), $"text".as("a_text"))
    val b = docs.select($"doc_id".as("b_id"), $"text".as("b_text"))
    val truth = a.crossJoin(b).filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id", levenshtein($"a_text", $"b_text").cast("long").as("d"))
      .filter($"d" <= 5)
      .as[(Long, Long, Long)].collect().toSet
    val funnel = Dedup.nearDupsEditDistance(docs, maxDist = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(funnel.subsetOf(truth))
    // and on this near-identical fixture the banding missed nothing
    assert(funnel == truth)
  }

  test("maxDist=0 is exact-dup detection; negative rejected") {
    val out = Dedup.nearDupsEditDistance(docs, maxDist = 0)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L)))
    intercept[IllegalArgumentException] {
      Dedup.nearDupsEditDistance(docs, maxDist = -1)
    }
  }
}
