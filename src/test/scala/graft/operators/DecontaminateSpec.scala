package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")

  private lazy val corpus = Seq(
    // shares the 5-grams "alpha beta gamma delta epsilon" and
    // "beta gamma delta epsilon zeta" with the bench doc
    (0L, "prefix alpha beta gamma delta epsilon zeta suffix"),
    // shares words but never 5 contiguous ones
    (1L, "alpha beta gamma xxx delta epsilon zeta alpha beta"),
    // unrelated
    (2L, "one two three four five six seven"),
    // too short for any 5-gram
    (3L, "alpha beta")).toDF("doc_id", "text")

  test("flag: exact 5-gram collisions only, with distinct-gram hit counts") {
    val out = Decontaminate.flag(corpus, bench, n = 5)
      .as[(Long, Long, Boolean)].collect()
      .map { case (d, h, c) => d -> ((h, c)) }.toMap
    assert(out(0L) == (2L, true))
    assert(out(1L) == (0L, false))
    assert(out(2L) == (0L, false))
    assert(out(3L) == (0L, false))
  }

  test("hit count is over DISTINCT shared grams (repeats in the doc count once)") {
    val rep = Seq((0L, "alpha beta gamma delta epsilon x alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val out = Decontaminate.flag(rep, bench, n = 5)
      .as[(Long, Long, Boolean)].collect().head
    assert(out == ((0L, 1L, true)))
  }

  test("the bench-gram side is broadcast (no shuffle of the corpus text)") {
    val plan = Decontaminate
      .contaminationHits(corpus, bench, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
