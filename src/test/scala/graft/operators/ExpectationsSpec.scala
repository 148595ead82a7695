package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._
  import Expectations._

  private def run(df: org.apache.spark.sql.DataFrame, checks: Seq[Check]) =
    suite(df, checks).as[(String, String, Double, Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._5))).toMap

  test("each planted violation flags exactly its own expectation") {
    // id 3 duplicated; one null id; one negative amount; one enum stray
    val df = Seq(
      (Some(1L), 10.0, "A"), (Some(2L), 20.0, "B"), (Some(3L), -5.0, "A"),
      (Some(3L), 30.0, "C"), (None, 40.0, "B")
    ).toDF("id", "amount", "tag")
    val r = run(df, Seq(
      NotNull("id"), Unique("id"),
      MinValue("amount", 0.0), MaxValue("amount", 100.0),
      InSet("tag", Seq("A", "B")),
      RowCountBetween(1L, 10L)))
    assert(r(("not_null", "id")) == ((0.2, false)))
    assert(r(("unique", "id")) == ((1.0, false)))   // 4 non-null, 3 distinct
    assert(r(("min_value", "amount")) == ((-5.0, false)))
    assert(r(("max_value", "amount")) == ((40.0, true)))
    assert(r(("in_set", "tag")) == ((1.0, false)))  // the single 'C'
    assert(r(("row_count", "*")) == ((5.0, true)))
  }

  test("a clean table passes every expectation") {
    val df = Seq((1L, 10.0, "A"), (2L, 20.0, "B")).toDF("id", "amount", "tag")
    val rep = suite(df, Seq(NotNull("id"), Unique("id"),
      MinValue("amount", 0.0), MaxValue("amount", 100.0),
      InSet("tag", Seq("A", "B")), RowCountBetween(1L, 10L)))
    assert(rep.filter(!$"pass").count() == 0L)
  }

  test("foreign key: orphans and null keys count; covered keys pass") {
    val ref = Seq(1L, 2L).toDF("k")
    val good = Seq(Some(1L), Some(2L), Some(1L)).toDF("fk")
    val bad = Seq(Some(1L), Some(9L), None).toDF("fk")
    val g = run(good, Seq(ForeignKey("fk", ref, "k", "ref")))
    val b = run(bad, Seq(ForeignKey("fk", ref, "k", "ref")))
    assert(g(("foreign_key", "fk->ref.k")) == ((0.0, true)))
    assert(b(("foreign_key", "fk->ref.k")) == ((2.0, false)))
  }

  test("empty table: min reports NULL but still FAILS null-safely; row_count flags") {
    val df = Seq.empty[(Option[Long], Double)].toDF("id", "amount")
    val rep = suite(df, Seq(MinValue("amount", 0.0), RowCountBetween(1L, 10L)))
      .as[(String, String, Option[Double], Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    assert(rep(("min_value", "amount")) == ((None, false)))
    assert(rep(("row_count", "*")) == ((Some(0.0), false)))
  }

  test("N single-table checks compile into one aggregation pass (no extra scans)") {
    val df = Seq((1L, 2.0, "A")).toDF("id", "amount", "tag")
    val plan = suite(df, Seq(NotNull("id"), Unique("id"), MinValue("amount", 0.0),
      MaxValue("amount", 9.0), InSet("tag", Seq("A")), RowCountBetween(1L, 9L)))
      .queryExecution.executedPlan.toString
    // report branches read the checkpointed 1-row frame: exactly one
    // LocalTableScan/RDD source feeding six projections, no Join
    assert(!plan.contains("Join"), plan)
  }

  test("guardrails: empty check list rejected") {
    intercept[IllegalArgumentException](suite(Seq((1L)).toDF("id"), Seq.empty))
  }
}
