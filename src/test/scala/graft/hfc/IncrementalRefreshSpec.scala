package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The monthly-refresh contract (§1.5.8): stale repos get counters
  * only, fresh repos get full upsert, untouched rows survive. */
class IncrementalRefreshSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
  private val limit = lit("2024-02-01").cast("timestamp")

  private val existing = Seq(
    ("r1", ts("2024-01-10"), 5, "old-card-r1"),
    ("r2", ts("2024-01-15"), 9, "old-card-r2"),
    ("r3", ts("2024-03-01"), 2, "old-card-r3"),
  ).toDF("id", "last_modified", "likes", "card_data")

  test("stale rows refresh counters only; fresh rows fully upsert; absent rows insert") {
    val batch = Seq(
      ("r1", ts("2024-01-10"), 50, "NEW-CARD-MUST-NOT-APPLY"),  // stale → counters only
      ("r3", ts("2024-03-20"), 7, "new-card-r3"),               // fresh → full upsert
      ("r4", ts("2024-04-01"), 1, "card-r4"),                   // new → insert
    ).toDF("id", "last_modified", "likes", "card_data")
    val out = IncrementalRefresh.refresh(existing, batch, Seq("id"),
        "last_modified", limit, counterCols = Seq("likes"))
      .as[(String, Timestamp, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("r1") == ((ts("2024-01-10"), 50, "old-card-r1")))  // K4: likes only
    assert(out("r2") == ((ts("2024-01-15"), 9, "old-card-r2")))   // untouched
    assert(out("r3") == ((ts("2024-03-20"), 7, "new-card-r3")))   // K2: full row
    assert(out("r4") == ((ts("2024-04-01"), 1, "card-r4")))       // inserted
  }

  test("refresh is idempotent") {
    val batch = Seq(
      ("r1", ts("2024-01-10"), 50, "X"),
      ("r3", ts("2024-03-20"), 7, "new-card-r3")).toDF("id", "last_modified", "likes", "card_data")
    def run(df: org.apache.spark.sql.DataFrame) =
      IncrementalRefresh.refresh(df, batch, Seq("id"), "last_modified", limit, Seq("likes"))
    val once = run(existing).as[(String, Timestamp, Int, String)].collect().toSet
    val twice = run(run(existing)).as[(String, Timestamp, Int, String)].collect().toSet
    assert(once == twice)
  }

  test("limitDate helper snaps to month start (P13)") {
    val d = Seq(1).toDF("x")
      .select(Transforms.limitDate(0).cast("string")).as[String].head()
    assert(d.endsWith("-01"))
  }
}
