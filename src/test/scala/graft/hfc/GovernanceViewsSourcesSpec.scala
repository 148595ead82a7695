package graft.hfc

import graft.SparkTestBase
import graft.sources.FixtureHfhSource
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class GovernanceViewsSourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("blocklistFilter drops exactly the configured ids (F2)") {
    val df = Seq("a", "b", "c").toDF("id")
    val out = Governance.blocklistFilter(df, "id", Seq("b")).as[String].collect().toSet
    assert(out == Set("a", "c"))
    assert(Governance.blocklistFilter(df, "id", Nil).count() == 3)
  }

  test("thresholdSkip filters and reports observe metrics (F3+A3)") {
    val df = Seq(("r1", 100), ("r2", 2000), ("r3", 50)).toDF("id", "n_commits")
    @volatile var metrics: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("graft_governance").foreach(r => metrics = Some(r))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val kept = Governance.thresholdSkip(df, col("n_commits") <= 1500)
      assert(kept.as[(String, Int)].collect().map(_._1).toSet == Set("r1", "r3"))
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val m = metrics.get
      assert(m.getAs[Long]("n_total") == 3L)
      assert(m.getAs[Long]("n_skipped") == 1L)
      assert(m.getAs[Long]("n_kept") == 2L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("quarantine splits bad rows instead of dropping them (F8)") {
    val df = Seq(("r1", "ok"), ("r2", null), ("r3", "ok")).toDF("id", "payload")
    val (good, bad) = Governance.quarantine(df, col("payload").isNotNull)
    assert(good.count() == 2 && bad.count() == 1)
    assert(bad.select("id").as[String].head() == "r2")
  }

  test("HfcViews parse config/full_data blobs, null on malformed (P7)") {
    val model = Seq(
      ("m1", """{"model_type":"bert","architectures":["BertModel"],"vocab_size":30522,"hidden_size":768}"""),
      ("m2", "NOT JSON {{"),
    ).toDF("model_id", "config")
    val out = HfcViews.withConfigView(model)
      .select($"model_id", $"config_parsed.model_type", $"config_parsed.vocab_size",
              element_at($"config_map", "model_type"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("m1").getString(1) == "bert")
    assert(out("m1").getLong(2) == 30522L)
    assert(out("m1").getString(3) == "bert")
    assert(out("m2").isNullAt(1))   // malformed → null, row preserved
  }

  test("FixtureHfhSource pushes sort+limit and semi-joins details to the slice (S1-S5)") {
    val repos = Seq(
      ("m-old", "model", ts("2024-01-01"), "models/a/m-old"),
      ("m-new", "model", ts("2024-03-01"), "models/a/m-new"),
      ("m-mid", "model", ts("2024-02-01"), "models/a/m-mid"),
      ("d-1", "dataset", ts("2024-04-01"), "datasets/a/d-1"),
    ).toDF("name", "type", "last_modified", "repo_id")
    val filesRaw = Seq(
      ("models/a/m-new", "README.md"), ("models/a/m-old", "old.bin"),
      ("datasets/a/d-1", "data.csv")).toDF("repo_id", "rfilename")
    val discussionsRaw = Seq(("models/a/m-new", 1)).toDF("repo_id", "num")
    val src = new FixtureHfhSource(repos, filesRaw, discussionsRaw)

    val listed = src.listing(spark, "model", limit = 2)
    assert(listed.select("name").as[String].collect().toSeq == Seq("m-new", "m-mid"))
    // details restricted to the listed slice: m-old and the dataset excluded
    val f = src.files(spark, listed).select("rfilename").as[String].collect().toSeq
    assert(f == Seq("README.md"))
    assert(src.discussions(spark, listed).count() == 1)
  }
}
