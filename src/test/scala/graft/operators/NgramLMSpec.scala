package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class NgramLMSpec extends SparkTestBase {
  import spark.implicits._

  // reference "a b a": unigrams a:2 b:1 (V=2); bigrams "a b":1, "b a":1
  private lazy val ref = Seq((100L, "a b a")).toDF("doc_id", "text")
  private lazy val model = NgramLM.fit(ref)

  private lazy val docs = Seq(
    (1L, "a b"),  // -ln((1+1)/(2+2)) = ln 2
    (2L, "c d"),  // OOV: -ln((0+1)/(0+2)) = ln 2
    (3L, "a a"),  // seen w1, unseen bigram: -ln((0+1)/(2+2)) = ln 4
    (4L, "x"))    // no bigrams
    .toDF("doc_id", "text")

  private val ln2 = math.rint(math.log(2) * 1e6) / 1e6 // per-term round 6
  private val ln4 = math.rint(math.log(4) * 1e6) / 1e6

  test("fit: count tables and vocabulary size") {
    val uni = model.unigrams.as[(String, Long)].collect().toMap
    assert(uni == Map("a" -> 2L, "b" -> 1L))
    val bg = model.bigrams.as[(String, Long)].collect().toMap
    assert(bg == Map("a b" -> 1L, "b a" -> 1L))
    assert(model.vocab.as[Double].head() == 2.0)
  }

  test("crossEntropy: add-one smoothed bigram nll, exact on hand-computed docs") {
    val out = NgramLM.crossEntropy(docs, model).orderBy($"doc_id").collect()
    assert(out(0) == Row(1L, 1L, ln2))
    assert(out(1) == Row(2L, 1L, ln2))
    assert(out(2) == Row(3L, 1L, ln4))
    assert(out(3) == Row(4L, 0L, null)) // sub-bigram doc: NULL score, kept in output
  }

  test("crossEntropy: multi-bigram doc averages the per-bigram terms") {
    // "a b a": bigrams "a b" (ln 2) and "b a" (-ln((1+1)/(1+2)) = ln 1.5)
    val d = Seq((1L, "a b a")).toDF("doc_id", "text")
    val r = NgramLM.crossEntropy(d, model).collect().head
    assert(r.getAs[Long]("n_bigrams") == 2L)
    // mirror the engine arithmetic exactly: exact decimal sum of the
    // two 6-decimal terms, nearest-double cast, exact halving
    val micros = math.round(math.log(2) * 1e6) + math.round(math.log(1.5) * 1e6)
    assert(r.getAs[Double]("cross_entropy") == micros.toDouble / 1e6 / 2)
  }

  test("crossEntropy: case-insensitive (model and docs lowercased)") {
    val d = Seq((1L, "A B")).toDF("doc_id", "text")
    val r = NgramLM.crossEntropy(d, model).collect().head
    assert(r.getAs[Double]("cross_entropy") == ln2)
  }

  test("broadcastModel=true scores identically and broadcasts the model joins") {
    val plain = NgramLM.crossEntropy(docs, model).orderBy($"doc_id").collect()
    val bcast = NgramLM.crossEntropy(docs, model, broadcastModel = true)
    assert(bcast.orderBy($"doc_id").collect().toSeq == plain.toSeq)
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
