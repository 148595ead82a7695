package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha alpha beta", "A"), (2L, "alpha beta beta", "A"),
    (3L, "gamma gamma delta", "B"), (4L, "delta gamma", "B"),
    (5L, "alpha alpha alpha", "A")
  ).toDF("doc_id", "text", "lang")

  test("model structure: full smoothed grid plus one prior row per class") {
    val m = NaiveBayes.train(docs, "lang", dim = 16)
    val grid = m.filter($"bkt" >= 0)
    assert(grid.count() == 2L * 16)
    val priors = m.filter($"bkt" === -1)
      .select($"label", $"cnt").as[(String, Long)].collect().toMap
    assert(priors == Map("A" -> 3L, "B" -> 2L))
    // per-class bucket counts reconcile with the token mass
    val mass = grid.groupBy($"label").agg(sum($"cnt").as("s"))
      .as[(String, Long)].collect().toMap
    assert(mass == Map("A" -> 9L, "B" -> 5L))
    // zero-count buckets carry exactly the smoothed floor ln(1/(tot+dim))
    val floorA = math.rint(math.log(1.0 / (9 + 16)) * 1e6) / 1e6
    val zeroA = grid.filter($"label" === "A" && $"cnt" === 0)
      .select($"logp").as[Double].collect()
    assert(zeroA.nonEmpty && zeroA.forall(_ == floorA))
  }

  test("scoring separable classes self-classifies perfectly") {
    val m = NaiveBayes.train(docs, "lang", dim = 16)
    val pred = NaiveBayes.score(docs, m, dim = 16)
      .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
    assert(pred.filter($"pred_label" =!= $"lang").count() == 0L)
  }

  test("training and scoring are partitioning-invariant") {
    val big = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) s"even_tok_${i % 7} common" else s"odd_tok_${i % 5} common",
       if (i % 2 == 0) "E" else "O")).toDF("doc_id", "text", "lang")
    val m1 = NaiveBayes.train(big.repartition(1), "lang", dim = 32)
      .orderBy($"label", $"bkt").collect().toSeq
    val m2 = NaiveBayes.train(big.repartition(11), "lang", dim = 32)
      .orderBy($"label", $"bkt").collect().toSeq
    assert(m1 == m2)
    val s1 = NaiveBayes.score(big.repartition(1),
        NaiveBayes.train(big, "lang", dim = 32), dim = 32)
      .orderBy($"doc_id").collect().toSeq
    val s2 = NaiveBayes.score(big.repartition(7),
        NaiveBayes.train(big.repartition(3), "lang", dim = 32), dim = 32)
      .orderBy($"doc_id").collect().toSeq
    assert(s1 == s2)
  }

  test("guardrails: dim must be positive") {
    intercept[IllegalArgumentException](NaiveBayes.train(docs, "lang", dim = 0))
  }
}
