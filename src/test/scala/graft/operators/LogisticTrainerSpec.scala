package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LogisticTrainerSpec extends SparkTestBase {

  import spark.implicits._

  // Linearly separable toy set: y = 1 iff x1 > 0.5 (bias + one feature)
  private def toy = (1 to 200).map { i =>
    val x1 = (i % 100) / 100.0
    (if (x1 > 0.5) 1.0 else 0.0, 1.0, x1)
  }.toDF("y", "x0", "x1")

  test("fastSigmoid: σ(0)=0.5, monotone, bounded in (0,1)") {
    val got = Seq(-100.0, -1.0, 0.0, 1.0, 100.0).toDF("z")
      .select(LogisticTrainer.fastSigmoid($"z").as("s"))
      .collect().map(_.getDouble(0))
    assert(got(2) === 0.5)
    assert(got.sorted.toSeq === got.toSeq, "sigmoid must be monotone")
    assert(got.forall(s => s > 0.0 && s < 1.0))
  }

  test("GD matches a driver-side reference implementation bit-for-bit") {
    val feats = toy
    val rows = feats.collect().map(r => (r.getDouble(0), Array(r.getDouble(1), r.getDouble(2))))
    val n = rows.length.toDouble
    var w = Array(0.0, 0.0)
    val expectedPath = (1 to 3).map { _ =>
      // same contribution rounding as the distributed path; order-free by exactness
      val g = Array(0.0, 0.0)
      val acc = Array(BigDecimal(0), BigDecimal(0))
      rows.foreach { case (y, x) =>
        val z = w(0) * x(0) + w(1) * x(1)
        val s = 0.5 * (1.0 + z / (1.0 + math.abs(z)))
        for (j <- 0 to 1)
          acc(j) += BigDecimal((s - y) * x(j)).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }
      for (j <- 0 to 1) g(j) = acc(j).toDouble
      w = Array(w(0) - 0.5 * (g(0) / n), w(1) - 0.5 * (g(1) / n))
      w.toSeq
    }
    val got = LogisticTrainer.train(feats, Seq("x0", "x1"), "y", lr = 0.5, steps = 3)
    assert(got.map(_.toSeq).toSeq === expectedPath)
  }

  test("training improves accuracy over the zero model on a separable set") {
    val feats = toy.persist()
    val path = LogisticTrainer.train(feats, Seq("x0", "x1"), "y", lr = 2.0, steps = 25)
    val acc = LogisticTrainer.accuracy(feats, path.last, Seq("x0", "x1"), "y")
    // zero weights predict the majority class -> ~0.51 here
    assert(acc > 0.8, s"accuracy after training = $acc")
    feats.unpersist()
  }

  test("weight path is deterministic across repartitionings (exact-decimal sums)") {
    val a = LogisticTrainer.train(toy, Seq("x0", "x1"), "y", steps = 3)
    val b = LogisticTrainer.train(toy.repartition(7), Seq("x0", "x1"), "y", steps = 3)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}
