package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkTestBase {
  import spark.implicits._

  test("int8: codes are integers in [0,255]; reconstruction error within half a step") {
    val t = Tables(spark, sf0001)
    val q = Quantization.int8(t.embeddings)
    val codes = q.select(explode($"q8").as("c")).as[Double].collect()
    assert(codes.forall(c => c == math.rint(c) && c >= 0.0 && c <= 255.0))
    // per-dim step = (mx - mn)/255; |x - deq| <= step/2 + rounding slack
    val err = t.embeddings
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .join(q, "vec_id")
      .select(explode(arrays_zip($"e", $"deq")).as("z"))
      .select(abs($"z.e" - $"z.deq").as("err"))
      .agg(max($"err")).as[Double].collect().head
    val stepBound = t.embeddings
      .select(posexplode($"embedding".cast("array<double>")).as(Seq("i", "x")))
      .groupBy($"i").agg(((max($"x") - min($"x")) / 255.0 / 2.0).as("half"))
      .agg(max($"half")).as[Double].collect().head
    assert(err <= stepBound * (1.0 + 1e-9) + 1e-12,
      s"max reconstruction error $err above half-step bound $stepBound")
  }

  test("int8: constant dimension codes to 0 and reconstructs exactly") {
    val df = Seq(
      (1L, Seq(5.0, 1.0)), (2L, Seq(5.0, 2.0)), (3L, Seq(5.0, 3.0))
    ).toDF("vec_id", "embedding")
    val out = Quantization.int8(df).orderBy($"vec_id")
      .select($"q8"(0), $"deq"(0)).as[(Double, Double)].collect()
    assert(out.forall(_ == ((0.0, 5.0))))
  }

  test("int8 ANN recall vs float search is high at k=5") {
    val t = Tables(spark, sf0001)
    val qs = (0L until 10L).toSeq
    val exact = Similarity.bruteForceTopK(t.embeddings, qs, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val deq = Quantization.int8(t.embeddings).select($"vec_id", $"deq".as("embedding"))
    val quant = Similarity.bruteForceTopK(deq, qs, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall below 0.8")
  }
}
