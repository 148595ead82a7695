package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LinearClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta gamma delta"), // identical text
    (3L, "ALPHA beta"),             // case-insensitive
    (4L, "zzz"))
    .toDF("doc_id", "text")

  test("score: deterministic — identical text gets bit-identical score") {
    val out = LinearClassifier.score(docs).orderBy($"doc_id").collect()
    assert(out(0).getAs[Double]("logit") == out(1).getAs[Double]("logit"))
    assert(out(0).getAs[Double]("prob") == out(1).getAs[Double]("prob"))
    assert(out(0).getAs[Long]("n_tokens") == 4L)
  }

  test("score: logit is the mean bucket weight; prob its sigmoid") {
    val r = LinearClassifier.score(docs).filter($"doc_id" === 3L).collect().head
    // hand-fold the two tokens through the same expressions
    val w = Seq("alpha", "beta").map { tok =>
      val bkt = java.lang.Long.parseLong(md5Hex(tok).take(4), 16) % 64
      BigDecimal(math.round(
        (java.lang.Long.parseLong(md5Hex(bkt.toString).take(4), 16) / 65536.0 * 2.0 - 1.0)
          * 1e6)) / 1000000
    }
    val expected = (w.sum).toDouble / 2
    assert(r.getAs[Double]("logit") == expected)
    assert(math.abs(r.getAs[Double]("prob") -
      math.rint(1.0 / (1.0 + math.exp(-expected)) * 1e6) / 1e6) < 1e-9)
  }

  test("score: every logit is a mean of [-1,1) weights; docs partition-order invariant") {
    val a = LinearClassifier.score(docs).orderBy($"doc_id").collect().toSeq
    val b = LinearClassifier.score(docs.repartition(7)).orderBy($"doc_id").collect().toSeq
    assert(a == b)
    assert(a.forall { r =>
      val l = r.getAs[Double]("logit"); l >= -1.0 && l < 1.0 })
  }

  test("score: rejects non-positive dim") {
    intercept[IllegalArgumentException] {
      LinearClassifier.score(docs, dim = 0)
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
