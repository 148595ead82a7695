package graft.operators

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based corpus-global line dedup: on generated corpora drawn
  * from a tiny vocabulary (maximal cross-document line collisions), the
  * distributed census+join-back must equal a brute-force in-memory
  * recomputation, and its invariants must hold on every input. Explicit
  * seeds (the scalatest-scalacheck bridge isn't in the offline cache)
  * so failures reproduce exactly. */
class LineDedupPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val LineTokens = 3
  private val MaxDf = 2

  // docs over a 4-word vocabulary, 0-12 tokens: partial trailing lines,
  // empty docs, and heavy cross-doc line collisions all occur
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
  } yield ws.mkString(" ")

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** brute-force reference: same line grid, same census, same keep rule */
  private def truth(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    def lines(text: String): Seq[String] =
      text.trim.split("\\s+").toSeq.grouped(LineTokens).map(_.mkString(" ")).toSeq
    val df = docs.flatMap { case (id, t) => lines(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    docs.map { case (id, t) =>
      val ls = lines(t)
      val kept = ls.filter(l => df(l) < MaxDf)
      id -> ((ls.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  test("distributed result equals brute force on collision-heavy corpora") {
    for (seed <- 1L to 6L) {
      val docs = sample(Gen.listOfN(30, docGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val out = QualityRules.globalLineDedup(
          docs.toDF("doc_id", "text"), lineTokens = LineTokens, maxDocFreq = MaxDf)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val exp = truth(docs)
      assert(out.keySet == exp.keySet, s"seed $seed: doc set")
      for ((id, (nl, nk, keptText)) <- exp) {
        val (onl, onk, omd5) = out(id)
        assert(onl == nl, s"seed $seed doc $id n_lines: $onl vs $nl")
        assert(onk == nk, s"seed $seed doc $id n_kept: $onk vs $nk")
        val expMd5 = java.security.MessageDigest.getInstance("MD5")
          .digest(keptText.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(omd5 == expMd5, s"seed $seed doc $id md5 of '$keptText'")
      }
    }
  }

  test("invariants: n_kept <= n_lines; determinism across partitionings") {
    val docs = sample(Gen.listOfN(40, docGen), 99L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val base = docs.toDF("doc_id", "text")
    val a = QualityRules.globalLineDedup(base, LineTokens, MaxDf)
      .orderBy($"doc_id").collect().toSeq
    assert(a.forall(r => r.getLong(2) <= r.getLong(1)))
    val b = QualityRules.globalLineDedup(base.repartition(13), LineTokens, MaxDf)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b, "result must not depend on partitioning")
  }
}
