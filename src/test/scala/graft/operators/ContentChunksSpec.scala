package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ContentChunksSpec extends SparkTestBase {
  import spark.implicits._

  private def mkText(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  private def chunksOf(texts: Seq[String]): Seq[Seq[String]] =
    texts.zipWithIndex.map { case (t0, i) => (i.toLong, t0) }
      .toDF("doc_id", "text")
      .select($"doc_id", ContentChunks.cdcChunks($"text").as("ch"))
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().map(_._2).toSeq

  test("native graft_cdc_chunks bit-matches the HOF reference on ASCII inputs") {
    val texts = (0 until 40).map(i => mkText(100 + i, 20 + i * 13)) ++
      Seq("", "a", "12345678", mkText(999, 577))
    val df = texts.zipWithIndex.map { case (t0, i) => (i.toLong, t0) }.toDF("doc_id", "text")
    val got = df.select($"doc_id", ContentChunks.cdcChunks($"text").as("ch"))
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    val ref = df.select($"doc_id", ContentChunks.cdcChunksHof($"text").as("ch"))
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(got == ref)
  }

  test("chunks partition the text exactly (concat reconstructs the input)") {
    val texts = Seq(mkText(1, 400), mkText(2, 97), "short", "", mkText(3, 8))
    (chunksOf(texts) zip texts).foreach { case (ch, t0) =>
      assert(ch.mkString == t0, s"lost content for len ${t0.length}")
      assert(ch.forall(_.nonEmpty))
    }
  }

  test("sub-window and empty texts: one chunk or none, never a descending-sequence artifact") {
    val Seq(short, empty, exact) = chunksOf(Seq("abc", "", "12345678"))
    assert(short == Seq("abc"))
    assert(empty == Seq.empty)
    assert(exact.mkString == "12345678")
  }

  test("shift robustness: an insertion re-synchronizes; the fixed grid loses everything") {
    val base = mkText(42, 500)
    val shifted = "INSERTED PREAMBLE " + base
    val Seq(a, b) = chunksOf(Seq(base, shifted))
    assert(a.size >= 4, s"fixture too uniform: ${a.size} chunks")
    val shared = a.toSet.intersect(b.toSet).size
    // all of base's chunks after the first post-edit boundary reappear
    assert(shared >= a.size - 2, s"CDC lost sync: $shared of ${a.size} shared")
    // the fixed grid at the same mean width shares nothing after a
    // non-multiple-of-width shift
    val width = 64
    val gridA = base.grouped(width).toSet
    val gridB = shifted.grouped(width).toSet
    assert(gridA.intersect(gridB).isEmpty, "grid unexpectedly survived the shift")
  }

  test("chunkCensus finds the shifted duplicate; unrelated docs stay out") {
    val base = mkText(7, 450)
    val docs = Seq(
      (1L, base),
      (2L, "xy " + base),          // shifted near-copy
      (3L, mkText(8, 450))         // unrelated
    ).toDF("doc_id", "text")
    val census = ContentChunks.chunkCensus(docs, minDocs = 2)
    val hits = census.as[(String, Long, Long, Long)].collect()
    assert(hits.nonEmpty, "no shared chunks found for a shifted duplicate")
    assert(hits.forall(_._2 == 2L), s"unrelated doc matched: ${hits.toSeq}")
  }

  test("profile reconciles: total_chars equals the input length, mean is exactly total/n") {
    val docs = Seq((1L, mkText(9, 300)), (2L, mkText(10, 64))).toDF("doc_id", "text")
    val prof = ContentChunks.chunkProfile(docs)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Double)].collect()
    assert(prof.map(_._4).toSeq == Seq(300L, 64L))
    prof.foreach { case (_, n, mx, tot, mean) =>
      assert(mx <= tot && n >= 1)
      assert(math.abs(mean - math.rint(tot.toDouble / n * 1e6) / 1e6) < 1e-12)
    }
  }
}
