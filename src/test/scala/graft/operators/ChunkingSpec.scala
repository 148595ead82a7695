package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(n: Int) = Seq((1L, (0 until n).map(i => s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  test("chunks stride by size-overlap, keep the partial tail, and reconstruct") {
    val out = Chunking.chunkByTokens(doc(80), chunkSize = 32, overlap = 8)
      .orderBy("chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._3).toSeq == Seq(32L, 32L, 32L, 8L))
    val toks = out.map(_._4.split(" ").toSeq)
    // overlap: each chunk starts with the previous chunk's last 8 tokens
    toks.sliding(2).foreach { w => assert(w(0).takeRight(8) == w(1).take(8)) }
    // dropping each chunk's 8-token overlap prefix reconstructs the doc
    val rebuilt = toks.head ++ toks.tail.flatMap(_.drop(8))
    assert(rebuilt == (0 until 80).map(i => s"w$i"))
  }

  test("doc shorter than one chunk yields a single full-doc chunk") {
    val out = Chunking.chunkByTokens(doc(5), 32, 8)
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 1 && out.head._3 == 5L)
  }

  test("chunkByTokens rejects overlap >= chunkSize") {
    intercept[IllegalArgumentException](Chunking.chunkByTokens(doc(5), 8, 8))
  }

  test("chunking plan is shuffle-free (projection + generate only)") {
    val plan = Chunking.chunkByTokens(doc(80), 32, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("packing: bins cover all docs, respect contiguity, and are shuffle-invariant") {
    val docs = graft.Tables(spark, sf0001).documents
    val out = Chunking.packSequences(docs, budget = 256, shards = 8)
    val rows = out.as[(Int, Long, Long, Long)].collect()
    assert(rows.map(_._3).sum == docs.count())      // every doc in exactly one bin
    assert(rows.map(_._1).distinct.length <= 8)
    // a bin holds > 1 doc only if its tokens-before stayed under budget:
    // bin_tokens minus its last doc must be < budget + last-doc tokens —
    // weaker but structural: no bin exceeds budget by more than one doc
    val maxDoc = docs.select(max(size(split(trim(col("text")), "\\s+"))))
      .as[Int].head()
    assert(rows.forall { case (_, _, n, tok) => n == 1 || tok < 256 + maxDoc })
    val shuffled = Chunking.packSequences(docs.repartition(13), 256, 8)
      .as[(Int, Long, Long, Long)].collect()
    assert(shuffled.sortBy(r => (r._1, r._2)).toSeq == rows.sortBy(r => (r._1, r._2)).toSeq)
  }
}
