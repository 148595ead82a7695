package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class BloomDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives: every true dup passes the filter, anti-join answer preserved") {
    val t = Tables(spark, sf0001)
    val corpus = t.documents
    val bf = BloomDedup.buildFilter(corpus, expectedItems = 1000L)
    // batch: 5 docs copied from the corpus (true dups) + 5 novel docs
    val dups = corpus.filter($"doc_id" < 5)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val novel = (0 until 5).map(i => (2000000L + i, s"novel doc $i with words nowhere in the corpus"))
      .toDF("doc_id", "text")
    val batch = dups.union(novel)
    val out = BloomDedup.exactDedupAgainst(batch, corpus, bf)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    (0 until 5).foreach(i => assert(out(1000000L + i), s"dup $i missed"))
    (0 until 5).foreach(i => assert(!out(2000000L + i), s"novel $i misflagged"))
  }

  test("the filter screens out (nearly) all novel rows before any join") {
    val t = Tables(spark, sf0001)
    val bf = BloomDedup.buildFilter(t.documents, expectedItems = 1000L)
    val novel = (0 until 1000).map(i => (i.toLong, s"synthetic unseen text number $i"))
      .toDF("doc_id", "text")
    val passed = novel.filter(BloomDedup.mightContain(bf, $"text")).count()
    // ~2% fpp at 8 bits/item; allow generous slack
    assert(passed < 100, s"filter passed $passed of 1000 novel rows")
  }

  test("empty corpus builds a real filter that answers false everywhere") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val bf = BloomDedup.buildFilter(empty, expectedItems = 100L)
    assert(bf != null && bf.nonEmpty) // not the aggregate's NULL
    val batch = (0 until 20).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    assert(batch.filter(BloomDedup.mightContain(bf, $"text")).count() == 0)
    val out = BloomDedup.exactDedupAgainst(batch, empty, bf)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect()
    assert(out.length == 20 && out.forall(!_._2))
  }

  test("oversized filters fail loudly instead of silently clamping") {
    val t = Tables(spark, sf0001)
    val eItems = intercept[IllegalArgumentException] {
      BloomDedup.buildFilter(t.documents, expectedItems = 100000000000L)
    }
    assert(eItems.getMessage.contains("maxNumItems"))
    val eBits = intercept[IllegalArgumentException] {
      BloomDedup.buildFilter(t.documents, expectedItems = 1000L, numBits = 1L << 40)
    }
    assert(eBits.getMessage.contains("maxNumBits"))
    // degenerate capacity is rejected, not an exception-from-the-fallback
    val eZero = intercept[IllegalArgumentException] {
      BloomDedup.buildFilter(t.documents.limit(0), expectedItems = 0L)
    }
    assert(eZero.getMessage.contains("expectedItems"))
  }

  test("filter bytes survive a round-trip through storage") {
    val t = Tables(spark, sf0001)
    val bf = BloomDedup.buildFilter(t.documents, expectedItems = 1000L)
    val p = java.nio.file.Files.createTempFile("graft-bloom", ".bin")
    java.nio.file.Files.write(p, bf)
    val back = java.nio.file.Files.readAllBytes(p)
    val hits = t.documents.filter(BloomDedup.mightContain(back, $"text")).count()
    assert(hits == t.documents.count()) // every corpus doc must hit its own filter
  }
}
