package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = Seq(
    // doc 0's query = its first 4 tokens; "zebra" is rare (docs 0,1),
    // "the" is everywhere — idf must rank doc 1 above the the-only docs
    (0L, "zebra quantum the alpha"),
    (1L, "zebra runs"),
    (2L, "the the the the the the"),
    (3L, "alpha beta gamma delta extra"),
    (4L, "unrelated the words")
  ).toDF("doc_id", "text")

  test("bm25TopK: rare-term match outranks stopword-only match, self excluded") {
    val out = Retrieval.bm25TopK(fixture, Seq(0L), k = 4)
      .orderBy($"rk")
      .select("doc_id", "rk").as[(Long, Long)].collect()
    assert(!out.map(_._1).contains(0L), "query doc must be excluded")
    assert(out.map(_._2).toSeq == (1L to out.length).toSeq, "ranks contiguous from 1")
    // doc 1 shares "zebra" (df=2) — highest idf — must be rank 1
    assert(out.head._1 == 1L, s"expected zebra doc first, got ${out.toSeq}")
  }

  test("bm25TopK: scores are non-increasing with rank within each query") {
    val t = Tables(spark, sf0001)
    val rows = Retrieval.bm25TopK(t.documents, Seq(0L, 1L, 2L), k = 10)
      .select("query_id", "rk", "score").as[(Long, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRk = rs.sortBy(_._2).map(_._3)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b },
        s"query $q scores not monotone: ${byRk.toSeq}")
    }
  }

  test("bm25TopK: longer doc scores below shorter doc at equal tf (length normalization)") {
    val docs = Seq(
      (0L, "needle haystack"),
      (1L, "needle one two"),
      (2L, "needle one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq(0L), k = 2, qLen = 1)
      .orderBy($"rk").select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L), s"short doc must outrank long at equal tf: ${out.toSeq}")
  }

  test("rrfFuse: doc present in both rankings beats docs in only one; ties by doc_id") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "doc_id", "rk")
    val b = Seq((0L, 10L, 2L), (0L, 12L, 1L)).toDF("query_id", "doc_id", "rk")
    val out = Retrieval.rrfFuse(a, b, k = 3)
      .orderBy($"rk").select("doc_id", "rrf_score").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(10L, 12L, 11L), s"got ${out.toSeq}")
    // 10: 1/61 + 1/62; 12: 1/61; 11: 1/62 — fused score exact at 6dp
    assert(math.abs(out.head._2 - (0.016393 + 0.016129)) < 1e-9)
  }

  test("mmrTopK: identical twin is deferred in favor of a diverse pick") {
    // query 0; docs 1 and 2 are identical near-copies of the query
    // direction; doc 3 is distinct but still relevant. Plain top-k
    // ranks (1, 2, 3); MMR must rank the redundant twin BELOW the
    // diverse doc: (1, 3, 2).
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.1)),
      (1L, Seq(0.99, 0.1, 0.0, 0.1)),
      (2L, Seq(0.99, 0.1, 0.0, 0.1)),
      (3L, Seq(0.6, 0.0, 0.75, 0.1))
    ).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(vecs, Seq(0L), k = 3)
      .orderBy($"rk").select("neighbor_id").as[Long].collect().toSeq
    assert(topk == Seq(1L, 2L, 3L), s"plain ranking: $topk")
    // λ=0.5: the twin's penalty (sim 1.0 to the pick) must outweigh
    // its relevance edge over the diverse doc
    val mmr = Retrieval.mmrTopK(vecs, Seq(0L), k = 3, poolSize = 3, lambdaRel = 0.5)
      .orderBy($"rk").select("doc_id").as[Long].collect().toSeq
    assert(mmr == Seq(1L, 3L, 2L), s"mmr ranking: $mmr")
  }

  test("mmrTopK: ranks contiguous, picks within the pool, first pick is top-1") {
    val t = Tables(spark, sf0001)
    val out = Retrieval.mmrTopK(t.embeddings, Seq(0L, 1L), k = 5, poolSize = 10)
      .select("query_id", "doc_id", "rk").as[(Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 5L), s"query $q ranks")
      val pool = Similarity.bruteForceTopK(t.embeddings, Seq(q), k = 10)
        .select("neighbor_id").as[Long].collect().toSet
      assert(rows.map(_._2).forall(pool.contains), s"query $q picked outside pool")
      val top1 = Similarity.bruteForceTopK(t.embeddings, Seq(q), k = 1)
        .select("neighbor_id").as[Long].collect().head
      assert(rows.find(_._3 == 1L).get._2 == top1, s"query $q first pick != top-1")
    }
  }

  test("bm25 plan: corpus is never shuffled by the query side (broadcast scoring join)") {
    val t = Tables(spark, sf0001)
    val plan = Retrieval.bm25TopK(t.documents, Seq(0L), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast scoring join")
  }

  private def phraseFixture = Seq(
    (1L, "a b c a b c"),        // two non-overlapping matches of (a,b,c)
    (2L, "x x a b c y"),        // one match, off the doc head
    (3L, "a b x c"),            // bag-of-words hit, NOT a phrase match
    (4L, "c b a"),              // all terms present, wrong order
    (5L, "a b")                 // truncated phrase at end of doc
  ).toDF("doc_id", "text")

  test("phraseTopK: consecutive-token semantics, counts, ordering, absence") {
    val got = Retrieval.phraseTopK(phraseFixture, Seq("a", "b", "c"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only true phrase matches appear; count desc then id asc
    assert(got.toSeq === Seq((1L, 2L), (2L, 1L)))
  }

  test("phraseTopK: overlapping matches each count (anchor positions)") {
    val df = Seq((9L, "a a a a")).toDF("doc_id", "text")
    val got = Retrieval.phraseTopK(df, Seq("a", "a"), k = 5).head()
    assert((got.getLong(0), got.getLong(1)) === (9L, 3L))
  }

  test("phraseTopK: equals the per-doc HOF scan count on the corpus") {
    val t = Tables(spark, sf0001)
    val phrase = Seq("table", "part")
    val got = Retrieval.phraseTopK(t.documents, phrase, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // reference: per-doc array scan — count anchors i with
    // w[i]='table' and w[i+1]='part'
    val want = t.documents.selectExpr("doc_id",
        """aggregate(
          |  transform(sequence(0, greatest(size(split(trim(lower(text)), '\\s+')) - 2, 0)),
          |    i -> if(element_at(split(trim(lower(text)), '\\s+'), i + 1) = 'table' AND
          |            element_at(split(trim(lower(text)), '\\s+'), i + 2) = 'part', 1L, 0L)),
          |  0L, (acc, x) -> acc + x) AS n""".stripMargin)
      .filter(col("n") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture phrase never occurs — vacuous test")
  }

  test("phraseTopK: k bound and tie-break keep the boundary deterministic") {
    val df = Seq((3L, "p q"), (1L, "p q"), (2L, "p q")).toDF("doc_id", "text")
    val got = Retrieval.phraseTopK(df, Seq("p", "q"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L)) // equal counts: smallest ids win the boundary
  }

  test("phraseTopK guards") {
    intercept[IllegalArgumentException] {
      Retrieval.phraseTopK(phraseFixture, Seq("solo"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Retrieval.phraseTopK(phraseFixture, Seq("two words", "x"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Retrieval.phraseTopK(phraseFixture, Seq("a", "b"), k = 0)
    }
  }
}
