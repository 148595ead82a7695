package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical + hybrid retrieval over the document corpus — the query
  * plane a training-data pipeline uses for corpus exploration, eval-set
  * neighbor audits, and RAG-style chunk search.
  *
  *  - [[bm25TopK]] — Okapi BM25 (the Lucene `1 +` idf variant, so every
  *    term contributes positively) over lowercased whitespace tokens.
  *  - [[rrfFuse]] — reciprocal-rank fusion (Cormack et al. 2009) of two
  *    rankings, the standard hybrid lexical+dense combiner: no score
  *    calibration needed, only ranks.
  *
  * Scale shape (100 TB): the corpus side is ONE explode + two hash
  * aggregations — the postings table `(doc, term, tf, dl)` (map-side
  * combined; `dl` rides along so no second doc-keyed join) and the
  * document-frequency table `(term, df)`. The query workload is small
  * by definition and is broadcast after picking up per-term idf, so
  * scoring is a broadcast hash join ON the postings scan — the corpus
  * is never self-joined and never shuffled by query. Per-query ranking
  * windows partition on query_id (cardinality = workload size, never
  * corpus size).
  *
  * Cross-engine determinism: the one transcendental (idf's `ln`) is
  * rounded to 6 decimals TOGETHER with its tf factor per (query, term,
  * doc) contribution and accumulated as DECIMAL(24,6) — the exact,
  * partition-order-independent sum (the qt12 nll pattern); `avgdl` is
  * one IEEE division of exact integer aggregates.
  */
object Retrieval {

  /** Top-k BM25 matches for each query doc: the query string is the
    * doc's first `qLen` tokens (distinct), the query doc itself is
    * excluded from its results. Output: `query_id, doc_id, score, rk`. */
  def bm25TopK(docs: DataFrame, queryIds: Seq[Long], k: Int,
               qLen: Int = 4, k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(qLen >= 1, s"qLen must be >= 1, got $qLen")
    val toks = docs.select(col(idCol), tokens(lower(col(textCol))).as("w"))
    // postings with dl riding along: one corpus shuffle, map-side combined
    val post = toks
      .select(col(idCol).as("p_doc"), size(col("w")).as("dl"), explode(col("w")).as("term"))
      .groupBy(col("p_doc"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dft = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(size(col("w"))).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val q = toks.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"),
              explode(array_distinct(slice(col("w"), 1, qLen))).as("term"))
    // per-(query, term) idf: tiny — build it small, THEN broadcast into
    // the postings scan so the corpus side streams through one
    // broadcast hash join
    val qidf = q.join(dft, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("term"),
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))).as("idf"),
        col("avgdl"))
    val tfc = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = post.join(broadcast(qidf), Seq("term"))
      .filter(col("p_doc") =!= col("query_id"))
      .select(col("query_id"), col("p_doc").as(idCol),
        round(col("idf") * tfc, 6).cast("decimal(24,6)").as("s"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("s")).cast("double").as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — the standard diversified-retrieval pass: from a
    * `poolSize` candidate pool per query, greedily select `k` docs
    * maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` (the
    * first pick has no selected set, so its score is `λ·rel`).
    *
    * Scale shape: the pool is top-`poolSize` per query (workload-
    * sized); pairwise sims exist only WITHIN a query's pool (pool²
    * per query, never corpus²); each greedy round is a couple of
    * equi joins + one per-query window on pool-sized frames, rounds
    * are driver-iterated like PageRank/CC with per-round
    * localCheckpoint. Determinism: rel and sims are round-6 cosines,
    * the MMR combination is mirrored IEEE arithmetic, ties break on
    * doc id — so the greedy trajectory is cross-engine identical and
    * the whole iterative selection has an exact unrolled-CTE oracle. */
  def mmrTopK(corpus: DataFrame, queryIds: Seq[Long], k: Int,
              poolSize: Int = 20, lambdaRel: Double = 0.7,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions._
    require(k >= 1 && poolSize >= k, s"need poolSize ($poolSize) >= k ($k) >= 1")
    val cands = Similarity.bruteForceTopK(corpus, queryIds, poolSize, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("cos_sim").as("rel"))
      .localCheckpoint(true)
    val v = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("vec"),
                          sqrt(norm2(col(vecCol))).as("nrm"))
    val ps = cands.select(col("query_id"), col("doc_id").as("d"))
      .join(v.select(col("doc_id").as("d"), col("vec").as("d_vec"), col("nrm").as("d_nrm")), "d")
      .join(cands.select(col("query_id"), col("doc_id").as("s")), "query_id")
      .filter(col("d") =!= col("s"))
      .join(v.select(col("doc_id").as("s"), col("vec").as("s_vec"), col("nrm").as("s_nrm")), "s")
      .select(col("query_id"), col("d"), col("s"),
        round(dot(col("d_vec"), col("s_vec")) / (col("d_nrm") * col("s_nrm")), 6).as("sim"))
      .localCheckpoint(true)
    val lam = lit(lambdaRel)
    val oneMinusLam = lit(1.0) - lit(lambdaRel)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr").desc, col("doc_id").asc)
    // UNROUNDED score: λ·rel − (1−λ)·ms of round-6 inputs lands ON
    // 7-decimal half boundaries, exactly where Spark's BigDecimal
    // HALF_UP and DuckDB's double rounding disagree (the qt13 lesson);
    // the raw IEEE double of identical operands is bit-identical
    def pick(scored: DataFrame, rk: Int) = scored
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("query_id"), col("doc_id"), col("mmr").as("mmr_score"),
              lit(rk.toLong).as("rk"))
    var selected = pick(cands.withColumn("mmr", lam * col("rel")), 1).localCheckpoint(true)
    var remaining = cands.join(selected.select(col("query_id"), col("doc_id")),
      Seq("query_id", "doc_id"), "left_anti")
    for (i <- 2 to k) {
      // max similarity of every pool doc to the selected set, then the
      // MMR combination on the remaining docs
      val selSims = ps
        .join(selected.select(col("query_id"), col("doc_id").as("s")), Seq("query_id", "s"))
        .groupBy(col("query_id"), col("d").as("doc_id"))
        .agg(max(col("sim")).as("ms"))
      val scored = remaining.join(selSims, Seq("query_id", "doc_id"))
        .select(col("query_id"), col("doc_id"),
          (lam * col("rel") - oneMinusLam * col("ms")).as("mmr"))
      val next = pick(scored, i).localCheckpoint(true)
      selected = selected.unionByName(next)
      remaining = remaining.join(next.select(col("query_id"), col("doc_id")),
        Seq("query_id", "doc_id"), "left_anti")
    }
    selected
  }

  /** Reciprocal-rank fusion of two rankings `(query_id, doc_id, rk)`:
    * rrf = Σ 1/(kConst + rk) over the rankings that contain the doc,
    * re-ranked per query, top `k` kept. Each reciprocal is rounded to 6
    * decimals and summed as DECIMAL so the fused score is exact and
    * engine-independent. Output: `query_id, doc_id, rrf_score, rk`. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, kConst: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def r(df: DataFrame, as: String) =
      df.select(col("query_id"), col("doc_id"), col("rk").as(as))
    val fused = r(a, "rk_a").join(r(b, "rk_b"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(round(lit(1.0) / (lit(kConst) + col("rk_a")), 6).cast("decimal(18,6)"),
                  lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")) +
         coalesce(round(lit(1.0) / (lit(kConst) + col("rk_b")), 6).cast("decimal(18,6)"),
                  lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")))
          .cast("double").as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    fused.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Exact phrase search — the POSITIONAL query BM25's bag-of-words
    * postings cannot answer ("spark shuffle partition" as consecutive
    * tokens, not three independent terms). The index shape is the
    * production one: positional postings `(doc, pos, term)` restricted
    * to the phrase's terms AT THE SCAN (the term filter prunes before
    * anything shuffles — for an n-term phrase over a V-term corpus the
    * surviving postings are ~n/V of the token stream), then n−1
    * adjacency equi-joins keyed on (doc, pos+i) — each join side
    * phrase-term-sized, never corpus-sized. Matches may not overlap a
    * document boundary by construction; overlapping in-doc matches
    * each count (a match is an anchor position).
    *
    * Output: top `k` docs by `(n_matches DESC, id ASC)` — the id
    * tie-break makes the k-boundary deterministic (TakeOrderedAndProject,
    * never a global sort). All-integer: nothing to round. */
  def phraseTopK(docs: DataFrame, phrase: Seq[String], k: Int,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 terms, got ${phrase.size}")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase terms must be non-empty single tokens: $phrase")
    require(k >= 1, s"k must be >= 1, got $k")
    // postings restricted to phrase terms: tiny — pin them so the n−1
    // adjacency joins don't re-derive the corpus scan per term
    val toks = docs.select(col(idCol),
        posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase: _*))
      .localCheckpoint()
    var m = toks.filter(col("tok") === phrase.head)
      .select(col(idCol), col("pos"))
    for (i <- 1 until phrase.size) {
      val ti = toks.filter(col("tok") === phrase(i))
        .select(col(idCol).as("id2"), col("pos").as("p2"))
      m = m.join(ti, m(idCol) === col("id2") && col("p2") === m("pos") + i)
        .select(m(idCol), m("pos"))
    }
    m.groupBy(col(idCol)).agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col(idCol).asc)
      .limit(k)
  }
}
