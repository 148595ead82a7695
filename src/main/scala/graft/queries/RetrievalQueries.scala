package graft.queries

import graft.Tables
import graft.operators.{Retrieval, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval plane: lexical BM25 search and hybrid lexical+dense
  * fusion over the document corpus (the `embeddings` table's `vec_id`
  * is the document's id, so the dense side is a first-class ranking of
  * the same corpus).
  *
  * Both queries are exactly oracle-checked: BM25's one transcendental
  * (idf) is rounded per term-contribution and summed as DECIMAL, and
  * RRF is a pure function of integer ranks.
  */
object RetrievalQueries {

  private val QueryIds: Seq[Long] = 0L until 10L

  /** qs06: BM25 top-10 per query — query = first 4 tokens of docs
    * 0..9, Lucene `ln(1 + …)` idf, k1=1.2, b=0.75. */
  def bm25TopK(t: Tables): DataFrame = {
    import t.spark.implicits._
    Retrieval.bm25TopK(t.documents, QueryIds, k = 10).orderBy($"query_id", $"rk")
  }

  val bm25TopKSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') w FROM documents),
      |post AS (SELECT doc_id p_doc, tok term, COUNT(*) tf, MAX(dl) dl FROM (
      |    SELECT doc_id, len(w) dl, unnest(w) tok FROM toks) GROUP BY 1, 2),
      |dft AS (SELECT term, COUNT(*) df FROM post GROUP BY 1),
      |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) n,
      |    CAST(SUM(len(w)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) avgdl FROM toks),
      |q AS (SELECT doc_id query_id, unnest(list_distinct(w[1:4])) term
      |  FROM toks WHERE doc_id IN (0,1,2,3,4,5,6,7,8,9)),
      |qidf AS (SELECT query_id, term,
      |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) idf, avgdl
      |  FROM q JOIN dft USING (term) CROSS JOIN stats),
      |terms AS (SELECT query_id, p_doc doc_id,
      |    CAST(round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
      |         AS DECIMAL(24,6)) s
      |  FROM post JOIN qidf USING (term) WHERE p_doc <> query_id),
      |scored AS (SELECT query_id, doc_id, CAST(SUM(s) AS DOUBLE) score
      |  FROM terms GROUP BY 1, 2)
      |SELECT query_id, doc_id, score, rk FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS BIGINT) rk
      |  FROM scored)
      |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** qs07: hybrid retrieval — RRF fusion (kConst=60) of the BM25
    * top-20 and the embedding-cosine top-20 of the same query ids,
    * fused top-10 per query. */
  def hybridRrf(t: Tables): DataFrame = {
    import t.spark.implicits._
    val lexical = Retrieval.bm25TopK(t.documents, QueryIds, k = 20)
    val dense = Similarity.bruteForceTopK(t.embeddings, QueryIds, k = 20)
      .select($"query_id", $"neighbor_id".as("doc_id"), $"rk")
    Retrieval.rrfFuse(lexical, dense, k = 10).orderBy($"query_id", $"rk")
  }

  val hybridRrfSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') w FROM documents),
      |post AS (SELECT doc_id p_doc, tok term, COUNT(*) tf, MAX(dl) dl FROM (
      |    SELECT doc_id, len(w) dl, unnest(w) tok FROM toks) GROUP BY 1, 2),
      |dft AS (SELECT term, COUNT(*) df FROM post GROUP BY 1),
      |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) n,
      |    CAST(SUM(len(w)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) avgdl FROM toks),
      |q AS (SELECT doc_id query_id, unnest(list_distinct(w[1:4])) term
      |  FROM toks WHERE doc_id IN (0,1,2,3,4,5,6,7,8,9)),
      |qidf AS (SELECT query_id, term,
      |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) idf, avgdl
      |  FROM q JOIN dft USING (term) CROSS JOIN stats),
      |terms AS (SELECT query_id, p_doc doc_id,
      |    CAST(round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
      |         AS DECIMAL(24,6)) s
      |  FROM post JOIN qidf USING (term) WHERE p_doc <> query_id),
      |bscored AS (SELECT query_id, doc_id, CAST(SUM(s) AS DOUBLE) score
      |  FROM terms GROUP BY 1, 2),
      |lex AS (SELECT query_id, doc_id, rk FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS BIGINT) rk
      |  FROM bscored) WHERE rk <= 20),
      |qv AS (SELECT vec_id query_id, embedding::DOUBLE[] q_vec,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) q_nrm
      |  FROM embeddings WHERE vec_id < 10),
      |cv AS (SELECT vec_id doc_id, embedding::DOUBLE[] c_vec,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) c_nrm
      |  FROM embeddings),
      |sims AS (SELECT query_id, doc_id,
      |    round(list_dot_product(q_vec, c_vec) / (q_nrm * c_nrm), 6) cos_sim
      |  FROM cv JOIN qv ON doc_id <> query_id),
      |den AS (SELECT query_id, doc_id, rk FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY cos_sim DESC, doc_id ASC) AS BIGINT) rk
      |  FROM sims) WHERE rk <= 20),
      |fused AS (SELECT query_id, doc_id,
      |    CAST(COALESCE(CAST(round(1.0 / (60 + a.rk), 6) AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)))
      |       + COALESCE(CAST(round(1.0 / (60 + b.rk), 6) AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)))
      |         AS DOUBLE) rrf_score
      |  FROM (SELECT query_id, doc_id, rk FROM lex) a
      |  FULL OUTER JOIN (SELECT query_id, doc_id, rk FROM den) b USING (query_id, doc_id))
      |SELECT query_id, doc_id, rrf_score, rk FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) rk
      |  FROM fused)
      |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** qs08: ANN over int8-quantized embeddings — per-dimension min/max
    * calibration, search on the dequantized reconstruction. The memory
    * lever for the embedding tier; exactness of the whole quantize →
    * dequantize → rank funnel is oracle-checked, recall vs float
    * search is spec-checked. */
  def int8Ann(t: Tables): DataFrame = {
    import t.spark.implicits._
    val deq = graft.operators.Quantization.int8(t.embeddings)
      .select($"vec_id", $"deq".as("embedding"))
    Similarity.bruteForceTopK(deq, QueryIds, k = 5).orderBy($"query_id", $"rk")
  }

  val int8AnnSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
      |d AS (SELECT i, MIN(e[i+1]) mn, MAX(e[i+1]) mx
      |  FROM v CROSS JOIN (SELECT unnest(range(0,64)) i) t GROUP BY i),
      |cal AS (SELECT list(mn ORDER BY i) mins, list(mx ORDER BY i) maxs FROM d),
      |q AS (SELECT vec_id, list_transform(e, (x, i) ->
      |    CASE WHEN maxs[i] = mins[i] THEN 0.0
      |      ELSE round((x - mins[i]) / (maxs[i] - mins[i]) * 255.0, 0) END) q8
      |  FROM v CROSS JOIN cal),
      |dq AS (SELECT vec_id, list_transform(q8, (qv, i) ->
      |    mins[i] + qv / 255.0 * (maxs[i] - mins[i])) e
      |  FROM q CROSS JOIN cal),
      |qs AS (SELECT vec_id query_id, e q_vec, sqrt(list_dot_product(e, e)) q_nrm
      |  FROM dq WHERE vec_id < 10),
      |c AS (SELECT vec_id neighbor_id, e c_vec, sqrt(list_dot_product(e, e)) c_nrm FROM dq),
      |sims AS (SELECT query_id, neighbor_id,
      |    round(list_dot_product(q_vec, c_vec) / (q_nrm * c_nrm), 6) cos_sim
      |  FROM c JOIN qs ON neighbor_id <> query_id)
      |SELECT query_id, neighbor_id, cos_sim, rk FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) rk
      |  FROM sims)
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  /** qs09: MMR diversified retrieval — greedy λ=0.7 re-ranking of the
    * top-20 cosine pool down to 5 diverse picks per query. The greedy
    * trajectory is deterministic (round-6 cosines, mirrored IEEE MMR
    * arithmetic, doc-id ties), so the iterative selection matches an
    * unrolled-CTE DuckDB oracle step for step. */
  def mmrDiverse(t: Tables): DataFrame = {
    import t.spark.implicits._
    Retrieval.mmrTopK(t.embeddings, QueryIds, k = 5, poolSize = 20)
      .orderBy($"query_id", $"rk")
  }

  val mmrDiverseSql: String = {
    def step(i: Int, prevSel: String) =
      s"""m$i AS (SELECT ps.query_id, ps.d doc_id, MAX(ps.sim) ms
         |  FROM ps JOIN $prevSel sl ON sl.query_id = ps.query_id AND sl.doc_id = ps.s
         |  GROUP BY 1, 2),
         |sc$i AS (SELECT r.query_id, r.doc_id,
         |    CAST(0.7 AS DOUBLE) * r.rel - (1.0 - CAST(0.7 AS DOUBLE)) * m.ms mmr
         |  FROM cand r JOIN m$i m USING (query_id, doc_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM $prevSel s0
         |    WHERE s0.query_id = r.query_id AND s0.doc_id = r.doc_id)),
         |s$i AS (SELECT query_id, doc_id, mmr mmr_score, CAST($i AS BIGINT) rk FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr DESC, doc_id ASC) rn
         |    FROM sc$i) WHERE rn = 1),
         |sel$i AS (SELECT query_id, doc_id FROM $prevSel UNION ALL SELECT query_id, doc_id FROM s$i)""".stripMargin
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] e,
       |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id query_id, e q_vec, nrm q_nrm FROM v WHERE vec_id < 10),
       |sims AS (SELECT query_id, v.vec_id doc_id,
       |    round(list_dot_product(q_vec, v.e) / (q_nrm * v.nrm), 6) rel
       |  FROM v JOIN q ON v.vec_id <> query_id),
       |cand AS (SELECT query_id, doc_id, rel FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) rn
       |    FROM sims) WHERE rn <= 20),
       |ps AS (SELECT c1.query_id, c1.doc_id d, c2.doc_id s,
       |    round(list_dot_product(v1.e, v2.e) / (v1.nrm * v2.nrm), 6) sim
       |  FROM cand c1 JOIN cand c2 ON c1.query_id = c2.query_id AND c1.doc_id <> c2.doc_id
       |  JOIN v v1 ON v1.vec_id = c1.doc_id JOIN v v2 ON v2.vec_id = c2.doc_id),
       |s1 AS (SELECT query_id, doc_id,
       |    CAST(0.7 AS DOUBLE) * rel mmr_score, CAST(1 AS BIGINT) rk FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY CAST(0.7 AS DOUBLE) * rel DESC, doc_id ASC) rn
       |    FROM cand) WHERE rn = 1),
       |sel1 AS (SELECT query_id, doc_id FROM s1),
       |${step(2, "sel1")},
       |${step(3, "sel2")},
       |${step(4, "sel3")},
       |${step(5, "sel4")}
       |SELECT query_id, doc_id, mmr_score, rk FROM (
       |  SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
       |  UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5)
       |ORDER BY query_id, rk""".stripMargin
  }

  /** qs11: retrieval quality metrics — the eval half of the retrieval
    * plane: score the dense brute-force top-10 (qs01's ranking, k=10)
    * against label agreement as the relevance truth (a neighbor is
    * relevant iff it shares the query's `label`; self excluded by the
    * ranking). Per query: rank of the first relevant hit, reciprocal
    * rank, precision@10; one TOTAL row macro-averages them (MRR /
    * mean P@10). Shapes: the ranking is qs01's (broadcast queries into
    * the corpus scan, per-query top-k window); neighbor labels attach
    * by equi join on the TOP-K frame only (queries×k rows, not the
    * corpus); metrics are one tiny agg. Exactness: rr = round-6 of
    * 1/rank (no 6-decimal midpoints exist among 1/1..1/10), macro
    * averages are DECIMAL sums divided by integer counts — one IEEE
    * division, left unrounded per the cross-engine contract. */
  def retrievalMetrics(t: Tables): DataFrame = {
    import t.spark.implicits._
    val qLabels = t.embeddings.filter($"vec_id".isin(QueryIds: _*))
      .select($"vec_id".as("query_id"), $"label".as("q_label"))
    val nLabels = t.embeddings.select($"vec_id".as("neighbor_id"), $"label".as("n_label"))
    val per0 = Similarity.bruteForceTopK(t.embeddings, QueryIds, k = 10)
      .join(nLabels, Seq("neighbor_id"))
      .join(broadcast(qLabels), Seq("query_id"))
      .withColumn("rel", ($"n_label" === $"q_label").cast("long"))
      .groupBy($"query_id", $"q_label")
      .agg(min(when($"rel" === 1L, $"rk")).as("first_rel_rank"),
           sum($"rel").as("n_rel"))
      .select($"query_id", $"q_label", $"first_rel_rank",
        when($"first_rel_rank".isNotNull,
             round(lit(1.0) / $"first_rel_rank".cast("double"), 6))
          .otherwise(lit(0.0)).as("rr"),
        ($"n_rel".cast("double") / lit(10.0)).as("p_at_10"),
        $"n_rel")
    // materialize the queries-row frame once so the TOTAL branch of the
    // union aggregates the 10-row result instead of re-scoring the
    // corpus (a Union recomputes each branch's full subtree)
    val per = per0.localCheckpoint()
    val total = per.agg(
        sum($"rr".cast("decimal(20,6)")).as("rrS"),
        sum($"n_rel").as("n_rel"),
        count(lit(1)).as("nq"))
      .select(lit(-1L).as("query_id"), lit(null).cast("int").as("q_label"),
        lit(null).cast("long").as("first_rel_rank"),
        ($"rrS".cast("double") / $"nq".cast("double")).as("rr"),
        ($"n_rel".cast("double") / ($"nq" * 10).cast("double")).as("p_at_10"),
        $"n_rel")
    per.unionByName(total).orderBy($"query_id")
  }

  val retrievalMetricsSql: String =
    """WITH q AS (SELECT vec_id query_id, label q_label, embedding::DOUBLE[] q_vec,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) q_nrm
      |  FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id neighbor_id, label n_label, embedding::DOUBLE[] c_vec,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) c_nrm
      |  FROM embeddings),
      |sims AS (SELECT query_id, q_label, neighbor_id, n_label,
      |    round(list_dot_product(q_vec, c_vec) / (q_nrm * c_nrm), 6) cos_sim
      |  FROM c JOIN q ON neighbor_id <> query_id),
      |top AS (SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) rk
      |    FROM sims) WHERE rk <= 10),
      |per AS (SELECT query_id, q_label,
      |    CAST(MIN(CASE WHEN n_label = q_label THEN rk END) AS BIGINT) first_rel_rank,
      |    CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT) n_rel
      |  FROM top GROUP BY 1, 2),
      |per2 AS (SELECT query_id, q_label, first_rel_rank,
      |    CASE WHEN first_rel_rank IS NOT NULL THEN round(1.0 / first_rel_rank, 6)
      |         ELSE 0.0 END rr,
      |    CAST(n_rel AS DOUBLE) / 10.0 p_at_10, n_rel FROM per),
      |tot AS (SELECT CAST(-1 AS BIGINT) query_id, CAST(NULL AS INTEGER) q_label,
      |    CAST(NULL AS BIGINT) first_rel_rank,
      |    CAST(SUM(CAST(rr AS DECIMAL(20,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) rr,
      |    CAST(SUM(n_rel) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 10.0) p_at_10,
      |    CAST(SUM(n_rel) AS BIGINT) n_rel FROM per2)
      |SELECT * FROM per2 UNION ALL SELECT * FROM tot ORDER BY query_id""".stripMargin

  /** qs13: reciprocal k-NN graph — [[Similarity.mutualKnn]] (k = 5
    * within 8 IVF cells): the hub-filtered edge set semantic
    * clustering starts from. Oracle replays the qd13 cell assignment,
    * the per-id in-cell top-k window, and the reversed-pair self-join
    * verbatim. */
  def mutualKnnGraph(t: Tables): DataFrame = {
    import t.spark.implicits._
    Similarity.mutualKnn(t.embeddings, nCells = 8, k = 5)
      .orderBy($"a_id", $"b_id")
  }

  val mutualKnnGraphSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] e,
      |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) nrm2 FROM embeddings),
      |cent AS (SELECT (ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)) - 1 AS cell,
      |    e c_vec, nrm2 c_nrm2
      |  FROM v ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8),
      |scored AS (SELECT v.vec_id, v.e, v.nrm2, cent.cell,
      |    cent.c_nrm2 - 2 * list_dot_product(v.e, cent.c_vec) AS score
      |  FROM v CROSS JOIN cent),
      |assigned AS (SELECT vec_id, e, nrm2, cell FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score ASC, cell ASC) rn
      |    FROM scored) WHERE rn = 1),
      |sims AS (SELECT a.vec_id a_id, b.vec_id b_id,
      |    round(list_dot_product(a.e, b.e) / (sqrt(a.nrm2) * sqrt(b.nrm2)), 6) cos_sim
      |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
      |rk AS (SELECT a_id, b_id, cos_sim,
      |    CAST(row_number() OVER (PARTITION BY a_id ORDER BY cos_sim DESC, b_id ASC) AS BIGINT) rk
      |  FROM sims),
      |kept AS (SELECT * FROM rk WHERE rk <= 5)
      |SELECT x.a_id, x.b_id, x.cos_sim, x.rk AS rk_ab, y.rk AS rk_ba
      |FROM kept x JOIN kept y ON y.a_id = x.b_id AND y.b_id = x.a_id
      |WHERE x.a_id < x.b_id ORDER BY x.a_id, x.b_id""".stripMargin

  /** qs26: exact phrase search ([[graft.operators.Retrieval.phraseTopK]])
    * — the positional query the BM25 bag-of-words postings can't
    * answer. The phrase "spark shuffle partition" is planted (the qt09
    * discipline) repeated 1 + doc_id%3 times at the head of every
    * doc_id%11 doc, so match counts span {1,2,3} and the top-10
    * k-boundary exercises the (n_matches DESC, doc_id ASC) tie-break;
    * "spark" also occurs in the natural vocabulary, pinning that a
    * unigram hit without its successors is NOT a phrase match. The
    * oracle replays the positional postings and both adjacency joins
    * (generate_subscripts ordinality; 1-based positions — adjacency is
    * offset-invariant). */
  def phraseSearch(t: Tables): DataFrame = {
    import t.spark.implicits._
    val docs = t.documents.select($"doc_id",
      when($"doc_id" % 11 === 0,
        concat(expr("repeat('spark shuffle partition ', cast(1 + doc_id % 3 as int))"),
          $"text"))
        .otherwise($"text").as("text"))
    Retrieval.phraseTopK(docs, Seq("spark", "shuffle", "partition"), k = 10)
      .orderBy($"n_matches".desc, $"doc_id".asc)
  }

  val phraseSearchSql: String =
    """WITH p AS (SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0
      |      THEN repeat('spark shuffle partition ', CAST(1 + doc_id % 3 AS INT)) || text
      |      ELSE text END AS text
      |  FROM documents),
      |w0 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') w FROM p),
      |toks AS (SELECT doc_id, unnest(w) tok, generate_subscripts(w, 1) pos FROM w0),
      |m1 AS (SELECT doc_id, pos FROM toks WHERE tok = 'spark'),
      |m2 AS (SELECT m1.doc_id, m1.pos FROM m1 JOIN toks t
      |  ON t.doc_id = m1.doc_id AND t.pos = m1.pos + 1 AND t.tok = 'shuffle'),
      |m3 AS (SELECT m2.doc_id, m2.pos FROM m2 JOIN toks t
      |  ON t.doc_id = m2.doc_id AND t.pos = m2.pos + 2 AND t.tok = 'partition')
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_matches
      |FROM m3 GROUP BY doc_id
      |ORDER BY n_matches DESC, doc_id ASC LIMIT 10""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qs26_phrase_search" -> ((s: SparkSession, d: String) => phraseSearch(Tables(s, d))),
    "qs13_mutual_knn" -> ((s: SparkSession, d: String) => mutualKnnGraph(Tables(s, d))),
    "qs11_retrieval_metrics" -> ((s: SparkSession, d: String) => retrievalMetrics(Tables(s, d))),
    "qs06_bm25_topk"  -> ((s: SparkSession, d: String) => bm25TopK(Tables(s, d))),
    "qs07_hybrid_rrf" -> ((s: SparkSession, d: String) => hybridRrf(Tables(s, d))),
    "qs08_int8_ann"   -> ((s: SparkSession, d: String) => int8Ann(Tables(s, d))),
    "qs09_mmr_diverse" -> ((s: SparkSession, d: String) => mmrDiverse(Tables(s, d))),
  )

  def oracles: Map[String, String] = Map(
    "qs26_phrase_search" -> phraseSearchSql,
    "qs13_mutual_knn" -> mutualKnnGraphSql,
    "qs11_retrieval_metrics" -> retrievalMetricsSql,
    "qs06_bm25_topk"  -> bm25TopKSql,
    "qs07_hybrid_rrf" -> hybridRrfSql,
    "qs08_int8_ann"   -> int8AnnSql,
    "qs09_mmr_diverse" -> mmrDiverseSql,
  )
}
