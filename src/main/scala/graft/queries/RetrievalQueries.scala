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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qs06_bm25_topk"  -> ((s: SparkSession, d: String) => bm25TopK(Tables(s, d))),
    "qs07_hybrid_rrf" -> ((s: SparkSession, d: String) => hybridRrf(Tables(s, d))),
    "qs08_int8_ann"   -> ((s: SparkSession, d: String) => int8Ann(Tables(s, d))),
  )

  def oracles: Map[String, String] = Map(
    "qs06_bm25_topk"  -> bm25TopKSql,
    "qs07_hybrid_rrf" -> hybridRrfSql,
    "qs08_int8_ann"   -> int8AnnSql,
  )
}
