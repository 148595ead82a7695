package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** ANN recall harness (dev tool): measure recall@k of the LSH and IVF
  * probes against the exact [[Similarity.bruteForceTopK]] baseline
  * across their tuning axes (planes/tables for LSH, nCells/nProbe for
  * IVF) — the same measured-table treatment [[DedupEval]] gives the
  * dedup funnels. Prints one table; numbers land in NOTES_r{N}.
  * `runMain graft.tools.AnnEval [sfDir]`. */
object AnnEval {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(appName = "ann-eval")
    import spark.implicits._

    val emb = Tables(spark, dir).embeddings.localCheckpoint(true)
    val n = emb.count()
    // deterministic query set: every ceil(n/32)-th id, 32 queries
    val ids = emb.select($"vec_id").orderBy($"vec_id").as[Long].collect()
    val queryIds = ids.grouped(math.max(1, ids.length / 32)).map(_.head).take(32).toSeq
    val k = 10
    println(s"[ann-eval] corpus $n vectors, ${queryIds.size} queries, recall@$k vs brute force")

    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

    val t0 = System.nanoTime()
    val truth = topSets(Similarity.bruteForceTopK(emb, queryIds, k))
    val bruteSec = (System.nanoTime() - t0) / 1e9
    println(f"[ann-eval] brute-force baseline: $bruteSec%6.2f s")

    def score(name: String, df: => DataFrame): Unit = {
      val s0 = System.nanoTime()
      val got = topSets(df)
      val sec = (System.nanoTime() - s0) / 1e9
      val recalls = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      val mean = recalls.sum / recalls.size
      println(f"[ann-eval] $name%-28s recall@$k ${mean}%6.3f  wall $sec%6.2f s  (x${bruteSec / sec}%4.2f vs brute)")
      spark.catalog.clearCache()
    }

    for (planes <- Seq(4, 6, 8); tables <- Seq(1, 2, 4))
      score(s"lsh planes=$planes tables=$tables",
        Similarity.lshTopK(emb, queryIds, k, planes = planes, tables = tables))
    for (nCells <- Seq(8, 16); nProbe <- Seq(1, 2, 4, 8) if nProbe <= nCells)
      score(s"ivf cells=$nCells probe=$nProbe",
        Similarity.ivfTopK(emb, queryIds, k, nCells = nCells, nProbe = nProbe))

    // int8 row: how much recall the 4x-smaller dequantized index loses
    // against the float baseline (exact search over dequantized vectors
    // — isolates QUANTIZATION loss from bucketing loss)
    score("int8 dequantized exact", {
      val deq = graft.operators.Quantization.int8(emb)
        .select($"vec_id", $"deq".as("embedding"))
      Similarity.bruteForceTopK(deq, queryIds, k)
    })

    spark.stop()
  }
}
