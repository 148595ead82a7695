package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Scale evidence for the BPE trainer's central claim: merge learning
  * iterates over the distinct-WORD census, never the corpus — so
  * growing the corpus only grows the ONE census-building scan, while
  * the per-round cost tracks vocabulary size and stays flat.
  *
  * Drives [[Bpe.train]] at 1×/5×/10× corpus replication (replicas
  * reuse the same vocabulary, so the census is scale-invariant by
  * construction — the worst case FOR the claim, since any per-corpus
  * cost would stand out) and reports census size, census-build wall,
  * and per-round merge wall. Numbers land in NOTES_r{N}.
  * `runMain graft.tools.ProfileBpe [merges] [sfDir]`. */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val merges = args.headOption.map(_.toInt).getOrElse(16)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "bpe-profile")
    val docs0 = Tables(spark, dir).documents.select("doc_id", "text")

    for (reps <- Seq(1, 5, 10)) {
      val corpus = (0 until reps).map(k =>
          docs0.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .repartition(32)
        .localCheckpoint(true)
      val nDocs = corpus.count()

      val t0 = System.nanoTime()
      val census = Bpe.wordCounts(corpus).localCheckpoint(true)
      val vocab = census.count()
      val tokens = census.agg(sum(col("wc"))).head().getLong(0)
      val tCensus = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val (learned, _) = Bpe.train(corpus, merges)
      val tTrain = (System.nanoTime() - t1) / 1e9

      println(f"[bpe] reps=$reps%2d docs=$nDocs%7d tokens=$tokens%9d vocab=$vocab%6d " +
        f"census=$tCensus%6.2fs train(${learned.size} merges)=$tTrain%6.2fs " +
        f"per_round=${tTrain / learned.size}%5.2fs top=${learned.head.merged}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
