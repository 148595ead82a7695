package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.functions._

/** Scale evidence for the unigram trainer's census discipline (the
  * ProfileBpe twin): seeding and every EM round iterate over the
  * distinct-word census, never the corpus, so corpus replication may
  * only grow the one census-building scan. Replicas reuse the same
  * vocabulary — the census is scale-invariant by construction, the
  * worst case FOR the claim. Reports census size/build wall, seed+EM
  * wall per round, and the top piece (which must be replication-
  * invariant: training is a pure function of the census). Numbers land
  * in NOTES_r{N}. `runMain graft.tools.ProfileUnigram [rounds] [sfDir]`. */
object ProfileUnigram {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "unigram-profile")
    val docs0 = Tables(spark, dir).documents.select("doc_id", "text")

    var tops: Set[String] = Set.empty
    for (reps <- Seq(1, 5, 10)) {
      val corpus = (0 until reps).map(k =>
          docs0.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .repartition(32).localCheckpoint(true)
      val nDocs = corpus.count()

      val t0 = System.nanoTime()
      val census = Bpe.wordCounts(corpus).localCheckpoint(true)
      val vocabWords = census.count()
      val tCensus = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val pieces = Unigram.train(corpus, seedSize = 64, maxPieceLen = 4, emRounds = rounds)
      val tTrain = (System.nanoTime() - t1) / 1e9

      val topMulti = pieces.filter(_.piece.length > 1).head.piece
      tops += topMulti
      println(f"[unigram] reps=$reps%2d docs=$nDocs%7d words=$vocabWords%6d " +
        f"census=$tCensus%6.2fs train($rounds rounds)=$tTrain%6.2fs " +
        f"per_round=${tTrain / rounds}%5.2fs pieces=${pieces.size}%4d top_multi=$topMulti")
      spark.catalog.clearCache()
    }
    require(tops.size == 1, s"vocabulary not replication-invariant: $tops")
    spark.stop()
  }
}
