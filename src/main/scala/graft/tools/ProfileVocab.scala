package graft.tools

import graft.GraftSession
import graft.operators.{Bpe, WordPiece}
import org.apache.spark.sql.functions._

/** Production-vocab tokenizer measurement (round-11 verdict #4): drive
  * [[Bpe.trainBatched]] / [[WordPiece.trainBatched]] to a 32k-merge
  * vocabulary over the synthetic ~50k-pseudo-word corpus (ProfileBpe's
  * generator — sf0.1 documents hold only ~100 distinct words, far too
  * few for a 32k vocab), reporting wall, driver round-trips, and
  * per-round census cost. Early rounds are symbol-starved by the
  * disjointness constraint (a 32-symbol alphabet admits at most ~16
  * disjoint merges whatever the batch size), so the round count is a
  * measured property of the algorithm, not ceil(V/batch).
  *
  * `runMain graft.tools.ProfileVocab [bpe|wp|both] [numMerges] [batchSize]` */
object ProfileVocab {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val numMerges = args.drop(1).headOption.map(_.toInt).getOrElse(32000)
    val batchSize = args.drop(2).headOption.map(_.toInt).getOrElse(1024)
    val spark = GraftSession.local(appName = "vocab-profile")

    val synth = spark.range(50000).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 6).map(j =>
          substring(md5(((col("id") * 31 + lit(j * 7919)) % 49999).cast("string")), 1, 8)): _*
      ).as("text"))
      .repartition(32).localCheckpoint(true)

    def drive(label: String,
              run: ((Int, Int, Double) => Unit) => Seq[Any]): Unit = {
      var rounds = 0
      var sumRound = 0.0
      var maxRound = 0.0
      val onRound = (round: Int, rank: Int, wall: Double) => {
        rounds = round
        sumRound += wall
        maxRound = math.max(maxRound, wall)
        if (round <= 5 || round % 5 == 0)
          println(f"[vocab] $label round=$round%3d merges=$rank%6d wall=$wall%6.2fs")
      }
      val t0 = System.nanoTime()
      val merges = run(onRound)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[vocab] $label TOTAL merges=${merges.size}%6d rounds=$rounds%4d " +
        f"wall=$wall%8.1fs mean_round=${sumRound / math.max(1, rounds)}%6.2fs " +
        f"max_round=$maxRound%6.2fs merges_per_sec=${merges.size / wall}%7.1f")
      spark.catalog.clearCache()
    }

    if (mode == "bpe" || mode == "both")
      drive("bpe", cb => Bpe.trainBatched(synth, numMerges,
        batchSize = batchSize, onRound = cb)._1)
    if (mode == "wp" || mode == "both")
      drive("wp ", cb => WordPiece.trainBatched(synth, numMerges,
        batchSize = batchSize, onRound = cb)._1)
    spark.stop()
  }
}
