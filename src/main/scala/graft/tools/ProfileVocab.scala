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
  * Mode `natural` (round-12 verdict #2) measures the round-11
  * prediction that the per-round cap is an |alphabet| property: same
  * corpus shape (50k docs x 6 words over a ~50k-word pool) but words
  * drawn from a MULTI-SCRIPT alphabet (lowercase+uppercase Latin,
  * digits, punctuation, a 450-char CJK slice — ~550 distinct
  * characters vs the hex generator's 16). Prediction: early-round
  * merge counts rise roughly with |alphabet| and the 32k round count
  * collapses proportionally.
  *
  * `runMain graft.tools.ProfileVocab [bpe|wp|both|natural] [numMerges] [batchSize] [overFetch]`
  * (overFetch default 2 = the oracle-pinned window; wider windows test
  * the round-12 re-analysis that the window, not the alphabet, is the
  * tie-regime throttle). */
object ProfileVocab {

  /** Deterministic multi-script pseudo-word k of the natural pool. */
  private def naturalWord(k: Int): String = {
    val rnd = new java.util.Random(k * 2654435761L + 7)
    val len = 2 + rnd.nextInt(7)
    val sb = new StringBuilder
    val punct = "!?,.;:-_#@%&+*=()[]<>/|~^"
    (0 until len).foreach { _ =>
      k % 10 match {
        case s if s <= 3 => sb.append(('a' + rnd.nextInt(26)).toChar)
        case 4           => sb.append(('A' + rnd.nextInt(26)).toChar)
        case 5 | 6 | 7   => sb.append((0x4E00 + rnd.nextInt(450)).toChar) // BMP CJK, no surrogates
        case 8           => sb.append(('0' + rnd.nextInt(10)).toChar)
        case _           => sb.append(punct.charAt(rnd.nextInt(punct.length)))
      }
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val numMerges = args.drop(1).headOption.map(_.toInt).getOrElse(32000)
    val batchSize = args.drop(2).headOption.map(_.toInt).getOrElse(1024)
    val overFetch = args.drop(3).headOption.map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(appName = "vocab-profile")
    import spark.implicits._

    val synth =
      if (mode == "natural") {
        val alphabet = (0 until 49999).flatMap(naturalWord).distinct.size
        println(s"[vocab] natural corpus alphabet: $alphabet distinct chars " +
          "(hex generator: 16)")
        spark.range(50000).map { id =>
          (id, (0 until 6).map(j => naturalWord(((id * 31 + j * 7919) % 49999).toInt))
            .mkString(" "))
        }.toDF("doc_id", "text")
          .repartition(32).localCheckpoint(true)
      } else spark.range(50000).select(
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

    if (mode == "bpe" || mode == "both" || mode == "natural")
      drive("bpe", cb => Bpe.trainBatched(synth, numMerges,
        batchSize = batchSize, onRound = cb, overFetch = overFetch)._1)
    if (mode == "wp" || mode == "both" || mode == "natural")
      drive("wp ", cb => WordPiece.trainBatched(synth, numMerges,
        batchSize = batchSize, onRound = cb, overFetch = overFetch)._1)
    spark.stop()
  }
}
