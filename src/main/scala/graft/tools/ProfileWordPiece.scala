package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.WordPiece
import org.apache.spark.sql.functions._

/** Scale evidence for [[WordPiece.trainBatched]] — the ProfileBpe
  * batch leg applied to the likelihood-scored trainer: strict
  * WordPiece costs one (pair census + symbol census + argmax) Spark
  * round-trip per merge; batched learns up to batchSize symbol-
  * disjoint merges per census, so a 30k-piece BERT vocabulary needs
  * ~V/batchSize rounds, not V.
  *
  * Legs: (1) real corpus, strict vs batched to the same merge budget;
  * (2) synthetic ~50k-pseudo-word corpus (ProfileBpe's generator) at
  * 1k/8k-merge budgets, batched only (strict at 1k as the per-merge
  * reference). Numbers land in NOTES_r{N}.
  *
  * `runMain graft.tools.ProfileWordPiece [mode=real|synth|all] [sfDir]` */
object ProfileWordPiece {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "wordpiece-profile")
    val docs0 = Tables(spark, dir).documents.select("doc_id", "text")

    if (mode == "real" || mode == "all") {
      for ((label, run) <- Seq(
          "strict" -> (() => WordPiece.train(docs0, numMerges = 120)),
          "batch " -> (() => WordPiece.trainBatched(docs0, numMerges = 120, batchSize = 16)))) {
        val t0 = System.nanoTime()
        val (m, _) = run()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[wp-real] $label merges=${m.size}%4d wall=$t%7.2fs " +
          f"per_merge=${t / math.max(1, m.size)}%6.3fs")
        spark.catalog.clearCache()
      }
    }

    if (mode == "synth" || mode == "all") {
      val synth = spark.range(50000).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 6).map(j =>
            substring(md5(((col("id") * 31 + lit(j * 7919)) % 49999).cast("string")), 1, 8)): _*
        ).as("text"))
        .repartition(32).localCheckpoint(true)

      val (m1k, _) = time("batch-1k", WordPiece.trainBatched(synth, 1000, batchSize = 64))
      spark.catalog.clearCache()
      val (m8k, _) = time("batch-8k", WordPiece.trainBatched(synth, 8000, batchSize = 256))
      spark.catalog.clearCache()
      val (s100, _) = time("strict-100", WordPiece.train(synth, 100))
      println(s"[wp-synth] learned: batch1k=${m1k.size} batch8k=${m8k.size} strict100=${s100.size}")
    }
    spark.stop()
  }

  private def time(label: String, f: => (Seq[WordPiece.Merge], Any)): (Seq[WordPiece.Merge], Any) = {
    val t0 = System.nanoTime()
    val r = f
    val t = (System.nanoTime() - t0) / 1e9
    println(f"[wp-synth] $label merges=${r._1.size}%6d wall=$t%8.2fs " +
      f"per_merge=${t / math.max(1, r._1.size)}%7.4fs")
    r
  }
}
