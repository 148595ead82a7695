package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Scale evidence for the BPE trainer's two claims.
  *
  * 1. Census discipline ([[Bpe.train]]): merge learning iterates over
  *    the distinct-WORD census, never the corpus — growing the corpus
  *    only grows the ONE census-building scan. Driven at 1×/5×/10×
  *    corpus replication (replicas reuse the same vocabulary, so the
  *    census is scale-invariant by construction — the worst case FOR
  *    the claim).
  *
  * 2. Batched rounds ([[Bpe.trainBatched]]): strict BPE costs one
  *    Spark job per merge; the batched mode learns up to batchSize
  *    symbol-disjoint merges per census, so a production-sized
  *    vocabulary needs ceil(V/batchSize)-ish rounds, not V. The real
  *    testdata corpus has a ~31-word vocabulary (pair budget ~170
  *    merges), far too small for a 32k-merge run — so the batched leg
  *    ALSO drives a synthetic pseudo-word corpus (md5-derived words,
  *    ~50k distinct, zipf-ish counts; profiling-only data, never a
  *    gate input) to measure 1k/8k/32k-merge walls.
  *
  * Numbers land in NOTES_r{N}.
  * `runMain graft.tools.ProfileBpe [mode=census|batch|all] [sfDir]`. */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "bpe-profile")
    val docs0 = Tables(spark, dir).documents.select("doc_id", "text")

    if (mode == "census" || mode == "all") {
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
        val (learned, _) = Bpe.train(corpus, 16)
        val tTrain = (System.nanoTime() - t1) / 1e9

        println(f"[bpe] reps=$reps%2d docs=$nDocs%7d tokens=$tokens%9d vocab=$vocab%6d " +
          f"census=$tCensus%6.2fs train(${learned.size} merges)=$tTrain%6.2fs " +
          f"per_round=${tTrain / learned.size}%5.2fs top=${learned.head.merged}")
        spark.catalog.clearCache()
      }
    }

    if (mode == "batch" || mode == "all") {
      // -- real corpus: sequential vs batched to exhaustion --
      for ((label, run) <- Seq(
          "seq  " -> (() => Bpe.train(docs0, numMerges = 120)),
          "batch" -> (() => Bpe.trainBatched(docs0, numMerges = 120, batchSize = 16)))) {
        val t0 = System.nanoTime()
        val (m, _) = run()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[bpe-real] $label merges=${m.size}%4d wall=$t%7.2fs " +
          f"per_merge=${t / math.max(1, m.size)}%6.3fs")
        spark.catalog.clearCache()
      }

      // -- synthetic vocab stress: ~50k pseudo-words, zipf-ish counts.
      // word = 2-4 md5-derived 4-char syllables; count ~ 1/rank. --
      val synth = spark.range(50000).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 6).map(j =>
            substring(md5(((col("id") * 31 + lit(j * 7919)) % 49999).cast("string")), 1, 8)): _*
        ).as("text"))
        .repartition(32).localCheckpoint(true)
      val vocabSize = Bpe.wordCounts(synth).count()
      println(s"[bpe-synth] corpus docs=50000 distinct_words=$vocabSize")

      val (m1k, _) = time("batch-1k") { Bpe.trainBatched(synth, 1000, batchSize = 64) }
      spark.catalog.clearCache()
      val (m8k, _) = time("batch-8k") { Bpe.trainBatched(synth, 8000, batchSize = 256) }
      spark.catalog.clearCache()
      val (m32k, _) = time("batch-32k") { Bpe.trainBatched(synth, 32000, batchSize = 1024) }
      spark.catalog.clearCache()
      // sequential reference at 1k only (32k sequential = 32k jobs; the
      // per-merge cost below extrapolates it honestly)
      val (s1k, _) = time("seq-1k  ") { Bpe.train(synth, 1000) }
      println(s"[bpe-synth] learned: batch1k=${m1k.size} batch8k=${m8k.size} " +
        s"batch32k=${m32k.size} seq1k=${s1k.size}")
    }
    spark.stop()
  }

  private def time[A](label: String)(f: => (Seq[Bpe.Merge], Any)): (Seq[Bpe.Merge], Any) = {
    val t0 = System.nanoTime()
    val r = f
    val t = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-synth] $label merges=${r._1.size}%6d wall=$t%8.2fs " +
      f"per_merge=${t / math.max(1, r._1.size)}%7.4fs")
    r
  }
}
