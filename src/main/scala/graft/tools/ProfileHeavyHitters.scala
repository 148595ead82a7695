package graft.tools

import graft.GraftSession
import graft.operators.HeavyHitters
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Scale evidence for the heavy-hitter funnel's central claim: the
  * shuffle is bounded by candidates, not vocabulary. Builds a
  * synthetic stream with a FIXED heavy head (20 tokens holding ~half
  * the mass) and a GROWING singleton tail (the adversarial case: a
  * full census must shuffle one row per distinct tail token, while
  * Misra–Gries evicts the entire tail by construction), then times
  * [[HeavyHitters.exactFrequent]] against the plain
  * groupBy-count-filter census and reports shuffle-write deltas from a
  * stage-completion listener. Both must return identical rows — the
  * funnel is exact. Numbers land in NOTES_r{N}.
  * `runMain graft.tools.ProfileHeavyHitters [tailSizes…]`. */
object ProfileHeavyHitters {
  def main(args: Array[String]): Unit = {
    val tails = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(200000L, 1000000L, 4000000L)
    val spark = GraftSession.local(appName = "hh-profile")

    object metrics extends SparkListener {
      @volatile var write = 0L
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) write += m.shuffleWriteMetrics.bytesWritten
      }
      def mark(): Long = { val w = write; w }
    }
    spark.sparkContext.addSparkListener(metrics)

    for (tail <- tails) {
      // heavy head: token h_i (i<20) with (21-i)*tail/100 copies; tail:
      // `tail` distinct singletons → head mass ≈ 2.1 × tail mass
      val heavy = spark.range(20).select(explode(sequence(lit(1L),
          (lit(21L) - col("id")) * lit(tail / 100L))).as("j"), col("id"))
        .select(concat(lit("h"), col("id")).as("item"))
      val corpus = heavy.unionByName(
          spark.range(tail).select(concat(lit("t"), col("id")).as("item")))
        .repartition(32).localCheckpoint(true)
      val n = corpus.count()

      Thread.sleep(300); val w0 = metrics.mark()
      val t0 = System.nanoTime()
      val funnel = HeavyHitters.exactFrequent(corpus, "item", denom = 200, capacity = 256)
        .orderBy(desc("cnt"), asc("item")).collect().toSeq
      val tF = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300); val w1 = metrics.mark()

      val t1 = System.nanoTime()
      val censusRows = corpus.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(corpus.agg(count(lit(1)).as("n_total"))))
        .filter(col("cnt") * lit(200L) >= col("n_total"))
        .select(col("item"), col("cnt"),
          round(col("cnt").cast("double") / col("n_total").cast("double"), 6).as("share"))
        .orderBy(desc("cnt"), asc("item")).collect().toSeq
      val tC = (System.nanoTime() - t1) / 1e9
      Thread.sleep(300); val w2 = metrics.mark()

      require(funnel == censusRows,
        s"funnel diverged from census at tail=$tail: ${funnel.size} vs ${censusRows.size}")
      println(f"[hh] tail=$tail%8d n=$n%9d hitters=${funnel.size}%3d " +
        f"funnel=$tF%6.2fs shuffle=${(w1 - w0) / 1024.0 / 1024.0}%8.1fMB | " +
        f"census=$tC%6.2fs shuffle=${(w2 - w1) / 1024.0 / 1024.0}%8.1fMB")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
