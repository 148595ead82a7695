package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{ConnectedComponents, Dedup, Sampling}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** sf1-scale drive of the composed dedup→CC→holdout chain (the qd03 /
  * qd06 / qp12 pipeline), with SHUFFLE accounting per stage — the
  * evidence that no stage's shuffle grows super-linearly with corpus
  * size. Replicates the sf0.1 documents `reps`× as NEAR-duplicates
  * (each replica gets a distinct marker token appended, so replicas
  * land at high-but-<1.0 Jaccard like real near-dups, unlike
  * [[ScaleStress]]'s exact replicas), then times each chain stage and
  * reports its shuffle read/write/spill deltas from a stage-completion
  * listener. Numbers land in NOTES_r{N}.
  * `runMain graft.tools.ProfileHoldoutChain [reps] [sfDir]`. */
object ProfileHoldoutChain {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "holdout-chain")

    object metrics extends SparkListener {
      @volatile var write = 0L
      @volatile var read = 0L
      @volatile var spill = 0L
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          write += m.shuffleWriteMetrics.bytesWritten
          read += m.shuffleReadMetrics.totalBytesRead
          spill += m.diskBytesSpilled
        }
      }
    }
    spark.sparkContext.addSparkListener(metrics)

    val docs0 = Tables(spark, dir).documents.select("doc_id", "text")
    val corpus = (0 until reps).map(k =>
        docs0.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          if (k == 0) col("text") else concat(col("text"), lit(s" repmark$k")).as("text")))
      .reduce(_ unionByName _)
      .repartition(32)
      .localCheckpoint(true)
    val n = corpus.count()
    println(s"[chain] corpus: ${n / reps} x $reps = $n docs (near-dup replicas)")

    def stage[A](label: String)(f: => A): A = {
      // settle listener deltas: stage events arrive async, so snapshot
      // after a short barrier to attribute shuffles to the right stage
      Thread.sleep(300)
      val (w0, r0, s0) = (metrics.write, metrics.read, metrics.spill)
      val t0 = System.nanoTime()
      val res = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      def mb(x: Long) = x / 1024.0 / 1024.0
      println(f"[chain] $label%-22s $sec%8.2f s  shufW ${mb(metrics.write - w0)}%9.1f MB" +
        f"  shufR ${mb(metrics.read - r0)}%9.1f MB  spill ${mb(metrics.spill - s0)}%7.1f MB")
      res
    }

    val pairs = stage("qd03 minhash pairs") {
      val p = Dedup.nearDupsMinhash(corpus, threshold = 0.3)
        .select(col("a_id"), col("b_id")).localCheckpoint(true)
      println(s"[chain]   pairs = ${p.count()}")
      p
    }
    val decisions = stage("qd06 cc decisions") {
      val d = ConnectedComponents.dedupDecisions(corpus, pairs).localCheckpoint(true)
      println(s"[chain]   decisions = ${d.count()}, clusters = " +
        d.select("cluster_id").distinct().count())
      d
    }
    stage("qp12 cluster holdout") {
      val s = Sampling.holdoutSplit(decisions, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("split"))
      val byCid = s.groupBy("split").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[chain]   split sizes = $byCid")
      // leakage invariant at scale: one split per cluster
      val leaky = s.groupBy("cluster_id")
        .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
      assert(leaky == 0L, s"$leaky clusters straddle the split")
    }
    spark.stop()
  }
}
