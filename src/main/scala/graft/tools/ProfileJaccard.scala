package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for qd02 (dev tool): count vs noop, stage rows. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "profile-jaccard")
    val docs = Tables(spark, dir).documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val pairs = Dedup.jaccardPairsByBlock(docs, "lang")
    time("pairs.count") { println("  n=" + pairs.count()) }
    time("filtered.count") { println("  n=" + pairs.filter(col("jaccard") >= 0.05).count()) }
    time("filtered.noop") {
      pairs.filter(col("jaccard") >= 0.05).orderBy("block", "a_id", "b_id")
        .write.format("noop").mode("overwrite").save()
    }
    time("filtered.noop again") {
      pairs.filter(col("jaccard") >= 0.05).orderBy("block", "a_id", "b_id")
        .write.format("noop").mode("overwrite").save()
    }
    // prefix-filtered variant vs exact at a selective threshold —
    // decides which path each threshold uses (measured note in
    // Dedup.jaccardPairsByBlockPrefix doc). t=0.05 was measured once:
    // the prefix path ran >10 min vs ~3 s exact (candidates ≈ all
    // co-occurring pairs, each paying an array_intersect) — exact wins
    // at low thresholds, so it is excluded here.
    for (t <- Seq(0.3)) {
      val pfx = Dedup.jaccardPairsByBlockPrefix(docs, "lang", threshold = t)
      (1 to 2).foreach { i =>
        time(f"prefix t=$t run$i.noop") {
          pfx.orderBy("block", "a_id", "b_id")
            .write.format("noop").mode("overwrite").save()
        }
      }
      val exact = Dedup.jaccardPairsByBlock(docs, "lang").filter(col("jaccard") >= t)
      (1 to 2).foreach { i =>
        time(f"exact  t=$t run$i.noop") {
          exact.orderBy("block", "a_id", "b_id")
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
