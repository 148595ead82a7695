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
    spark.stop()
  }
}
