package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc stage-by-stage profiler for the minhash funnel (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "profile-minhash")
    val docs = Tables(spark, dir).documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("docs.count")(docs.count())
    time("shingles only")(docs.select(shingles(col("text"), 3).as("s")).selectExpr("sum(size(s))").collect())
    time("shingleHashes")(docs.select(shingleHashes(col("text")).as("s")).selectExpr("sum(size(s))").collect())
    time("signatures")(docs.select(minhashSignature(col("text"), 16).as("s")).selectExpr("sum(size(s))").collect())
    val banded = docs.select(col("doc_id"),
      letBound(minhashSignature(col("text"), 16)) { sig => minhashBands(sig, 4, 4) }.as("bands"))
    time("banded")(banded.selectExpr("sum(size(bands))").collect())
    val cands = Dedup.minhashCandidatePairs(docs)
    time("candidates")(println("  n_cands=" + cands.count()))
    time("full funnel")(Dedup.nearDupsMinhash(docs, 0.3).count())
    spark.stop()
  }
}
