package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc stage-by-stage profiler for the simhash funnel (dev tool). */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "profile-simhash")
    val docs = Tables(spark, dir).documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("docs.count")(docs.count())
    time("simhash16Shingles")(
      docs.select(simhash16Shingles(col("text")).as("s")).selectExpr("count(distinct s)").collect())
    // combo-key bucket size distribution: the hot-key census
    val sigs = docs.select(col("doc_id"), simhash16Shingles(col("text")).as("sh"))
    val combos = (0 until 4).combinations(2).toSeq
    val keyed = sigs.select(col("doc_id"),
      posexplode(array(combos.map(c =>
        concat(c.map(b => substring(col("sh"), b * 4 + 1, 4)): _*)): _*))
        .as(Seq("combo_idx", "band")))
    time("bucket census") {
      keyed.groupBy("combo_idx", "band").count()
        .orderBy(desc("count")).limit(8).collect()
        .foreach(r => println(s"  combo=${r.get(0)}/${r.get(1)} n=${r.get(2)}"))
    }
    time("full funnel")(println("  pairs=" + Dedup.nearDupsSimhash(docs, width = 16).count()))
    spark.stop()
  }
}
