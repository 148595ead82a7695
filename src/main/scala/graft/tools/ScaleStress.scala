package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.functions._

/** Scale-stress drive (dev tool): replicate the sf0.1 corpus `reps`
  * times (id-offset copies) and run the dedup funnels + connected
  * components on it. Replication makes every doc a member of a
  * `reps`-sized exact-dup cluster, so this deliberately stresses the
  * funnels' WORST axis — pair volume and cluster size — not just row
  * count: band buckets grow reps-fold, candidate pairs reps²-fold,
  * and CC gets dense clusters instead of pairs. Timings land in
  * NOTES_r{N}; correctness invariants are asserted inline. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "scale-stress")
    val docs0 = Tables(spark, dir).documents.select("doc_id", "text")
    val n0 = docs0.count()
    val big = (0 until reps).map(k =>
        docs0.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .localCheckpoint(true)
    val n = big.count()
    println(s"[stress] corpus: $n0 x $reps = $n docs")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val nExact = time("exact dedup")(
      Dedup.exactCanonical(big).filter(col("is_dup")).count())
    // every replica beyond its cluster keeper is an exact dup
    assert(nExact >= n0 * (reps - 1), s"exact dups $nExact < ${n0 * (reps - 1)}")
    val minhashPairs = time("minhash funnel") {
      val p = Dedup.nearDupsMinhash(big, threshold = 0.3).localCheckpoint(true)
      p.count()
    }
    println(s"[stress]   minhash pairs = $minhashPairs")
    val simhashPairs = time("simhash funnel")(Dedup.nearDupsSimhash(big, width = 16).count())
    println(s"[stress]   simhash pairs = $simhashPairs")
    val simhash64Pairs = time("simhash64 funnel")(
      Dedup.nearDupsSimhash(big, width = 64).count())
    println(s"[stress]   simhash64 pairs = $simhash64Pairs")
    val pairs = Dedup.nearDupsMinhash(big, threshold = 0.3)
      .select(col("a_id"), col("b_id")).localCheckpoint(true)
    val comps = time("connected components") {
      val c = ConnectedComponents.run(pairs).localCheckpoint(true)
      c.count()
    }
    println(s"[stress]   labeled vertices = $comps")
    // the giant-component algorithm on the same dense pair graph:
    // label parity asserted, timing shows the per-round trade
    val altComps = time("cc alternating") {
      val c = ConnectedComponents.runAlternating(pairs).localCheckpoint(true)
      c.count()
    }
    assert(altComps == comps, s"alternating labeled $altComps vs $comps")
    // the LINEAR substring census on the same pair-adversarial corpus:
    // replication makes every window a reps-owner window, but the
    // census never materializes pairs, so cost stays ~linear in rows
    // (vs the funnels' reps² pair volume) — the structural claim,
    // measured
    val subStats = time("substring census") {
      val s = Dedup.substringDupStats(big, k = 10).localCheckpoint(true)
      s.count(); s
    }
    assert(subStats.count() == n, s"substring census covered ${subStats.count()} of $n docs")
    val fullyShared = subStats
      .filter(col("n_windows") > 0 && col("n_shared") === col("n_windows")).count()
    // every replicated doc shares ALL its windows with its copies
    println(s"[stress]   fully-shared docs = $fullyShared of $n")
    spark.catalog.clearCache()
    spark.stop()
  }
}
