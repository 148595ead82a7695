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

    // triangle counting on a hub-adversarial graph: a star hub of
    // degree H glued to a sparse ring. In the naive a<b<c wedge join
    // the apex is the MIDDLE id — a hub whose id splits its
    // neighborhood produces (H/2)² wedges; the degree-oriented
    // formulation gives the hub out-degree ~0 (all its edges point
    // INTO it) and leaves out-degree ≤ 3, collapsing wedge volume to
    // O(m). Counts must agree; the timing gap is the claim, measured.
    {
      import graft.operators.GraphMetrics
      import spark.implicits._
      val hubDeg = 20000L
      val hub = hubDeg / 2 // mid-id hub: the naive join's worst case
      val leaves = (1L to hubDeg + 1).filter(_ != hub)
      val star = leaves.map(l => (hub, l))
      val ring = leaves.zip(leaves.tail :+ leaves.head)
      val g = (star ++ ring).toDF("a", "b").repartition(32).localCheckpoint(true)
      val oriented = time("triangles deg-oriented") {
        GraphMetrics.triangleCount(g).select("n_triangles").as[Long].collect().head
      }
      val naive = time("triangles naive a<b<c") {
        val e = GraphMetrics.canonicalEdges(g).localCheckpoint(true)
        e.select(col("a"), col("b"))
          .join(e.select(col("a").as("b"), col("b").as("c")), "b")
          .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
          .count()
      }
      assert(oriented == naive, s"triangle counts diverge: $oriented vs $naive")
      // hub–ring gluing: every consecutive leaf pair closes a triangle
      // through the hub (the ring's wrap edge included)
      assert(oriented == hubDeg, s"expected $hubDeg hub triangles, got $oriented")
      println(s"[stress]   triangles = $oriented (hub degree $hubDeg, hub id $hub)")
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
