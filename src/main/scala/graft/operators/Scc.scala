package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — the component
  * notion [[ConnectedComponents]]'s undirected closure cannot express
  * and the crawl plane actually needs: a link-farm spam ring is a
  * directed cycle of hosts (every member reaches every other), while a
  * legitimate content hierarchy is acyclic and shatters into singleton
  * SCCs. Composes with [[GraphMetrics.hits]] (rings accumulate hub
  * mass) and the qg12 domain graph.
  *
  * Algorithm: TRIM + forward-min COLORING with peeling — the published
  * scalable shape (Orzan 2004's coloring; the FW-BW/trim hybrid of
  * Slota, Rajamanickam & Madduri 2014), state one label per vertex:
  *
  *  1. TRIM to fixpoint: a vertex with no in-edges or no out-edges in
  *     the remaining graph is its own SCC (chains and dangling tails
  *     vanish here — without trim, a length-L chain costs L peel
  *     phases; with it, zero).
  *  2. COLOR: propagate color(v) = min(id of v's in-reachable set ∪
  *     {v}) to fixpoint (one equi join + one min aggregation per
  *     round — the [[GraphMetrics.pageRank]] message-passing shape).
  *  3. CONFIRM: a root r (color(r) = r) and every vertex of color r
  *     that can REACH r form one SCC. Membership propagates backward
  *     within the color class only; this is exact because every vertex
  *     on a v→…→r path with color(v) = r itself has color r (a smaller
  *     ancestor of the midpoint would be a smaller ancestor of v).
  *  4. PEEL confirmed vertices and repeat. Each phase resolves every
  *     color class's root SCC, so phases are bounded by the depth of
  *     the SCC condensation chain under min-ids, not by |V|.
  *
  * NOT the (min-ancestor, min-descendant) pair heuristic: that merges
  * non-components (two siblings sharing a smaller ancestor AND a
  * smaller descendant get identical pairs without mutual reachability
  * — SccSpec pins the counterexample).
  *
  * Scale shape: every step is an edge-list equi join + hash
  * aggregation keyed on a vertex id; state is one (node, label) row
  * per vertex; lineage truncates per round (localCheckpoint). The
  * per-round convergence probe is a scalar count — the justified-
  * collect class. Fails loudly if `maxRounds` phases don't converge
  * (ASSIGNING a wrong component silently is the one unacceptable
  * outcome).
  *
  * Input columns `src`, `dst`; self-loops are legitimate 1-cycles.
  * Output: `node, scc_id` (scc_id = smallest member id). */
object Scc {

  def strongComponents(edges0: DataFrame, maxRounds: Int = 32,
                       maxPhases: Int = 8): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(maxPhases >= 1, s"maxPhases must be >= 1, got $maxPhases")
    var edges = edges0.select(col("src"), col("dst")).distinct().localCheckpoint()
    var verts = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val done = collection.mutable.ArrayBuffer.empty[DataFrame]

    def peel(assigned: DataFrame): Unit = {
      // assigned: (node, scc_id) — remove from the remaining graph
      done += assigned.localCheckpoint()
      val ids = assigned.select(col("node"))
      verts = verts.join(ids, Seq("node"), "left_anti").localCheckpoint()
      edges = edges
        .join(ids.select(col("node").as("src")), Seq("src"), "left_anti")
        .join(ids.select(col("node").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst")).localCheckpoint()
    }

    var phase = 0
    while (verts.limit(1).count() > 0 && phase < maxPhases) {
      // 1. trim to fixpoint: no in-edges or no out-edges => singleton.
      //    Self-loops guard themselves (a self-loop is both an in- and
      //    an out-edge).
      var trimmed = true
      var tr = 0
      // r13 ADVICE: trim exiting at the cap is CORRECT (leftover
      // trimmable singletons just make the coloring pass work harder)
      // but on a >2·maxRounds chain the run then dies later with a
      // misleading "coloring did not converge" — track exhaustion so
      // that failure names the right knob.
      var trimCapped = false
      while (trimmed && tr < maxRounds) {
        val hasIn = edges.select(col("dst").as("node")).distinct()
        val hasOut = edges.select(col("src").as("node")).distinct()
        val cut = verts.join(hasIn, Seq("node"), "left_anti")
          .unionByName(verts.join(hasOut, Seq("node"), "left_anti"))
          .distinct()
        if (cut.limit(1).count() > 0) peel(cut.select(col("node"), col("node").as("scc_id")))
        else trimmed = false
        tr += 1
      }
      trimCapped = trimmed // cap hit while cuts were still landing
      if (verts.limit(1).count() > 0) {
        // 2. forward-min coloring to fixpoint
        var c = verts.select(col("node"), col("node").as("color")).localCheckpoint()
        var changed = true
        var r = 0
        while (changed && r < maxRounds) {
          val msgs = edges.join(c, edges("src") === c("node"))
            .select(edges("dst").as("node"), col("color"))
          val c2 = c.unionByName(msgs)
            .groupBy(col("node")).agg(min(col("color")).as("color"))
            .localCheckpoint()
          changed = c2.join(c.withColumnRenamed("color", "old"), Seq("node"))
            .filter(col("color") =!= col("old")).limit(1).count() > 0
          c = c2
          r += 1
        }
        require(!changed,
          s"coloring did not converge in $maxRounds rounds" + (if (trimCapped)
            s" — NOTE: the trim pass also hit the $maxRounds-round cap" +
              " before reaching its fixpoint, so the root cause is likely" +
              " a long chain: raise maxRounds" else ""))
        // 3. confirm backward within the color class, from the roots
        var f = c.filter(col("node") === col("color")).localCheckpoint()
        var grew = true
        var b = 0
        var fN = f.count()
        while (grew && b < maxRounds) {
          val msgs = edges.join(f, edges("dst") === f("node"))
            .select(edges("src").as("node"), f("color").as("mcolor"))
          val joined = msgs.join(c, Seq("node"))
            .filter(col("color") === col("mcolor"))
            .select(col("node"), col("color"))
          val f2 = f.unionByName(joined).distinct().localCheckpoint()
          val n2 = f2.count()
          grew = n2 > fN
          f = f2
          fN = n2
          b += 1
        }
        // still growing at the cap ⇒ peeling now would assign a PARTIAL
        // SCC (a >maxRounds cycle loses its unconfirmed arc members to
        // wrong singletons next phase) — the one silently-wrong outcome
        require(!grew, s"backward confirmation did not converge in $maxRounds rounds")
        peel(f.select(col("node"), col("color").as("scc_id")))
      }
      phase += 1
    }
    require(verts.limit(1).count() == 0,
      s"SCC peeling did not converge in $maxPhases phases — raise maxPhases")
    if (done.isEmpty) verts.select(col("node"), col("node").as("scc_id"))
    else done.reduce(_ unionByName _)
  }
}
