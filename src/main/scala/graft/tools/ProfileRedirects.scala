package graft.tools

import graft.GraftSession
import graft.operators.Redirects
import org.apache.spark.sql.functions._

/** Fleet-scale measurement twin of [[Redirects.resolve]] — the
  * pointer-doubling claim ("log2(maxHops) bounded-size self-joins, rows
  * never multiply") measured at crawl scale: synthetic chain forests of
  * 1M/4M/16M edges (chains of length 20 straddling the maxHops=16
  * reach boundary, plus a 4-cycle loop family), resolved at
  * maxHops=16, with
  *   - WALL and total SHUFFLE vs edge count (should scale linearly in
  *     |E| with a fixed 4-round factor — no quadratic blowup, no
  *     row multiplication),
  *   - EXACT ground-truth verification: every chain source's hop count
  *     is known analytically (min(20 - pos, 16)), every loop member
  *     must sentinel — the run asserts zero mismatches, so the profile
  *     is also a million-row correctness sweep of the reach boundary.
  *
  * `runMain graft.tools.ProfileRedirects [edgeCounts]` defaults
  * `1000000,4000000,16000000`.
  */
object ProfileRedirects {

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,4000000,16000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = GraftSession.local(appName = "profile-redirects")
    import spark.implicits._
    val meter = new ProfileScaleFamily.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    println(f"[redir] ${"edges"}%10s ${"wall_s"}%8s ${"shuf_rd_mb"}%10s " +
      f"${"shuf_wr_mb"}%10s ${"sources"}%10s ${"bad"}%5s")

    val L = 20 // chain length; terminal at pos L, reach boundary at pos 4
    // warmup pass (JIT + codegen) + a forced GC between sizes: dead
    // localCheckpoint blocks from an earlier size are only dropped by
    // ContextCleaner after a GC cycle, and they distort later walls
    // (the ProfileVideoPlane cross-size block-pressure lesson)
    ("warmup" +: sizes.map(_.toString)).foreach { sizeLabel =>
      val warm = sizeLabel == "warmup"
      val nEdges = if (warm) sizes.head else sizeLabel.toLong
      System.gc(); Thread.sleep(2000); System.gc()
      val nChain = (nEdges * 9) / 10 / L  // 90% chain edges
      val nLoop  = (nEdges / 10) / 4      // 10% loop edges (4-cycles)
      val chainEdges = spark.range(nChain * L).select(
        (($"id" / L).cast("long") * (L + 1) + $"id" % L).as("src"),
        (($"id" / L).cast("long") * (L + 1) + $"id" % L + 1).as("dst"))
      val loopBase = nChain * (L + 1) + 1000000L * 100
      val loopEdges = spark.range(nLoop * 4).select(
        (lit(loopBase) + ($"id" / 4).cast("long") * 4 + $"id" % 4).as("src"),
        (lit(loopBase) + ($"id" / 4).cast("long") * 4 + ($"id" + 1) % 4).as("dst"))
      val edges = chainEdges.union(loopEdges).localCheckpoint(true)

      meter.reset()
      val t0 = System.nanoTime()
      val res = Redirects.resolve(edges, maxHops = 16)
      // expected: chain source at pos p has distance L-p to its
      // terminal -> hops = min(L-p, 16), resolved iff L-p <= 16; loop
      // members sentinel at hops = 16
      val bad = res
        .withColumn("pos",
          when($"src" < loopBase, $"src" % (L + 1)))
        .withColumn("exp_hops",
          when($"pos".isNotNull, least(lit(L) - $"pos", lit(16L)))
            .otherwise(lit(16L)))
        .withColumn("exp_resolved",
          when($"pos".isNotNull, lit(L) - $"pos" <= 16).otherwise(lit(false)))
        .filter($"hops" =!= $"exp_hops" || $"resolved" =!= $"exp_resolved" ||
          ($"exp_resolved" && $"final_url".isNull) ||
          (!$"exp_resolved" && $"final_url".isNotNull))
        .count()
      val nSources = res.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (rd, wr) = (meter.read.get / 1e6, meter.write.get / 1e6)
      val label = if (warm) "warmup" else nEdges.toString
      println(f"[redir] $label%10s $wall%8.2f $rd%10.1f $wr%10.1f $nSources%10d $bad%5d")
      require(bad == 0, s"$bad sources resolved wrong at $nEdges edges")
      require(nSources == nChain * L + nLoop * 4, "one row per source lost/duplicated")
    }
    spark.stop()
  }
}
