package graft.tools

import graft.GraftSession
import graft.operators.Scc
import org.apache.spark.sql.functions._

/** Fleet-scale measurement twin of [[Scc.strongComponents]] — the
  * trim+color+peel claims measured at link-graph scale on synthetic
  * directed forests with ANALYTICALLY known components (the
  * ProfileRedirects move: the profile doubles as a multi-million-node
  * correctness sweep):
  *
  *   - 60% chain edges (length-8 chains → all singletons): falls
  *     entirely to TRIM (≈ L/2 peel layers), never to coloring — the
  *     regime the algorithm must NOT pay phases for;
  *   - 30% ring edges (4-cycles → SCCs of 4, scc_id = the smallest
  *     member): survives trim, resolved by one color+confirm phase,
  *     all rings in parallel;
  *   - 10% tail edges (one dangling source per ring): trimmed
  *     singletons whose ring target keeps its cycle — the rho shape.
  *
  * Measured per size: WALL, total SHUFFLE read/write (each trim/color
  * round is edge-linear; nothing should grow super-linearly in |E|),
  * node count, and ZERO ground-truth mismatches (asserted in-run).
  *
  * `runMain graft.tools.ProfileScc [edgeCounts]` defaults
  * `1000000,4000000,16000000`.
  */
object ProfileScc {

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,4000000,16000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = GraftSession.local(appName = "profile-scc")
    import spark.implicits._
    val meter = new ProfileScaleFamily.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    println(f"[scc] ${"edges"}%10s ${"wall_s"}%8s ${"shuf_rd_mb"}%10s " +
      f"${"shuf_wr_mb"}%10s ${"nodes"}%10s ${"bad"}%5s")

    val L = 8 // chain length (edges per chain)
    val R = 4 // ring size
    ("warmup" +: sizes.map(_.toString)).foreach { sizeLabel =>
      val warm = sizeLabel == "warmup"
      val nEdges = if (warm) sizes.head / 4 else sizeLabel.toLong
      System.gc(); Thread.sleep(2000); System.gc()
      val nChain = (nEdges * 6) / 10 / L
      val nRing = (nEdges * 3) / 10 / R
      val ringBase = nChain * (L + 1) + 100000000L
      val tailBase = ringBase + nRing * R + 100000000L
      val nTail = nEdges / 10
      val chainEdges = spark.range(nChain * L).select(
        (($"id" / L).cast("long") * (L + 1) + $"id" % L).as("src"),
        (($"id" / L).cast("long") * (L + 1) + $"id" % L + 1).as("dst"))
      val ringEdges = spark.range(nRing * R).select(
        (lit(ringBase) + ($"id" / R).cast("long") * R + $"id" % R).as("src"),
        (lit(ringBase) + ($"id" / R).cast("long") * R + ($"id" + 1) % R).as("dst"))
      val tailEdges = spark.range(nTail).select(
        (lit(tailBase) + $"id").as("src"),
        (lit(ringBase) + ($"id" % nRing) * R).as("dst"))
      val edges = chainEdges.union(ringEdges).union(tailEdges)
        .localCheckpoint(true)

      meter.reset()
      val t0 = System.nanoTime()
      val res = Scc.strongComponents(edges).localCheckpoint(true)
      val bad = res
        .withColumn("exp",
          when($"node" < lit(ringBase), $"node")
            .when($"node" >= lit(tailBase), $"node")
            .otherwise(lit(ringBase) +
              (($"node" - lit(ringBase)) / R).cast("long") * R))
        .filter($"scc_id" =!= $"exp").count()
      val nNodes = res.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (rd, wr) = (meter.read.get / 1e6, meter.write.get / 1e6)
      val label = if (warm) "warmup" else nEdges.toString
      println(f"[scc] $label%10s $wall%8.2f $rd%10.1f $wr%10.1f $nNodes%10d $bad%5d")
      require(bad == 0, s"$bad nodes got the wrong component at $nEdges edges")
      require(nNodes == nChain * (L + 1) + nRing * R + nTail,
        "one row per node lost/duplicated")
    }
    spark.stop()
  }
}
