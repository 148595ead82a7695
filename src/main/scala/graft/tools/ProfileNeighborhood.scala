package graft.tools

import graft.GraftSession
import graft.operators.GraphMetrics
import org.apache.spark.sql.functions._

/** Scale profile of the neighborhood-function pair (qg10): exact
  * frontier expansion vs HyperBall on expander-ish graphs (ring + two
  * chord families, degree ≈ 6) at |V| = 4k / 16k / 64k, radius 0..4.
  *
  * What the numbers must show for the 100 TB verdict: the EXACT mode's
  * state is the materialized ball membership — rows ≈ |V| · d^r, an
  * exponential-in-radius blowup that reaches |V|² on any small-diameter
  * giant component (fine for the oracle gate's 141-vertex graph, dead
  * at scale) — while HyperBall's state is |V| rows of FIXED-size HLL
  * registers at every radius: per-radius cost is one |E|-row sketch
  * message join, independent of how big the balls get.
  *
  * `runMain graft.tools.ProfileNeighborhood` → markdown rows for
  * NOTES_r8.
  */
object ProfileNeighborhood {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(appName = "profile-neighborhood")
    import spark.implicits._
    val meter = new ProfileScaleFamily.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val maxR = 4

    println("| V | mode | wall_s | shuf_rd_MB | shuf_wr_MB | pairs/state rows @r=4 | N(4) |")
    println("|---|---|---|---|---|---|---|")
    for (n <- Seq(4000L, 16000L, 64000L)) {
      val edges = spark.range(n).select(
          explode(array(
            struct($"id".as("a"), (($"id" + 1) % n).as("b")),
            struct($"id".as("a"), (($"id" * 5 + 1) % n).as("b")),
            struct($"id".as("a"), (($"id" * 7 + 3) % n).as("b")))).as("e"))
        .select($"e.a", $"e.b")
        .localCheckpoint()

      spark.catalog.clearCache(); meter.reset()
      var t0 = System.nanoTime()
      val exact = GraphMetrics.neighborhoodFunction(edges, maxR)
        .orderBy($"r").collect()
      val exactWall = (System.nanoTime() - t0) / 1e9
      val exactPairs = exact.last.getLong(1)
      println(f"| $n | exact | $exactWall%.1f | ${meter.read.get / 1e6}%.1f | ${meter.write.get / 1e6}%.1f | $exactPairs | $exactPairs |")

      spark.catalog.clearCache(); meter.reset()
      t0 = System.nanoTime()
      val approx = GraphMetrics.neighborhoodFunctionApprox(edges, maxR)
        .orderBy($"r").collect()
      val apWall = (System.nanoTime() - t0) / 1e9
      val apEst = approx.last.getDouble(1)
      println(f"| $n | hyperball | $apWall%.1f | ${meter.read.get / 1e6}%.1f | ${meter.write.get / 1e6}%.1f | $n | $apEst%.0f |")
    }
    spark.stop()
  }
}
